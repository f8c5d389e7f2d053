package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Live-data path (README.md:7 of the reference): streaming transforms that
  * mirror the batch operators exactly, so backfill (batch) and live
  * (streaming) produce identical silver tables — the prefix-consistency
  * model of "Structured Streaming: A Declarative API for Real-Time
  * Applications in Apache Spark" (SIGMOD 2018): one declarative query, the
  * engine incrementalizes it.
  *
  * The reference's daily Airflow trigger + watermark-scraping
  * (airflow-dags/dag_aggregates_etl.py:128-150) becomes: checkpointed
  * streaming offsets + `withWatermark` + `dropDuplicatesWithinWatermark` —
  * at-least-once upstream, exactly-once visible downstream, no sink
  * re-reading. State stays bounded: dedup state expires past the watermark
  * delay, window state past window end + delay.
  */
object LiveBars {

  /** Exactly-once-visible dedup of an at-least-once bar stream, keyed like
    * the batch dedup (O-A1): dropDuplicatesWithinWatermark keeps state only
    * for `delay`, the bound on upstream replay skew.
    */
  def dedupStream(bars: DataFrame, eventTimeCol: String, delay: String,
                  keys: Seq[String]): DataFrame =
    bars.withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark(keys)

  /** Tumbling OHLC bars over a live tick/event stream — literally the batch
    * resample (MarketOps.resampleBars) applied to a watermarked stream, so
    * a replay of the history through the stream equals the batch table by
    * construction.
    */
  def ohlcStream(events: DataFrame, eventTimeCol: String, delay: String,
                 windowLength: String): DataFrame =
    graft.operators.MarketOps.resampleBars(
        events.withWatermark(eventTimeCol, delay), windowLength,
        timeCol = eventTimeCol)
      .withColumn("vol", col("vol_dec").cast("double"))
      .drop("vol_dec")

  /** Gap-based session windows on a live stream — q21's batch aggregate
    * incrementalized: per-key session state merges on overlap and is
    * emitted (append mode) once the watermark passes session end, so state
    * is bounded by OPEN sessions only. Replaying history through this
    * equals the batch q21_session_window table (StreamingSpec parity).
    */
  def sessionStream(events: DataFrame, eventTimeCol: String, delay: String,
                    gap: String): DataFrame =
    events.withWatermark(eventTimeCol, delay)
      .groupBy(col("user_id"), session_window(col(eventTimeCol), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
}
