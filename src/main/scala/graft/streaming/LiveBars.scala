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

  /** Tumbling OHLC bars over a live tick/event stream — the streaming twin
    * of MarketOps.bars5m (same aggregate functions, same grouping), so a
    * replay of the history through the stream equals the batch table.
    */
  def ohlcStream(events: DataFrame, eventTimeCol: String, delay: String,
                 windowLength: String): DataFrame =
    events
      .withWatermark(eventTimeCol, delay)
      .groupBy(col("user_id"), window(col(eventTimeCol), windowLength))
      .agg(
        min_by(col("value"), col(eventTimeCol)).as("o"),
        max(col("value")).as("h"),
        min(col("value")).as("l"),
        max_by(col("value"), col(eventTimeCol)).as("c"),
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).as("vol_dec"))
      .select(col("user_id"), col("window.start").as("bucket"),
        col("o"), col("h"), col("l"), col("c"), col("n"),
        col("vol_dec").cast("double").as("vol"))
}
