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

  /** STREAM-STREAM watermarked interval join — the streaming analogue of
    * the batch as-of enrichment (operators/AsOf.scala): each left row
    * joins every right row with the same key whose event time falls in
    * `[leftTime − lookback, leftTime]` (e.g. trades picking up the quotes
    * in force just before them). Rows arriving in DIFFERENT micro-batches
    * still join: both sides are buffered in join state until the watermark
    * proves no matching partner can still arrive.
    *
    * Scale contract — why this holds on an unbounded stream: because both
    * inputs carry watermarks AND the join condition bounds the two event
    * times against each other, Structured Streaming derives a state
    * eviction policy for BOTH sides (left rows expire once the right
    * watermark passes leftTime, right rows once the left watermark passes
    * rightTime + lookback) — state is O(rate × (lookback + delay)), never
    * O(stream). Without the range condition the right side would be
    * unbounded; this operator makes the bound part of the signature.
    * Inner joins emit on match (no watermark latency on output).
    *
    * The same declarative plan on static frames is the exact batch
    * equivalent — StreamingSpec asserts replay parity.
    */
  def intervalJoinStream(left: DataFrame, leftTime: String,
                         right: DataFrame, rightTime: String,
                         keys: Seq[String], lookback: String,
                         delay: String): DataFrame = {
    require(keys.nonEmpty, "interval join needs at least one equality key")
    val l = left.withWatermark(leftTime, delay).alias("l")
    val r = right.withWatermark(rightTime, delay).alias("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val range = col(s"r.$rightTime") <= col(s"l.$leftTime") &&
      col(s"r.$rightTime") >= col(s"l.$leftTime") - expr(s"INTERVAL $lookback")
    val rightCols = right.columns.filterNot(keys.contains).map(c => col(s"r.$c"))
    l.join(r, keyCond && range, "inner")
      .select(left.columns.map(c => col(s"l.$c")).toSeq ++ rightCols: _*)
  }
}
