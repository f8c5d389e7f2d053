package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream analytics over a (user, event_type, ts) shaped table —
  * the ordered-stage and cohort patterns a behavioral pipeline needs
  * beyond plain windowed aggregation (reference scope: tumbling
  * aggregates only, polygon-etl-container/src/aggregates_etl.py).
  *
  * Scale design: every stage aggregates to per-user firsts BEFORE joining
  * (shuffles bounded by user count, never event count), and the stage
  * predicate is pushed into the event scan; cohort activity compacts to
  * distinct (user, period) before the cohort join.
  */
object EventOps {

  /** Ordered conversion funnel: for each user, the first occurrence of
    * stage 1, the first occurrence of stage 2 STRICTLY AFTER it, and so on
    * — order matters, mere presence does not. Returns one row per user who
    * reached stage 1: (userCol, t_<stage1>, t_<stage2>, ...), later stages
    * null where never reached in order.
    */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id",
             typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.distinct.size == stages.size,
      s"funnel stages must be distinct (t_<stage> columns collide): $stages")
    def stageCol(s: String) = s"t_$s"
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(userCol).agg(min(tsCol).as(stageCol(stages.head)))
    val full = stages.sliding(2).filter(_.size == 2).foldLeft(first) {
      case (prev, Seq(prevStage, stage)) =>
        val next = events.filter(col(typeCol) === stage)
          .join(prev.select(col(userCol), col(stageCol(prevStage))), userCol)
          .filter(col(tsCol) > col(stageCol(prevStage)))
          .groupBy(userCol).agg(min(tsCol).as(stageCol(stage)))
        prev.join(next, Seq(userCol), "left")
    }
    full.select(col(userCol) +: stages.map(s => col(stageCol(s))): _*)
      .orderBy(col(userCol))
  }

  /** Gap-based sessionization (batch): per-user sessions split on `gap`
    * inactivity, with event count and exact-decimal value sum per session.
    * The streaming twin is LiveBars.sessionStream — identical aggregate on
    * a watermarked stream (replay parity in StreamingSpec).
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 userCol: String = "user_id", tsCol: String = "ts",
                 valueCol: String = "value"): DataFrame =
    events.groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .select(col(userCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("sum_value"))
      .orderBy(col(userCol), col("session_start"))

  /** Cohort retention: users bucketed by the period of their first
    * activity, counted distinct per later period offset. `period` is any
    * date_trunc unit ("week", "month"). Returns (cohort_<period>,
    * <period>_offset, users).
    */
  def retention(events: DataFrame, period: String = "week",
                userCol: String = "user_id",
                tsCol: String = "ts"): DataFrame = {
    val periodDays = period match {
      case "week" => 7
      case "day"  => 1
      case other => throw new IllegalArgumentException(
        s"retention: fixed-length periods only (week/day), got $other")
    }
    val cohort = events.groupBy(userCol)
      .agg(date_trunc(period, min(tsCol)).as(s"cohort_$period"))
    val act = events
      .select(col(userCol), date_trunc(period, col(tsCol)).as("w"))
      .distinct()
    act.join(cohort, userCol)
      .groupBy(col(s"cohort_$period"),
        (datediff(col("w"), col(s"cohort_$period")) / periodDays)
          .cast("long").as(s"${period}_offset"))
      .agg(countDistinct(col(userCol)).as("users"))
      .orderBy(col(s"cohort_$period"), col(s"${period}_offset"))
  }

  /** Markov-style transition matrix over per-user event sequences — the
    * path-analysis companion to funnel(): for every consecutive event pair
    * (ordered by ts with the event id as deterministic tie-break), count
    * transitions and distinct users per (from_type, to_type) edge.
    *
    * Scale: ONE shuffle by user for the lead() window (per-user sort, no
    * global sort), then an aggregate bounded by |event types|² rows —
    * event-count-sized data never shuffles twice.
    */
  def transitionMatrix(events: DataFrame,
                       userCol: String = "user_id",
                       typeCol: String = "event_type",
                       tsCol: String = "ts",
                       idCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events.select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("to_type", lead(col(typeCol), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col(userCol)).as("n_users"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Trailing-window spike detection: flag events whose integerized value
    * exceeds `mulNum/mulDen` × the trailing mean of the previous `lookback`
    * events for the same key (frame EXCLUDES the current row, so a spike
    * never dilutes its own baseline; `minTrail` warmup rows before any
    * verdict). The comparison cross-multiplies — p·n·den > s·num — so no
    * division or float enters and the oracle is hash-exact.
    *
    * Scale: ONE shuffle by key, one sorted window pass with a bounded
    * frame; the filter is a codegen projection downstream. Constant state
    * per key (the frame), any number of keys.
    */
  def spikeDetect(events: DataFrame, lookback: Int = 20, minTrail: Int = 10,
                  mulNum: Int = 3, mulDen: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(mulNum > 0 && mulDen > 0, "spike multiplier must be positive")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-lookback, -1)
    events
      .withColumn("p_cents", floor(col("value") * 100).cast("long"))
      .withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_sum_cents", sum(col("p_cents")).over(w))
      .filter(col("trail_n") >= minTrail &&
        col("p_cents") * col("trail_n") * mulDen >
          col("trail_sum_cents") * mulNum)
      .select(col("event_id"), col("user_id"), col("p_cents"),
        col("trail_n"), col("trail_sum_cents"))
      .orderBy(col("event_id"))
  }

  /** SCD2 temporal materialization of a changelog: per entity, collapse
    * consecutive identical states and emit versioned validity intervals —
    * (user_id, state, valid_from, valid_to, version, is_current), with
    * valid_to = the NEXT change's valid_from (half-open intervals) and
    * NULL on the current state. The warehouse "slowly changing dimension
    * type 2" build: a point-in-time lookup is then `t >= valid_from AND
    * (valid_to IS NULL OR t < valid_to)` — partition-prunable and
    * as-of-joinable (operators/AsOf.scala) instead of replaying the log.
    *
    * The reference keeps only current + snapshot dimension views
    * (reference_endpoints_etl.py:57-62); snapshots answer "what was known
    * when" at snapshot cadence, SCD2 answers it at CHANGE grain.
    *
    * Exactness: the change filter and both windows order by (ts,
    * event_id) — a total order on both engines, so version numbering and
    * interval bounds are deterministic. Scale: one shuffle by entity;
    * both window passes and the change filter share that partitioning
    * (no second exchange), and state per key is one row.
    */
  def scd2Intervals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val changed = events
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changed
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"), col("version"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }
}
