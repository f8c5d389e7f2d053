package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming indicators via flatMapGroupsWithState — the custom
  * per-key state surface (SURVEY.md §2.10 "reserved for north-star indicator
  * streaming"): a live EMA whose state is one (ema, lastT) pair per ticker,
  * O(keys) state total, emitted per input tick.
  *
  * Batch/stream parity: on an ordered replay this produces exactly
  * MarketOps.emaExact (same recursion, same within-key ordering enforced by
  * sorting each micro-batch group; cross-batch order is event-time
  * monotone when the upstream is the polygon source, which emits ascending).
  */
object StatefulIndicators {

  final case class Tick(ticker: String, t: Long, price: Double)
  final case class EmaState(ema: Double, lastT: Long)
  final case class EmaOut(ticker: String, t: Long, price: Double, ema: Double)

  def emaStream(spark: SparkSession, ticks: Dataset[Tick], alpha: Double)
      : Dataset[EmaOut] = {
    import spark.implicits._
    ticks.groupByKey(_.ticker)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (ticker: String, rows: Iterator[Tick], state: GroupState[EmaState]) => {
          // within a micro-batch a group is unordered → sort by event time;
          // late rows (t <= state.lastT) are dropped, matching the
          // reference's in-loop watermark skip (O-F6)
          val sorted = rows.toSeq.sortBy(_.t)
          var st = state.getOption.getOrElse(EmaState(Double.NaN, Long.MinValue))
          val out = sorted.flatMap { tick =>
            if (tick.t <= st.lastT) None
            else {
              val ema =
                if (st.ema.isNaN) tick.price
                else alpha * tick.price + (1 - alpha) * st.ema
              st = EmaState(ema, tick.t)
              Some(EmaOut(ticker, tick.t, tick.price, ema))
            }
          }
          state.update(st)
          out.iterator
        })
  }
}
