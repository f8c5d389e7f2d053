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

  final case class WilderRsiState(avgGain: Double, avgLoss: Double,
                                  prev: Double, lastT: Long)
  final case class RsiOut(ticker: String, t: Long, price: Double,
                          rsi: Option[Double])

  /** Live Wilder RSI: per-key state = (avgGain, avgLoss, prev, lastT) —
    * O(keys) total. The recursion is bit-identical to the batch
    * MarketOps.rsiWilder (avg gain/loss seeded by the first change, then
    * folded as (acc·(n-1) + x)/n; RSI None until the second tick);
    * StatefulSpec locks cross-batch parity against it. Late rows
    * (t <= lastT) drop, as in emaStream.
    */
  def rsiWilderStream(spark: SparkSession, ticks: Dataset[Tick], n: Int)
      : Dataset[RsiOut] = {
    import spark.implicits._
    ticks.groupByKey(_.ticker)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (ticker: String, rows: Iterator[Tick],
         state: GroupState[WilderRsiState]) => {
          val sorted = rows.toSeq.sortBy(_.t)
          var st = state.getOption.getOrElse(
            WilderRsiState(Double.NaN, Double.NaN, Double.NaN, Long.MinValue))
          val out = sorted.flatMap { tick =>
            if (tick.t <= st.lastT) None
            else {
              val rsi: Option[Double] =
                if (st.prev.isNaN) None
                else {
                  val change = tick.price - st.prev
                  val gain = if (change > 0) change else 0.0
                  val loss = if (change < 0) -change else 0.0
                  val (g, l) =
                    if (st.avgGain.isNaN) (gain, loss)
                    else ((st.avgGain * (n - 1) + gain) / n,
                          (st.avgLoss * (n - 1) + loss) / n)
                  st = st.copy(avgGain = g, avgLoss = l)
                  Some(if (l == 0) 100.0 else 100.0 - 100.0 / (1.0 + g / l))
                }
              st = st.copy(prev = tick.price, lastT = tick.t)
              Some(RsiOut(ticker, tick.t, tick.price, rsi))
            }
          }
          state.update(st)
          out.iterator
        })
  }

  final case class MacdState(fast: Double, slow: Double, lastT: Long)
  final case class MacdOut(ticker: String, t: Long, price: Double, macd: Double)

  /** Live MACD: two exact EMA recursions in one per-key state — the same
    * per-tick arithmetic as the batch mkt_macd (emaExact at alpha 2/13 and
    * 2/27), so an ordered replay is BIT-identical to the batch column
    * (StatefulSpec asserts exact double equality, not tolerance). State is
    * two doubles per key. Late rows drop.
    */
  def macdStream(spark: SparkSession, ticks: Dataset[Tick],
                 alphaFast: Double = 2.0 / 13,
                 alphaSlow: Double = 2.0 / 27): Dataset[MacdOut] = {
    import spark.implicits._
    ticks.groupByKey(_.ticker)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (ticker: String, rows: Iterator[Tick], state: GroupState[MacdState]) => {
          val sorted = rows.toSeq.sortBy(_.t)
          var st = state.getOption.getOrElse(
            MacdState(Double.NaN, Double.NaN, Long.MinValue))
          val out = sorted.flatMap { tick =>
            if (tick.t <= st.lastT) None
            else {
              val f = if (st.fast.isNaN) tick.price
                      else alphaFast * tick.price + (1 - alphaFast) * st.fast
              val s = if (st.slow.isNaN) tick.price
                      else alphaSlow * tick.price + (1 - alphaSlow) * st.slow
              st = MacdState(f, s, tick.t)
              Some(MacdOut(ticker, tick.t, tick.price, f - s))
            }
          }
          state.update(st)
          out.iterator
        })
  }

  final case class BtState(buf: List[Long], rn: Long, prevSig: Long,
                           prevP: Long, cum: Long, peak: Long, lastT: Long)
  final case class BtOut(ticker: String, t: Long, pos: Long, pnlCents: Long,
                         cumPnlCents: Long, drawdownCents: Long)

  /** LIVE SMA-crossover backtest — the strategy the batch backtest
    * validated, running on the stream with the SAME integer-cents
    * arithmetic as MarketOps.backtestSmaCross, so an ordered replay
    * bit-matches the batch equity curve (StatefulSpec locks this). Per-key
    * state: the last `slow` integerized prices plus running equity/peak —
    * O(keys · slow) total, independent of history length. Signal earns
    * from the NEXT tick (prevSig pays, current signal stored), the same
    * no-lookahead contract as batch. Late rows (t <= lastT) drop.
    */
  def backtestStream(spark: SparkSession, ticks: Dataset[Tick],
                     fast: Int, slow: Int): Dataset[BtOut] = {
    import spark.implicits._
    require(fast < slow, s"fast SMA ($fast) must be shorter than slow ($slow)")
    ticks.groupByKey(_.ticker)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (ticker: String, rows: Iterator[Tick], state: GroupState[BtState]) => {
          val sorted = rows.toSeq.sortBy(_.t)
          var st = state.getOption.getOrElse(
            BtState(Nil, 0L, 0L, 0L, 0L, 0L, Long.MinValue))
          val out = sorted.flatMap { tick =>
            if (tick.t <= st.lastT) None
            else {
              val p = math.floor(tick.price * 100).toLong
              val buf = (st.buf :+ p).takeRight(slow)
              val rn = st.rn + 1
              val sf = buf.takeRight(fast).sum
              val ss = buf.sum
              val signal =
                if (rn >= slow && sf * slow > ss * fast) 1L else 0L
              val dp = if (rn == 1) 0L else p - st.prevP
              val pnl = st.prevSig * dp
              val cum = st.cum + pnl
              val peak = math.max(st.peak, cum)
              val pos = st.prevSig
              st = BtState(buf, rn, signal, p, cum, peak, tick.t)
              Some(BtOut(ticker, tick.t, pos, pnl, cum, peak - cum))
            }
          }
          state.update(st)
          out.iterator
        })
  }

  final case class AtrState(atr: Double, prev: Double, lastT: Long)
  final case class AtrOut(ticker: String, t: Long, price: Double,
                          atr: Option[Double])

  /** Live Wilder ATR over |close-to-close change|: per-key state =
    * (atr, prev, lastT); recursion identical to MarketOps.atrWilder (first
    * TR seeds, then atr = (atr·(n-1) + tr)/n), parity-locked in
    * StatefulSpec. Late rows drop.
    */
  def atrWilderStream(spark: SparkSession, ticks: Dataset[Tick], n: Int)
      : Dataset[AtrOut] = {
    import spark.implicits._
    ticks.groupByKey(_.ticker)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (ticker: String, rows: Iterator[Tick], state: GroupState[AtrState]) => {
          val sorted = rows.toSeq.sortBy(_.t)
          var st = state.getOption.getOrElse(
            AtrState(Double.NaN, Double.NaN, Long.MinValue))
          val out = sorted.flatMap { tick =>
            if (tick.t <= st.lastT) None
            else {
              val atr: Option[Double] =
                if (st.prev.isNaN) None
                else {
                  val tr = math.abs(tick.price - st.prev)
                  val a = if (st.atr.isNaN) tr else (st.atr * (n - 1) + tr) / n
                  st = st.copy(atr = a)
                  Some(a)
                }
              st = st.copy(prev = tick.price, lastT = tick.t)
              Some(AtrOut(ticker, tick.t, tick.price, atr))
            }
          }
          state.update(st)
          out.iterator
        })
  }
}
