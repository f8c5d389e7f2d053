package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
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
  *
  * State eviction: every operator takes an optional `idleTtl` (e.g.
  * "30 days"). When set, a key that receives no ticks for that long in
  * PROCESSING time has its state dropped via ProcessingTimeTimeout — a
  * delisted ticker stops growing the state store over years of live
  * operation. Eviction is safe because every state here is reconstructible
  * from replay; the trade is that a returning key RE-SEEDS its recursion
  * (first tick after eviction is treated as the key's first tick ever, and
  * the late-row guard resets with it). Default None keeps the historical
  * keep-forever behavior for bounded replay tests.
  *
  * Deployment note: with a processing-time timeout the engine schedules
  * batches continuously to check timers (shouldRunAnotherBatch is always
  * true for this operator), so pair `idleTtl` with an interval trigger
  * (Trigger.ProcessingTime) — under the default zero-interval trigger the
  * query busy-loops empty batches, and processAllAvailable never quiesces.
  */
object StatefulIndicators {

  final case class Tick(ticker: String, t: Long, price: Double)

  /** The per-key fold all five indicator streams share: sort the
    * micro-batch group by event time, drop late rows (t <= lastT — the
    * reference's in-loop watermark skip, O-F6), thread the state through
    * `step` (one output per fresh tick), persist the state, and arm the
    * idle-eviction timer. On a timeout invocation (no rows, TTL lapsed)
    * the key's state is removed.
    */
  private def foldPerKey[S, O](spark: SparkSession, ticks: Dataset[Tick],
                               idleTtl: Option[String], empty: S,
                               lastT: S => Long)(
      step: (String, Tick, S) => (S, O))(
      implicit se: Encoder[S], oe: Encoder[O]): Dataset[O] = {
    import spark.implicits._
    val timeoutConf =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ticks.groupByKey(_.ticker)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (ticker: String, rows: Iterator[Tick], state: GroupState[S]) => {
          if (state.hasTimedOut) {
            // idle past the TTL: drop the state; a replay reconstructs it
            state.remove()
            Iterator.empty
          } else {
            // within a micro-batch a group is unordered → sort by event time
            val sorted = rows.toSeq.sortBy(_.t)
            var st = state.getOption.getOrElse(empty)
            val out = sorted.flatMap { tick =>
              if (tick.t <= lastT(st)) None
              else {
                val (next, o) = step(ticker, tick, st)
                st = next
                Some(o)
              }
            }
            state.update(st)
            // the timer is cleared on every invocation — re-arm it
            idleTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
        })
  }

  final case class EmaState(ema: Double, lastT: Long)
  final case class EmaOut(ticker: String, t: Long, price: Double, ema: Double)

  def emaStream(spark: SparkSession, ticks: Dataset[Tick], alpha: Double,
                idleTtl: Option[String] = None): Dataset[EmaOut] = {
    import spark.implicits._
    foldPerKey(spark, ticks, idleTtl,
      EmaState(Double.NaN, Long.MinValue), (s: EmaState) => s.lastT) {
      (ticker, tick, st) =>
        val ema =
          if (st.ema.isNaN) tick.price
          else alpha * tick.price + (1 - alpha) * st.ema
        (EmaState(ema, tick.t), EmaOut(ticker, tick.t, tick.price, ema))
    }
  }

  final case class WilderRsiState(avgGain: Double, avgLoss: Double,
                                  prev: Double, lastT: Long)
  final case class RsiOut(ticker: String, t: Long, price: Double,
                          rsi: Option[Double])

  /** Live Wilder RSI: per-key state = (avgGain, avgLoss, prev, lastT) —
    * O(keys) total. The recursion is bit-identical to the batch
    * MarketOps.rsiWilder (avg gain/loss seeded by the first change, then
    * folded as (acc·(n-1) + x)/n; RSI None until the second tick);
    * StatefulSpec locks cross-batch parity against it.
    */
  def rsiWilderStream(spark: SparkSession, ticks: Dataset[Tick], n: Int,
                      idleTtl: Option[String] = None): Dataset[RsiOut] = {
    import spark.implicits._
    foldPerKey(spark, ticks, idleTtl,
      WilderRsiState(Double.NaN, Double.NaN, Double.NaN, Long.MinValue),
      (s: WilderRsiState) => s.lastT) { (ticker, tick, st0) =>
      var st = st0
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
      (st, RsiOut(ticker, tick.t, tick.price, rsi))
    }
  }

  final case class MacdState(fast: Double, slow: Double, lastT: Long)
  final case class MacdOut(ticker: String, t: Long, price: Double, macd: Double)

  /** Live MACD: two exact EMA recursions in one per-key state — the same
    * per-tick arithmetic as the batch mkt_macd (emaExact at alpha 2/13 and
    * 2/27), so an ordered replay is BIT-identical to the batch column
    * (StatefulSpec asserts exact double equality, not tolerance). State is
    * two doubles per key.
    */
  def macdStream(spark: SparkSession, ticks: Dataset[Tick],
                 alphaFast: Double = 2.0 / 13, alphaSlow: Double = 2.0 / 27,
                 idleTtl: Option[String] = None): Dataset[MacdOut] = {
    import spark.implicits._
    foldPerKey(spark, ticks, idleTtl,
      MacdState(Double.NaN, Double.NaN, Long.MinValue),
      (s: MacdState) => s.lastT) { (ticker, tick, st) =>
      val f = if (st.fast.isNaN) tick.price
              else alphaFast * tick.price + (1 - alphaFast) * st.fast
      val s = if (st.slow.isNaN) tick.price
              else alphaSlow * tick.price + (1 - alphaSlow) * st.slow
      (MacdState(f, s, tick.t), MacdOut(ticker, tick.t, tick.price, f - s))
    }
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
    * no-lookahead contract as batch.
    */
  def backtestStream(spark: SparkSession, ticks: Dataset[Tick],
                     fast: Int, slow: Int,
                     idleTtl: Option[String] = None): Dataset[BtOut] = {
    import spark.implicits._
    require(fast < slow, s"fast SMA ($fast) must be shorter than slow ($slow)")
    foldPerKey(spark, ticks, idleTtl,
      BtState(Nil, 0L, 0L, 0L, 0L, 0L, Long.MinValue),
      (s: BtState) => s.lastT) { (ticker, tick, st) =>
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
      (BtState(buf, rn, signal, p, cum, peak, tick.t),
        BtOut(ticker, tick.t, pos, pnl, cum, peak - cum))
    }
  }

  final case class SpikeState(buf: List[Long], lastT: Long)
  final case class SpikeOut(ticker: String, t: Long, pCents: Long,
                            trailN: Long, trailSumCents: Long, spike: Boolean)

  /** Live trailing-window spike detector — the streaming twin of
    * EventOps.spikeDetect with the SAME integer-cents contract (baseline is
    * the previous `lookback` ticks EXCLUDING the current one; the threshold
    * cross-multiplies, so an ordered replay's flagged set is bit-identical
    * to the batch query — StatefulSpec locks this). Per-key state: the last
    * `lookback` integerized prices — O(keys · lookback) total, independent
    * of history length.
    */
  def spikeStream(spark: SparkSession, ticks: Dataset[Tick],
                  lookback: Int = 20, minTrail: Int = 10,
                  mulNum: Long = 3L, mulDen: Long = 1L,
                  idleTtl: Option[String] = None): Dataset[SpikeOut] = {
    import spark.implicits._
    require(mulNum > 0 && mulDen > 0, "spike multiplier must be positive")
    foldPerKey(spark, ticks, idleTtl,
      SpikeState(Nil, Long.MinValue), (s: SpikeState) => s.lastT) {
      (ticker, tick, st) =>
        val p = math.floor(tick.price * 100).toLong
        val n = st.buf.length.toLong
        val sum = st.buf.sum
        val spike = n >= minTrail && p * n * mulDen > sum * mulNum
        (SpikeState((st.buf :+ p).takeRight(lookback), tick.t),
          SpikeOut(ticker, tick.t, p, n, sum, spike))
    }
  }

  final case class AtrState(atr: Double, prev: Double, lastT: Long)
  final case class AtrOut(ticker: String, t: Long, price: Double,
                          atr: Option[Double])

  /** Live Wilder ATR over |close-to-close change|: per-key state =
    * (atr, prev, lastT); recursion identical to MarketOps.atrWilder (first
    * TR seeds, then atr = (atr·(n-1) + tr)/n), parity-locked in
    * StatefulSpec.
    */
  def atrWilderStream(spark: SparkSession, ticks: Dataset[Tick], n: Int,
                      idleTtl: Option[String] = None): Dataset[AtrOut] = {
    import spark.implicits._
    foldPerKey(spark, ticks, idleTtl,
      AtrState(Double.NaN, Double.NaN, Long.MinValue),
      (s: AtrState) => s.lastT) { (ticker, tick, st0) =>
      var st = st0
      val atr: Option[Double] =
        if (st.prev.isNaN) None
        else {
          val tr = math.abs(tick.price - st.prev)
          val a = if (st.atr.isNaN) tr else (st.atr * (n - 1) + tr) / n
          st = st.copy(atr = a)
          Some(a)
        }
      st = st.copy(prev = tick.price, lastT = tick.t)
      (st, AtrOut(ticker, tick.t, tick.price, atr))
    }
  }

  final case class CusumState(sp: Long, sn: Long, prev: Long, lastT: Long)
  final case class CusumOut(ticker: String, t: Long, sPos: Long, sNeg: Long,
                            alarm: Int)

  /** Live CUSUM changepoint stream — the streaming twin of
    * `operators/MarketOps.cusum`, same integer-cent recursion (two
    * one-sided drift sums, alarm + restart), so on an ordered replay the
    * emitted (sPos, sNeg, alarm) trace EXACTLY equals the batch query
    * (StatefulSpec). State is four longs per key.
    */
  def cusumStream(spark: SparkSession, ticks: Dataset[Tick],
                  slackCents: Long, thresholdCents: Long,
                  idleTtl: Option[String] = None): Dataset[CusumOut] = {
    import spark.implicits._
    foldPerKey(spark, ticks, idleTtl,
      CusumState(0L, 0L, Long.MinValue, Long.MinValue),
      (s: CusumState) => s.lastT) { (ticker, tick, st) =>
      val p = math.floor(tick.price * 100).toLong
      if (st.prev == Long.MinValue)
        (CusumState(0L, 0L, p, tick.t), CusumOut(ticker, tick.t, 0L, 0L, 0))
      else {
        val d = p - st.prev
        val pp = math.max(0L, st.sp + d - slackCents)
        val nn = math.max(0L, st.sn - d - slackCents)
        val alarm =
          if (pp > thresholdCents) 1 else if (nn > thresholdCents) 2 else 0
        val (nsp, nsn) = if (alarm != 0) (0L, 0L) else (pp, nn)
        (CusumState(nsp, nsn, p, tick.t),
          CusumOut(ticker, tick.t, nsp, nsn, alarm))
      }
    }
  }

  final case class SilenceAlert(ticker: String, lastT: Long)

  /** Streaming SILENCE detector — the alert a live desk wants when a
    * series STOPS ticking: per key, track the newest event time; when a
    * key receives nothing for `silence` of processing time, EMIT
    * (ticker, lastT) and drop the state. Output-ON-timeout is the
    * streaming-native capability here — the batch gap scan
    * (operators/MarketOps.gapScan) can only see a void after later data
    * arrives, while this fires DURING the void, from a timer, with no
    * input row at all. Single-shot by design: the alert clears the key's
    * state, so a still-dead key does not re-alert every interval and a
    * returning key re-seeds (and can alert again on its NEXT silence).
    * State is one long per live key; the deployment note on `idleTtl`
    * (interval trigger required) applies here too.
    */
  def silenceAlerts(spark: SparkSession, ticks: Dataset[Tick],
                    silence: String): Dataset[SilenceAlert] = {
    import spark.implicits._
    ticks.groupByKey(_.ticker)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(
        (ticker: String, rows: Iterator[Tick], state: GroupState[Long]) => {
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator.single(SilenceAlert(ticker, last))
          } else {
            val newest = rows.map(_.t).foldLeft(
              state.getOption.getOrElse(Long.MinValue))(math.max)
            state.update(newest)
            state.setTimeoutDuration(silence)
            Iterator.empty
          }
        })
  }
}
