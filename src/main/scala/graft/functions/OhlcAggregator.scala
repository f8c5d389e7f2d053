package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed OHLCV fold (O-A7) for the Dataset API: the dataset-defining
  * aggregate — o = earliest, c = latest, h/l = extrema, v/n summed,
  * vw = Σ(vw·v)/Σ(v) — as an associative, order-insensitive Aggregator
  * (open/close carry their event times through the buffer, so partial
  * aggregation and merge order don't matter; this is what makes it safe
  * under Spark's partial+final aggregation at any parallelism).
  */
object OhlcAggregator {

  /** One input tick/bar: (t, o, h, l, c, v, vw, n). For raw ticks use
    * o=h=l=c=price, v=size, n=1.
    */
  final case class In(t: Long, o: Double, h: Double, l: Double, c: Double,
                      v: Double, vw: Double, n: Long)

  final case class Buf(tO: Long, o: Double, h: Double, l: Double,
                       tC: Long, c: Double, v: Double, vwv: Double, n: Long)

  final case class Ohlc(o: Double, h: Double, l: Double, c: Double,
                        v: Double, vw: Double, n: Long)

  val empty: Buf = Buf(Long.MaxValue, 0, Double.NegativeInfinity,
    Double.PositiveInfinity, Long.MinValue, 0, 0, 0, 0)

  // Tie policy: when two inputs share the earliest (or latest) timestamp,
  // the open (close) is the MIN of the tied values — min is commutative and
  // associative, so the result is identical for any partitioning and merge
  // order, which is what makes the "order-insensitive under partial+final
  // aggregation" contract hold even on tapes with duplicate timestamps.
  private def pickEarliest(ta: Long, va: Double, tb: Long, vb: Double): (Long, Double) =
    if (ta < tb) (ta, va)
    else if (tb < ta) (tb, vb)
    else (ta, math.min(va, vb))

  private def pickLatest(ta: Long, va: Double, tb: Long, vb: Double): (Long, Double) =
    if (ta > tb) (ta, va)
    else if (tb > ta) (tb, vb)
    else (ta, math.min(va, vb))

  val agg: Aggregator[In, Buf, Ohlc] = new Aggregator[In, Buf, Ohlc] {
    override def zero: Buf = empty

    override def reduce(b: Buf, x: In): Buf = {
      val (tO, o) = pickEarliest(b.tO, b.o, x.t, x.o)
      val (tC, c) = pickLatest(b.tC, b.c, x.t, x.c)
      Buf(tO, o,
        h = math.max(b.h, x.h),
        l = math.min(b.l, x.l),
        tC = tC, c = c,
        v = b.v + x.v,
        vwv = b.vwv + x.vw * x.v,
        n = b.n + x.n)
    }

    override def merge(a: Buf, b: Buf): Buf = {
      val (tO, o) = pickEarliest(a.tO, a.o, b.tO, b.o)
      val (tC, c) = pickLatest(a.tC, a.c, b.tC, b.c)
      Buf(tO, o,
        h = math.max(a.h, b.h),
        l = math.min(a.l, b.l),
        tC = tC, c = c,
        v = a.v + b.v,
        vwv = a.vwv + b.vwv,
        n = a.n + b.n)
    }

    override def finish(b: Buf): Ohlc =
      Ohlc(b.o, b.h, b.l, b.c, b.v, if (b.v == 0) 0 else b.vwv / b.v, b.n)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Ohlc] = Encoders.product[Ohlc]
  }
}
