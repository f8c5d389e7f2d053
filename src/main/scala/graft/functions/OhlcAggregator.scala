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

  val agg: Aggregator[In, Buf, Ohlc] = new Aggregator[In, Buf, Ohlc] {
    override def zero: Buf = empty

    override def reduce(b: Buf, x: In): Buf = Buf(
      tO = if (x.t < b.tO) x.t else b.tO,
      o = if (x.t < b.tO) x.o else b.o,
      h = math.max(b.h, x.h),
      l = math.min(b.l, x.l),
      tC = if (x.t > b.tC) x.t else b.tC,
      c = if (x.t > b.tC) x.c else b.c,
      v = b.v + x.v,
      vwv = b.vwv + x.vw * x.v,
      n = b.n + x.n)

    override def merge(a: Buf, b: Buf): Buf = Buf(
      tO = math.min(a.tO, b.tO),
      o = if (a.tO <= b.tO) a.o else b.o,
      h = math.max(a.h, b.h),
      l = math.min(a.l, b.l),
      tC = math.max(a.tC, b.tC),
      c = if (a.tC >= b.tC) a.c else b.c,
      v = a.v + b.v,
      vwv = a.vwv + b.vwv,
      n = a.n + b.n)

    override def finish(b: Buf): Ohlc =
      Ohlc(b.o, b.h, b.l, b.c, b.v, if (b.v == 0) 0 else b.vwv / b.v, b.n)

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Ohlc] = Encoders.product[Ohlc]
  }
}
