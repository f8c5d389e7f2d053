package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Technical indicators (O-W3 — the reference's stated purpose, README.md:4:
  * "extraction and storage of technical indicators"), as reusable window
  * transformations over any (key, time, price, volume) frame.
  *
  * All are rank-frame window functions over a per-key time sort: one shuffle
  * by key for the whole indicator set (Catalyst collapses same-spec windows
  * into a single Window operator), linear per partition.
  */
object Indicators {

  private def byKey(key: String, time: String): WindowSpec =
    Window.partitionBy(col(key)).orderBy(col(time))

  /** Simple moving average over the trailing n rows. */
  def sma(price: Column, n: Int, key: String, time: String): Column =
    avg(price).over(byKey(key, time).rowsBetween(-(n - 1), Window.currentRow))

  // (EMA lives in MarketOps: windowed-normalized form as mkt_ema20, true
  //  recursive form as MarketOps.emaExact via flatMapSortedGroups.)

  /** Rolling VWAP over the trailing n rows. */
  def vwap(price: Column, volume: Column, n: Int, key: String, time: String): Column = {
    val w = byKey(key, time).rowsBetween(-(n - 1), Window.currentRow)
    sum(price * volume).over(w) / sum(volume).over(w)
  }

  /** Rolling sample standard deviation (volatility) over trailing n rows. */
  def rollingVol(price: Column, n: Int, key: String, time: String): Column =
    stddev_samp(price).over(byKey(key, time).rowsBetween(-(n - 1), Window.currentRow))

  /** Bollinger %B: position of price within ±2σ bands of the n-SMA. */
  def bollingerPctB(price: Column, n: Int, key: String, time: String): Column = {
    val m = sma(price, n, key, time)
    val sd = rollingVol(price, n, key, time)
    (price - (m - lit(2) * sd)) / (lit(4) * sd)
  }

  /** RSI (Wilder-ish, simple-average form) over trailing n price changes. */
  def rsi(price: Column, n: Int, key: String, time: String): Column = {
    val change = price - lag(price, 1).over(byKey(key, time))
    val w = byKey(key, time).rowsBetween(-(n - 1), Window.currentRow)
    val gain = avg(when(change > 0, change).otherwise(0.0)).over(w)
    val loss = avg(when(change < 0, -change).otherwise(0.0)).over(w)
    when(loss === 0.0, 100.0)
      .otherwise(lit(100.0) - lit(100.0) / (lit(1.0) + gain / loss))
  }

  /** Convenience: attach a standard indicator set to a bar frame. */
  def enrich(bars: DataFrame, key: String = "ticker", time: String = "datetime",
             price: String = "c", volume: String = "v"): DataFrame =
    bars
      .withColumn("sma20", sma(col(price), 20, key, time))
      .withColumn("vwap20", vwap(col(price), col(volume), 20, key, time))
      .withColumn("vol20", rollingVol(col(price), 20, key, time))
      .withColumn("rsi14", rsi(col(price), 14, key, time))
      .withColumn("pctb20", bollingerPctB(col(price), 20, key, time))
}
