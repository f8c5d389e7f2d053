package graft.core

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Typed schemas for the reference's data model (SURVEY.md §1.3/§1.5).
  * Declared explicitly — the engine core never relies on schema inference;
  * inference is allowed only at bronze JSON ingest.
  *
  * Field set sources: bar fields accessed at
  * polygon-etl-container/src/aggregates_stocks_etl.py:72 and
  * v2022/etl-containers/aggregates/src/aggregates_etl.py:129 (Polygon v2
  * aggregates contract: v, vw, o, c, h, l, t, n); tickers filter columns at
  * polygon-etl-container/src/main.py:34; splits/dividends refreshed at
  * polygon-etl-container/src/main.py:31-32.
  */
object Schemas {

  /** Silver bar — key (ticker, t, adjusted); `t` is epoch-ms window start,
    * `datetime` its UTC TimestampType twin (O-X5).
    */
  final case class Bar(
      ticker: String, t: Long, o: Double, h: Double, l: Double, c: Double,
      v: Double, vw: Double, n: Long, adjusted: Boolean,
      multiplier: Int, timespan: String, datetime: Timestamp)

  final case class Ticker(
      ticker: String, name: String, market: String, primary_exchange: String,
      `type`: String, currency_name: String, active: Boolean,
      snapshot_ts: Timestamp)

  final case class Split(
      ticker: String, execution_date: java.sql.Date,
      split_from: Double, split_to: Double, snapshot_ts: Timestamp)

  final case class Dividend(
      ticker: String, ex_dividend_date: java.sql.Date, cash_amount: Double,
      frequency: Int, snapshot_ts: Timestamp)

  /** One element of a raw page's `results` array (bronze). */
  val barResultType: StructType = StructType(Seq(
    StructField("v", DoubleType), StructField("vw", DoubleType),
    StructField("o", DoubleType), StructField("c", DoubleType),
    StructField("h", DoubleType), StructField("l", DoubleType),
    StructField("t", LongType), StructField("n", LongType)))

  /** Whole raw API page (bronze landing, O-SRC4):
    * v2022/etl-containers/aggregates/src/aggregates_etl.py:117-125.
    */
  val rawPageSchema: StructType = StructType(Seq(
    StructField("ticker", StringType),
    StructField("queryCount", LongType),
    StructField("resultsCount", LongType),
    StructField("adjusted", BooleanType),
    StructField("results", ArrayType(barResultType)),
    StructField("status", StringType),
    StructField("request_id", StringType),
    StructField("next_url", StringType)))

  val barSchema: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("t", LongType, nullable = false),
    StructField("o", DoubleType), StructField("h", DoubleType),
    StructField("l", DoubleType), StructField("c", DoubleType),
    StructField("v", DoubleType), StructField("vw", DoubleType),
    StructField("n", LongType),
    StructField("adjusted", BooleanType, nullable = false),
    StructField("multiplier", IntegerType),
    StructField("timespan", StringType),
    StructField("datetime", TimestampType)))
}
