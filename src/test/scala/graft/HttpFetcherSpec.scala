package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the PageFetcher seam with the second (live-protocol) transport: a
  * loopback HTTP stub serving the canned response shapes with injected
  * failures — retry-after-5xx, 429 Retry-After honoring, non-retryable 4xx
  * abort, and rate-limit pacing — driving the SAME partition reader as the
  * file fetcher (reference semantics: reference_endpoints_etl.py:35-42
  * non-200 handling, v2022/.../reference_data_etl.py:21-23 rate guidance).
  */
class HttpFetcherSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def page(ts: Seq[Long], next: Option[String]): String =
    HttpStub.barPage(ts, next)

  private type Stub = HttpStub

  private def readHttp(base: String, tickers: String = "T1") =
    spark.read.format("polygon")
      .option("baseUrl", base).option("tickers", tickers)
      .option("backoffMs", "5")
      .load()

  test("http batch read: cursor chain, boundary dedup, retry after 500 and 429") {
    val stub = new Stub
    try {
      val p = "/pages/T1/minute--1--adjusted"
      stub.pages = Map(
        s"$p/0" -> page(Seq(100L, 200L), Some("1")),
        s"$p/1" -> page(Seq(200L, 300L), None)) // boundary overlap at 200
      // page 1: one 500, then a 429 with Retry-After: 0, then success
      stub.failures = Map(s"$p/1" -> Seq((500, None), (429, Some(0))))
      val rows = readHttp(stub.base).select("t").as[Long].collect().sorted.toSeq
      assert(rows == Seq(100L, 200L, 300L),
        "chain must be followed and the overlap row deduped")
      assert(stub.hitCount(s"$p/1") == 3,
        s"expected 2 failures + 1 success on page 1, got ${stub.hitCount(s"$p/1")}")
    } finally stub.stop()
  }

  test("http: persistent 5xx aborts the scan after bounded retries") {
    val stub = new Stub
    try {
      val p = "/pages/T2/minute--1--adjusted"
      stub.pages = Map(s"$p/0" -> page(Seq(1L), None))
      stub.failures = Map(s"$p/0" -> Seq.fill(10)((503, None)))
      val e = intercept[org.apache.spark.SparkException] {
        readHttp(stub.base, tickers = "T2").count()
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("after 3 retries"), s"unbounded or unlabeled retry: $msg")
      assert(stub.hitCount(s"$p/0") == 4, "1 attempt + 3 retries, then abort")
    } finally stub.stop()
  }

  test("http: non-retryable 4xx aborts immediately") {
    val stub = new Stub
    try {
      val e = intercept[org.apache.spark.SparkException] {
        readHttp(stub.base, tickers = "T3").count() // nothing registered → 404
      }
      val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
      assert(msg.contains("HTTP 404"), s"expected pointed 404 error: $msg")
      assert(stub.hitCount("/pages/T3/minute--1--adjusted/0") == 1,
        "4xx must not be retried")
    } finally stub.stop()
  }

  test("http: a pushed ticker filter seeds the series universe; none at all fails fast") {
    val stub = new Stub
    try {
      val p = "/pages/T5/minute--1--adjusted"
      stub.pages = Map(s"$p/0" -> page(Seq(7L), None))
      // no 'tickers' option — the pushed equality must define the universe
      val viaFilter = spark.read.format("polygon")
        .option("baseUrl", stub.base).option("backoffMs", "5").load()
        .filter(col("ticker") === "T5")
      assert(viaFilter.select("t").as[Long].collect().toSeq == Seq(7L))
      // no option and no pushable ticker filter: loud error, not 0 rows
      val e = intercept[Exception] {
        spark.read.format("polygon")
          .option("baseUrl", stub.base).option("backoffMs", "5").load().count()
      }
      def msgs(t: Throwable): String =
        if (t == null) "" else t.getMessage + msgs(t.getCause)
      assert(msgs(e).contains("series universe"), s"silent empty scan: ${msgs(e)}")
    } finally stub.stop()
  }

  test("http dim endpoint: cursor chain walked with pushed equality filter, retries intact") {
    val stub = new Stub
    try {
      def row(tk: String, market: String) =
        s"""{"ticker":"$tk","name":"Name $tk","market":"$market","locale":"us",""" +
          s""""primary_exchange":"X0","type":"CS","active":true,"currency_name":"usd"}"""
      def dimPage(rows: Seq[String], next: Option[String]) =
        s"""{"status":"OK","results":${rows.mkString("[", ",", "]")},""" +
          s""""next_url":${next.map("\"" + _ + "\"").getOrElse("null")}}"""
      val p = "/pages/_ref/tickers"
      stub.pages = Map(
        s"$p/0" -> dimPage(Seq(row("AAA", "stocks"), row("BBB", "crypto")), Some("1")),
        s"$p/1" -> dimPage(Seq(row("CCC", "stocks")), None))
      stub.failures = Map(s"$p/1" -> Seq((500, None))) // transient, retried
      val df = spark.read.format("polygon")
        .option("baseUrl", stub.base).option("endpoint", "tickers")
        .option("backoffMs", "5").load()
        .filter(col("market") === "stocks")
      assert(df.select("ticker").as[String].collect().sorted.toSeq ==
        Seq("AAA", "CCC"),
        "dim chain must be walked over http with the market filter applied")
      assert(stub.hitCount(s"$p/1") == 2, "transient 500 must be retried once")
    } finally stub.stop()
  }

  test("http: per-JVM rate limit paces page requests") {
    val stub = new Stub
    try {
      val p = "/pages/T4/minute--1--adjusted"
      stub.pages = Map(
        s"$p/0" -> page(Seq(10L), Some("1")),
        s"$p/1" -> page(Seq(20L), Some("2")),
        s"$p/2" -> page(Seq(30L), None))
      val t0 = System.currentTimeMillis()
      val n = spark.read.format("polygon")
        .option("baseUrl", stub.base).option("tickers", "T4")
        .option("rateLimitMs", "40").load().count()
      val elapsed = System.currentTimeMillis() - t0
      assert(n == 3)
      assert(elapsed >= 80, s"3 pages at 40ms spacing finished in ${elapsed}ms")
    } finally stub.stop()
  }
}
