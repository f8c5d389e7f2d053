package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end tests of the "polygon" DataSourceV2 against canned page files
  * reproducing the upstream protocol's shapes: overlapping duplicate pages
  * (O-SRC2's by-design duplicates), short final page, empty response, and
  * cursor chaining (FIXTURES.md §B variants).
  */
class PolygonSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def page(ts: Seq[Long], next: Option[String]): String = {
    val bars = ts.map(t =>
      s"""{"t":$t,"o":1.0,"h":2.0,"l":0.5,"c":1.5,"v":100.0,"vw":1.2,"n":3}""")
      .mkString("[", ",", "]")
    s"""{"status":"OK","results":$bars,"next_url":${next.map("\"" + _ + "\"").getOrElse("null")}}"""
  }

  private def writeSeries(root: Path, ticker: String, adjusted: Boolean,
                          pages: Seq[Seq[Long]]): Unit =
    writeSeriesDir(root, ticker, if (adjusted) "adjusted" else "raw", pages)

  private def writeSeriesDir(root: Path, ticker: String, seriesDir: String,
                             pages: Seq[Seq[Long]]): Unit = {
    val dir = root.resolve(ticker).resolve(seriesDir)
    Files.createDirectories(dir)
    pages.zipWithIndex.foreach { case (ts, i) =>
      val next = if (i < pages.size - 1) Some(f"page-${i + 1}%04d.json") else None
      Files.writeString(dir.resolve(f"page-$i%04d.json"), page(ts, next))
    }
  }

  private def writeDimPage(root: Path, endpoint: String, idx: Int,
                           rows: Seq[String], next: Option[String]): Unit = {
    val dir = root.resolve("_ref").resolve(endpoint)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(f"page-$idx%04d.json"),
      s"""{"status":"OK","results":${rows.mkString("[", ",", "]")},""" +
        s""""next_url":${next.map("\"" + _ + "\"").getOrElse("null")}}""")
  }

  private def fixture(): Path = {
    val root = Files.createTempDirectory("polygon-pages")
    // AAPL adjusted: 3 pages, page 1 re-fetches ts 300 (duplicate by design),
    // short final page
    writeSeries(root, "AAPL", adjusted = true,
      Seq(Seq(100L, 200L, 300L), Seq(300L, 400L, 500L), Seq(600L)))
    // AAPL raw variant
    writeSeries(root, "AAPL", adjusted = false, Seq(Seq(100L, 200L)))
    // MSFT adjusted incl. an empty page mid-stream
    writeSeries(root, "MSFT", adjusted = true, Seq(Seq(50L, 150L), Seq(), Seq(250L)))
    root
  }

  test("batch read: pages union'd, duplicates dropped, ascending per series") {
    val df = spark.read.format("polygon").option("path", fixture().toString).load()
    val rows = df.select("ticker", "adjusted", "t")
      .as[(String, Boolean, Long)].collect().sorted.toSeq
    assert(rows == Seq(
      ("AAPL", false, 100L), ("AAPL", false, 200L),
      ("AAPL", true, 100L), ("AAPL", true, 200L), ("AAPL", true, 300L),
      ("AAPL", true, 400L), ("AAPL", true, 500L), ("AAPL", true, 600L),
      ("MSFT", true, 50L), ("MSFT", true, 150L), ("MSFT", true, 250L)))
  }

  test("one input partition per (ticker, adjusted) series") {
    val df = spark.read.format("polygon").option("path", fixture().toString).load()
    assert(df.rdd.getNumPartitions == 3)
  }

  test("ticker + adjusted pushdown prunes partitions; t-range pushdown bounds the scan") {
    val root = fixture().toString
    val pruned = spark.read.format("polygon").option("path", root).load()
      .filter(col("ticker") === "AAPL" && col("adjusted") === true)
    assert(pruned.rdd.getNumPartitions == 1, "filter must prune to one series")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters=[") && plan.contains("ticker"),
      s"pushdown not visible in plan:\n$plan")

    val ranged = spark.read.format("polygon").option("path", root).load()
      .filter(col("ticker") === "AAPL" && col("adjusted") === true &&
        col("t") > 200L && col("t") <= 500L)
    assert(ranged.select("t").as[Long].collect().sorted.toSeq == Seq(300L, 400L, 500L))
  }

  test("limit pushdown caps rows per series") {
    val df = spark.read.format("polygon").option("path", fixture().toString).load()
      .filter(col("ticker") === "AAPL" && col("adjusted") === true)
      .limit(2)
    assert(df.count() == 2)
  }

  test("progress guard aborts a scan stuck on non-advancing pages") {
    val root = Files.createTempDirectory("polygon-stuck")
    // 4 pages that never advance the watermark (same timestamps repeated)
    writeSeries(root, "STUK", adjusted = true,
      Seq(Seq(100L), Seq(100L), Seq(100L), Seq(100L)))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("polygon").option("path", root.toString).load().count()
    }
    assert(e.getMessage.contains("no-progress") ||
      Option(e.getCause).exists(_.getMessage.contains("no-progress")))
  }

  test("error-status page aborts the scan with a pointed message") {
    val root = Files.createTempDirectory("polygon-err")
    val dir = root.resolve("BAD/adjusted")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("page-0000.json"),
      """{"status":"ERROR","results":[],"next_url":null}""")
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("polygon").option("path", root.toString).load().count()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("status 'ERROR'"), s"unhelpful error: $msg")
  }

  test("per-JVM rate limit spaces page fetches") {
    val root = fixture().toString
    val t0 = System.currentTimeMillis()
    spark.read.format("polygon").option("path", root)
      .option("rateLimitMs", "40")
      .load().filter(col("ticker") === "AAPL" && col("adjusted") === true).count()
    val elapsed = System.currentTimeMillis() - t0
    assert(elapsed >= 80, s"3 pages at 40ms spacing finished in ${elapsed}ms")
  }

  test("multi-granularity tree: full series key in schema, legacy dirs = minute--1") {
    val root = Files.createTempDirectory("polygon-multigran")
    writeSeriesDir(root, "AAPL", "minute--1--adjusted", Seq(Seq(100L, 200L)))
    writeSeriesDir(root, "AAPL", "hour--1--adjusted", Seq(Seq(0L)))
    writeSeriesDir(root, "AAPL", "minute--5--adjusted", Seq(Seq(300L)))
    writeSeries(root, "MSFT", adjusted = false, Seq(Seq(50L))) // legacy layout
    val df = spark.read.format("polygon").option("path", root.toString).load()
    val series = df.select("ticker", "timespan", "multiplier", "adjusted")
      .distinct().as[(String, String, Int, Boolean)].collect().sorted.toSeq
    assert(series == Seq(
      ("AAPL", "hour", 1, true), ("AAPL", "minute", 1, true),
      ("AAPL", "minute", 5, true), ("MSFT", "minute", 1, false)))
    assert(df.rdd.getNumPartitions == 4, "one partition per full series key")
  }

  test("timespan/multiplier pushdown prunes series partitions") {
    val root = Files.createTempDirectory("polygon-granprune")
    writeSeriesDir(root, "AAPL", "minute--1--adjusted", Seq(Seq(100L, 200L)))
    writeSeriesDir(root, "AAPL", "hour--1--adjusted", Seq(Seq(0L)))
    writeSeriesDir(root, "AAPL", "minute--5--adjusted", Seq(Seq(300L)))
    val hourOnly = spark.read.format("polygon").option("path", root.toString).load()
      .filter(col("timespan") === "hour")
    assert(hourOnly.rdd.getNumPartitions == 1, "timespan must prune to one series")
    val m5 = spark.read.format("polygon").option("path", root.toString).load()
      .filter(col("timespan") === "minute" && col("multiplier") === 5)
    assert(m5.rdd.getNumPartitions == 1, "multiplier must prune within timespan")
    assert(m5.select("t").as[Long].collect().toSeq == Seq(300L))
    val plan = m5.queryExecution.executedPlan.toString
    assert(plan.contains("timespan") && plan.contains("multiplier"),
      s"granularity pushdown not visible in plan:\n$plan")
  }

  test("mid-migration tree: legacy and explicit dirs for the same series read once") {
    val root = Files.createTempDirectory("polygon-migr")
    // both dirs map to SeriesKey(MIGR, minute, 1, adjusted=true)
    writeSeries(root, "MIGR", adjusted = true, Seq(Seq(100L, 200L)))
    writeSeriesDir(root, "MIGR", "minute--1--adjusted", Seq(Seq(100L, 200L)))
    val df = spark.read.format("polygon").option("path", root.toString).load()
    assert(df.rdd.getNumPartitions == 1,
      "duplicate series keys must collapse to one partition")
    assert(df.select("t").as[Long].collect().sorted.toSeq == Seq(100L, 200L),
      "rows must not double")
  }

  test("tickers endpoint: cursor-chained dim scan with market pushdown") {
    val root = Files.createTempDirectory("polygon-dims")
    def trow(t: String, market: String, active: Boolean) =
      s"""{"ticker":"$t","name":"Name $t","market":"$market","locale":"us",""" +
        s""""primary_exchange":"XNAS","type":"CS","active":$active,"currency_name":"usd"}"""
    writeDimPage(root, "tickers", 0,
      Seq(trow("AAPL", "stocks", true), trow("X:BTC", "crypto", true)),
      Some("page-0001.json"))
    writeDimPage(root, "tickers", 1,
      Seq(trow("MSFT", "stocks", false)), None)
    val dims = spark.read.format("polygon").option("path", root.toString)
      .option("endpoint", "tickers").load()
    assert(dims.count() == 3, "cursor chain must union both pages")
    val stocks = dims.filter(col("market") === "stocks")
    assert(stocks.select("ticker").as[String].collect().sorted.toSeq ==
      Seq("AAPL", "MSFT"))
    val plan = stocks.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters=[") && plan.contains("market"),
      s"market pushdown (O-F3) not visible:\n$plan")
    // dim pages must not leak into the bar-series discovery
    val bars = spark.read.format("polygon").option("path", root.toString).load()
    assert(bars.count() == 0, "_ref must be excluded from series discovery")
  }

  test("splits + dividends endpoints expose the reference schemas") {
    val root = Files.createTempDirectory("polygon-dims2")
    writeDimPage(root, "splits", 0,
      Seq("""{"ticker":"AAPL","execution_date":"2024-06-10","split_from":1.0,"split_to":4.0}"""),
      None)
    writeDimPage(root, "dividends", 0,
      Seq("""{"ticker":"AAPL","ex_dividend_date":"2024-02-09","pay_date":"2024-02-15",""" +
        """"cash_amount":0.24,"frequency":4}"""), None)
    val splits = spark.read.format("polygon").option("path", root.toString)
      .option("endpoint", "splits").load()
    assert(splits.columns.toSeq ==
      Seq("ticker", "execution_date", "split_from", "split_to"))
    assert(splits.as[(String, String, Double, Double)].head() ==
      ("AAPL", "2024-06-10", 1.0, 4.0))
    val divs = spark.read.format("polygon").option("path", root.toString)
      .option("endpoint", "dividends").load()
    assert(divs.columns.toSeq ==
      Seq("ticker", "ex_dividend_date", "pay_date", "cash_amount", "frequency"))
    assert(divs.select("cash_amount").as[Double].head() == 0.24)
  }

  test("streaming: micro-batches consume new pages incrementally, exactly-once") {
    val root = Files.createTempDirectory("polygon-stream")
    writeSeries(root, "LIVE", adjusted = true, Seq(Seq(10L, 20L)))
    val q = spark.readStream.format("polygon").option("path", root.toString).load()
      .writeStream.outputMode("append").format("memory").queryName("live_bars").start()
    q.processAllAvailable()
    assert(spark.table("live_bars").select("t").as[Long].collect().sorted.toSeq
      == Seq(10L, 20L))
    // a new page lands (cursor chain extended), next trigger picks up only it
    Files.writeString(root.resolve("LIVE/adjusted/page-0000.json"),
      page(Seq(10L, 20L), Some("page-0001.json")))
    Files.writeString(root.resolve("LIVE/adjusted/page-0001.json"),
      page(Seq(30L), None))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("live_bars").select("t").as[Long].collect().sorted.toSeq
      == Seq(10L, 20L, 30L))
  }

  test("streaming: page-boundary overlap rows are not re-emitted across micro-batches") {
    val root = Files.createTempDirectory("polygon-overlap")
    writeSeries(root, "OVLP", adjusted = true, Seq(Seq(10L, 20L)))
    val q = spark.readStream.format("polygon").option("path", root.toString).load()
      .writeStream.outputMode("append").format("memory")
      .queryName("overlap_bars").start()
    q.processAllAvailable()
    assert(spark.table("overlap_bars").count() == 2)
    // the upstream protocol re-fetches the boundary: the new page re-serves
    // t=20 before the new rows (O-SRC2's date-granularity restart). A later
    // micro-batch starts at this page — without the boundary seed the
    // duplicate t=20 would re-enter the stream and double-count any
    // downstream aggregate that doesn't itself dedup (gold OHLC bars).
    Files.writeString(root.resolve("OVLP/adjusted/page-0000.json"),
      page(Seq(10L, 20L), Some("page-0001.json")))
    Files.writeString(root.resolve("OVLP/adjusted/page-0001.json"),
      page(Seq(20L, 30L, 40L), None))
    q.processAllAvailable()
    q.stop()
    val ts = spark.table("overlap_bars").select("t").as[Long].collect().sorted.toSeq
    assert(ts == Seq(10L, 20L, 30L, 40L),
      s"boundary duplicate must be dropped by the reader, got $ts")
  }

  test("tail scan (pushed ORDER BY t DESC LIMIT k) dedups page-boundary overlap") {
    val root = Files.createTempDirectory("polygon-tail")
    // pages with the protocol's by-design overlap: page-0001 re-serves t=20
    Files.createDirectories(root.resolve("TAIL/adjusted"))
    Files.writeString(root.resolve("TAIL/adjusted/page-0000.json"),
      page(Seq(10L, 20L), Some("page-0001.json")))
    Files.writeString(root.resolve("TAIL/adjusted/page-0001.json"),
      page(Seq(20L, 30L, 40L), None))
    def scan = spark.read.format("polygon").option("path", root.toString).load()
      .filter(org.apache.spark.sql.functions.col("ticker") === "TAIL")
    val top2 = scan.orderBy(org.apache.spark.sql.functions.col("t").desc).limit(2)
      .select("t").as[Long].collect().toSeq
    assert(top2 == Seq(40L, 30L), s"tail-2 wrong: $top2")
    // k spans the overlap row AND the previous page: t=20 must appear once
    val top4 = scan.orderBy(org.apache.spark.sql.functions.col("t").desc).limit(4)
      .select("t").as[Long].collect().toSeq
    assert(top4 == Seq(40L, 30L, 20L, 10L), s"overlap row duplicated or lost: $top4")
  }

  test("maxPagesPerTrigger: a deep catch-up drains in bounded micro-batches, exactly once") {
    val root = Files.createTempDirectory("polygon-admission")
    // 5-page chain, 2 rows per page, no overlap (t strictly ascending)
    val ts = (1 to 10).map(_ * 1000L)
    writeSeries(root, "ADM", adjusted = true, ts.grouped(2).toSeq)
    val q = spark.readStream.format("polygon").option("path", root.toString)
      .option("maxPagesPerTrigger", "2").load()
      .writeStream.outputMode("append").format("memory")
      .queryName("adm_bars").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("adm_bars").select("t").as[Long].collect().sorted.toSeq
    assert(got == ts, s"catch-up must be exactly-once: $got")
    // the 5-page chain must have drained in ceil(5/2) = 3 admitted batches,
    // each bounded at 2 pages (4 rows)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 3,
      s"expected >=3 bounded micro-batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows <= 4),
      s"a micro-batch exceeded the 2-page cap: ${batches.map(_.numInputRows).toSeq}")
  }

  test("tail scan fetches O(k/pageSize) pages from a deep chain, not the whole chain") {
    // 1000-page chain through a counting stub fetcher: latest-5 must touch
    // only the tail — the whole point of pushing ORDER BY t DESC LIMIT k
    // into the source (2 fetches vs 10^3; at a year-deep real series, 10^5)
    val key = graft.sources.SeriesKey("DEEP", "minute", 1, adjusted = true)
    class CountingFetcher extends graft.sources.PageFetcher {
      var fetches = 0
      val pageRows = 3
      val nPages = 1000
      override def chainLength(k: graft.sources.SeriesKey) = Some(nPages)
      override def cursorAt(k: graft.sources.SeriesKey, idx: Int) =
        if (idx >= 0 && idx < nPages) Some(idx.toString) else None
      override def fetch(cursor: String): graft.sources.Page = {
        fetches += 1
        val p = cursor.toInt
        // ascending rows; each page re-serves its predecessor's last row
        val base = p.toLong * pageRows
        val ts = (if (p > 0) Seq(base - 1) else Seq.empty) ++
          (0 until pageRows).map(base + _)
        graft.sources.Page(
          ts.map(t => graft.sources.Bar0(t, 1, 2, 0, 1, 10, 1, 1)).toArray, None)
      }
    }
    val f = new CountingFetcher
    val reader = new graft.sources.PolygonTailReader(f,
      graft.sources.SeriesPartition(key, 0, Int.MaxValue),
      tFromExcl = None, tToIncl = None, k = 5, rateLimitMs = 0)
    val got = Iterator.continually(reader)
      .takeWhile(_.next()).map(_.get().getLong(1)).toSeq
    assert(got == Seq(2999L, 2998L, 2997L, 2996L, 2995L),
      s"tail-5 of the deep chain wrong: $got")
    assert(f.fetches <= 2, s"tail scan touched ${f.fetches} pages of 1000")
  }

  test("boundary cache is consume-once: a hit removes the entry (no unbounded growth)") {
    // ADVICE r2: the per-JVM boundary map grew one entry per (series × batch)
    // forever on a long-running streaming executor. Each entry serves exactly
    // one successor micro-batch, so lookup consumes it.
    graft.sources.PolygonSource.recordBoundary("/cache-test", "T|minute|1|adjusted", 3, 42L)
    assert(graft.sources.PolygonSource.lookupBoundary("/cache-test", "T|minute|1|adjusted", 3)
      .contains(42L))
    assert(graft.sources.PolygonSource.lookupBoundary("/cache-test", "T|minute|1|adjusted", 3)
      .isEmpty, "second lookup must miss: the entry was consumed")
  }
}
