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
                          pages: Seq[Seq[Long]]): Unit = {
    val dir = root.resolve(ticker).resolve(if (adjusted) "adjusted" else "raw")
    Files.createDirectories(dir)
    pages.zipWithIndex.foreach { case (ts, i) =>
      val next = if (i < pages.size - 1) Some(f"page-${i + 1}%04d.json") else None
      Files.writeString(dir.resolve(f"page-$i%04d.json"), page(ts, next))
    }
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
}
