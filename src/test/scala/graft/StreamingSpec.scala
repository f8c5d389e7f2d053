package graft

import graft.streaming.LiveBars
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming/batch parity: replaying history through the streaming operators
  * must equal the batch tables (SURVEY.md §5.2 replay tests).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("streaming OHLC over a replayed stream equals the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)].collect().toSeq

    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val stream = input.toDF().toDF("user_id", "ts", "value")
    val q = LiveBars.ohlcStream(stream, "ts", "10 minutes", "5 minutes")
      .writeStream.outputMode("append").format("memory").queryName("ohlc_out").start()
    // two chunks → at least two micro-batches; watermark advances between them
    val (a, b) = rows.sortBy(_._2.getTime).splitAt(rows.size / 2)
    input.addData(a); q.processAllAvailable()
    input.addData(b); q.processAllAvailable()
    // push watermark past the end so all windows close, then finalize
    input.addData((999L, ts("2025-01-01 00:00:00"), 0.0)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ohlc_out").filter(col("user_id") =!= 999L)
    val batch = LiveBars.ohlcStream(
      Tables.events(spark, TestSpark.Sf0001)
        .select(col("user_id"), col("ts"), col("value")), "ts", "10 minutes", "5 minutes")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streaming replay != batch aggregate")
  }

  test("streaming session windows over a replayed stream equal batch q21") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)].collect().toSeq

    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val stream = input.toDF().toDF("user_id", "ts", "value")
    val q = LiveBars.sessionStream(stream, "ts", "10 minutes", "30 minutes")
      .writeStream.outputMode("append").format("memory")
      .queryName("session_out").start()
    val (a, b) = rows.sortBy(_._2.getTime).splitAt(rows.size / 2)
    input.addData(a); q.processAllAvailable()
    input.addData(b); q.processAllAvailable()
    input.addData((999L, ts("2025-01-01 00:00:00"), 0.0)); q.processAllAvailable()
    q.stop()

    val streamed = spark.table("session_out").filter(col("user_id") =!= 999L)
    val batch = SparkEntry.queries("q21_session_window")(spark, TestSpark.Sf0001)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streaming session replay != batch q21 aggregate")
  }

  test("stream-static enrichment join: live bars pick up dimension attributes") {
    implicit val sqlCtx = spark.sqlContext
    val tickers = Seq(("AAPL", "Apple Inc", "XNAS"), ("MSFT", "Microsoft", "XNAS"))
      .toDF("ticker", "name", "primary_exchange")
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val stream = input.toDF().toDF("ticker", "ts", "price")
      .join(broadcast(tickers), Seq("ticker"), "left")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("enriched_bars").start()
    input.addData(("AAPL", ts("2024-01-01 10:00:00"), 100.0),
                  ("ZZZZ", ts("2024-01-01 10:00:00"), 1.0))
    q.processAllAvailable(); q.stop()
    val out = spark.table("enriched_bars")
      .select("ticker", "name").as[(String, Option[String])].collect().toMap
    assert(out("AAPL").contains("Apple Inc"))
    assert(out("ZZZZ").isEmpty, "unknown ticker keeps null dimension (left join)")
  }

  test("stream-stream interval join: trades pick up in-window quotes across micro-batches, equals batch join") {
    implicit val sqlCtx = spark.sqlContext
    val tIn = MemoryStream[(String, java.sql.Timestamp, Double)]
    val qIn = MemoryStream[(String, java.sql.Timestamp, Double)]
    val trades = tIn.toDF().toDF("ticker", "trade_ts", "price")
    val quotes = qIn.toDF().toDF("ticker", "quote_ts", "bid")
    val joined = LiveBars.intervalJoinStream(
      trades, "trade_ts", quotes, "quote_ts",
      keys = Seq("ticker"), lookback = "10 minutes", delay = "5 minutes")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()

    // quotes land FIRST, in their own micro-batch — they must wait in join
    // state for trades that arrive later
    qIn.addData(
      ("AAPL", ts("2024-01-01 10:00:00"), 99.0),  // in window for the 10:05 trade
      ("AAPL", ts("2024-01-01 09:50:00"), 98.0),  // 15 min before → outside lookback
      ("MSFT", ts("2024-01-01 10:01:00"), 50.0))  // wrong key
    q.processAllAvailable()
    tIn.addData(("AAPL", ts("2024-01-01 10:05:00"), 100.0))
    q.processAllAvailable()
    // a second trade in a later batch joins the SAME buffered quote
    tIn.addData(("AAPL", ts("2024-01-01 10:08:00"), 101.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("ssj_out")
      .select("ticker", "price", "bid")
      .as[(String, Double, Double)].collect().sorted.toSeq
    assert(out == Seq(("AAPL", 100.0, 99.0), ("AAPL", 101.0, 99.0)),
      s"expected exactly the in-window same-key matches, got $out")

    // batch parity: the identical declarative plan over static frames
    val bTrades = Seq(("AAPL", ts("2024-01-01 10:05:00"), 100.0),
      ("AAPL", ts("2024-01-01 10:08:00"), 101.0)).toDF("ticker", "trade_ts", "price")
    val bQuotes = Seq(("AAPL", ts("2024-01-01 10:00:00"), 99.0),
      ("AAPL", ts("2024-01-01 09:50:00"), 98.0),
      ("MSFT", ts("2024-01-01 10:01:00"), 50.0)).toDF("ticker", "quote_ts", "bid")
    val batch = LiveBars.intervalJoinStream(bTrades, "trade_ts", bQuotes, "quote_ts",
        Seq("ticker"), "10 minutes", "5 minutes")
      .select("ticker", "price", "bid")
      .as[(String, Double, Double)].collect().sorted.toSeq
    assert(batch == out, s"streamed $out != batch $batch")
  }

  test("LiveIngest live path: ProcessingTime trigger tails pages appearing mid-run") {
    val pages = java.nio.file.Files.createTempDirectory("li-live-pages")
    val wh = java.nio.file.Files.createTempDirectory("li-live-wh").toString
    val dir = pages.resolve("AAPL/adjusted")
    java.nio.file.Files.createDirectories(dir)
    def page(ts: Seq[Long], next: Option[String]): String = {
      val bars = ts.map(t =>
        s"""{"t":$t,"o":1.0,"h":2.0,"l":0.5,"c":1.5,"v":100.0,"vw":1.2,"n":3}""")
        .mkString("[", ",", "]")
      s"""{"status":"OK","results":$bars,"next_url":${next.map("\"" + _ + "\"").getOrElse("null")}}"""
    }
    java.nio.file.Files.writeString(dir.resolve("page-0000.json"),
      page(Seq(60000L), None))
    val q = graft.app.LiveIngest.start(spark, pages.toString, wh,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
    def silverCount(): Long =
      try spark.read.parquet(s"$wh/silver/bars_live").count()
      catch { case _: Throwable => 0L }
    def awaitCount(n: Long, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      while (silverCount() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(silverCount() == n, s"$what: expected $n rows, got ${silverCount()}")
    }
    try {
      // the query keeps running: first page lands without any manual trigger
      awaitCount(1, "initial page")
      // new pages appear MID-RUN (cursor chain extended, boundary overlap at
      // 60000): the live trigger must pick up only the new rows
      java.nio.file.Files.writeString(dir.resolve("page-0000.json"),
        page(Seq(60000L), Some("page-0001.json")))
      java.nio.file.Files.writeString(dir.resolve("page-0001.json"),
        page(Seq(60000L, 120000L, 180000L), None))
      awaitCount(3, "mid-run pages")
      // incremental micro-batches, not one big one: at least two non-empty
      // batches must have run, and observed event time must have advanced
      // to the mid-run rows (the 1h dedup delay keeps the watermark itself
      // at epoch for these 3-minute fixtures — max event time is what
      // drives it)
      val progresses = q.recentProgress.filter(_.numInputRows > 0)
      assert(progresses.length >= 2,
        s"expected >=2 non-empty micro-batches, got ${progresses.length}")
      val maxEt = q.recentProgress.flatMap(p =>
        Option(p.eventTime.get("max"))).maxOption
      assert(maxEt.exists(_ >= "1970-01-01T00:03:00.000Z"),
        s"event time did not advance to the mid-run rows: $maxEt")
    } finally q.stop()
    val rows = spark.read.parquet(s"$wh/silver/bars_live")
      .select("t").as[Long].collect().sorted.toSeq
    assert(rows == Seq(60000L, 120000L, 180000L),
      "exactly-once visible rows under the live trigger")
  }

  test("streaming dim refresh: two AvailableNow runs over a growing chain = two snapshots, current = latest") {
    val pages = java.nio.file.Files.createTempDirectory("dim-stream-pages")
    val wh = java.nio.file.Files.createTempDirectory("dim-stream-wh").toString
    val dir = pages.resolve("_ref/tickers")
    java.nio.file.Files.createDirectories(dir)
    def tickerRow(tk: String) =
      s"""{"ticker":"$tk","name":"Name $tk","market":"stocks","locale":"us",""" +
        s""""primary_exchange":"X0","type":"CS","active":true,"currency_name":"usd"}"""
    def dimPage(rows: Seq[String], next: Option[String]) =
      s"""{"status":"OK","results":${rows.mkString("[", ",", "]")},""" +
        s""""next_url":${next.map("\"" + _ + "\"").getOrElse("null")}}"""
    java.nio.file.Files.writeString(dir.resolve("page-0000.json"),
      dimPage(Seq(tickerRow("AAA"), tickerRow("BBB")), None))

    def refresh(): Unit = {
      val q = graft.app.LiveIngest.startDimRefresh(spark, pages.toString, wh)
      q.awaitTermination(); ()
    }
    refresh()
    val current1 = spark.read.parquet(s"$wh/dims/tickers")
      .select("ticker").as[String].collect().sorted.toSeq
    assert(current1 == Seq("AAA", "BBB"))

    // the chain GROWS between runs (the next day's refresh sees more pages);
    // the new run must re-read the WHOLE chain (snapshot, not delta)
    java.nio.file.Files.writeString(dir.resolve("page-0000.json"),
      dimPage(Seq(tickerRow("AAA"), tickerRow("BBB")), Some("page-0001.json")))
    java.nio.file.Files.writeString(dir.resolve("page-0001.json"),
      dimPage(Seq(tickerRow("CCC")), None))
    refresh()
    val current2 = spark.read.parquet(s"$wh/dims/tickers")
      .select("ticker").as[String].collect().sorted.toSeq
    assert(current2 == Seq("AAA", "BBB", "CCC"),
      "second refresh must be the full chain, not the delta")
    val snapshots = spark.read.parquet(s"$wh/dims/tickers_history")
      .select("snapshot_ts").distinct().count()
    assert(snapshots == 2, s"expected 2 timestamped snapshots, got $snapshots")
    val latest = graft.core.Sinks.latestSnapshot(spark, s"$wh/dims/tickers_history")
      .select("ticker").as[String].collect().sorted.toSeq
    assert(latest == current2, "latest snapshot must equal the current view")

    // unchanged chain → no batch fires, nothing rewritten
    refresh()
    val snapshots3 = spark.read.parquet(s"$wh/dims/tickers_history")
      .select("snapshot_ts").distinct().count()
    assert(snapshots3 == 2, "a refresh over an unchanged chain must write nothing")

    // IN-PLACE content change (same page count — a renamed universe entry):
    // the content signature in the offset must still fire a refresh
    java.nio.file.Files.writeString(dir.resolve("page-0001.json"),
      dimPage(Seq(tickerRow("DDD")), None))
    refresh()
    val current3 = spark.read.parquet(s"$wh/dims/tickers")
      .select("ticker").as[String].collect().sorted.toSeq
    assert(current3 == Seq("AAA", "BBB", "DDD"),
      "an in-place rewrite with unchanged page count must refresh the view")
    val snapshots4 = spark.read.parquet(s"$wh/dims/tickers_history")
      .select("snapshot_ts").distinct().count()
    assert(snapshots4 == 3, s"in-place change must add one snapshot, got $snapshots4")
  }

  test("http streaming: AvailableNow drains the cursor chain in bounded batches with cross-batch dedup") {
    val stub = new HttpStub
    try {
      val p = "/pages/HS/minute--1--adjusted"
      stub.pages = Map(
        s"$p/0" -> HttpStub.barPage(Seq(100L, 200L), Some("1")),
        s"$p/1" -> HttpStub.barPage(Seq(200L, 300L), None)) // boundary overlap
      val q = spark.readStream.format("polygon")
        .option("baseUrl", stub.base).option("tickers", "HS")
        .option("backoffMs", "5").option("maxPagesPerTrigger", "1")
        .load()
        .writeStream.outputMode("append").format("memory")
        .queryName("http_stream_out")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val rows = spark.table("http_stream_out")
        .select("t").as[Long].collect().sorted.toSeq
      assert(rows == Seq(100L, 200L, 300L),
        s"chain must drain exactly-once across micro-batches: $rows")
      assert(q.recentProgress.count(_.numInputRows > 0) == 2,
        "1-page admission cap must yield one micro-batch per page")
      // frontier discovery is a bounded existence probe, not a re-read:
      // each beyond-chain page is 404-probed exactly once (pinned cap)
      assert(stub.hitCount(s"$p/2") == 1 && stub.hitCount(s"$p/3") == 1,
        "gallop+binary probe must touch each missing page once")
      assert(stub.hitCount(s"$p/0") <= 2 && stub.hitCount(s"$p/1") <= 2,
        "a data page is fetched at most once by the probe and once by the read")
    } finally stub.stop()
  }

  test("http streaming: ProcessingTime trigger tails pages appearing mid-run; idle probes are one 404") {
    val stub = new HttpStub
    try {
      val p = "/pages/HT/minute--1--adjusted"
      // next_url may already name a page that does not exist yet (a live
      // chain's tail): the frontier probe, not the link, decides visibility
      stub.pages = Map(s"$p/0" -> HttpStub.barPage(Seq(100L), Some("1")))
      val q = spark.readStream.format("polygon")
        .option("baseUrl", stub.base).option("tickers", "HT")
        .option("backoffMs", "5")
        .load()
        .writeStream.outputMode("append").format("memory")
        .queryName("http_live_out")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
        .start()
      def outCount(): Long = spark.table("http_live_out").count()
      def awaitCount(n: Long, what: String): Unit = {
        val deadline = System.currentTimeMillis() + 30000
        while (outCount() < n && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(outCount() == n, s"$what: expected $n rows, got ${outCount()}")
      }
      try {
        awaitCount(1, "initial page")
        // the chain grows MID-RUN with the usual boundary overlap: only the
        // genuinely new rows may enter the stream
        stub.pages += s"$p/1" -> HttpStub.barPage(Seq(100L, 200L, 300L), None)
        awaitCount(3, "mid-run page")
        Thread.sleep(500) // a few idle triggers
        assert(outCount() == 3, "idle triggers must admit nothing")
        // idle probing cost: each idle trigger asks once for the next page
        // (404) and must NOT refetch pages behind the frontier
        assert(stub.hitCount(s"$p/2") >= 2, "idle triggers must keep probing the frontier")
        assert(stub.hitCount(s"$p/0") <= 3,
          s"frontier probing must not re-read drained pages (page0 hit ${stub.hitCount(s"$p/0")} times)")
      } finally q.stop()
      val rows = spark.table("http_live_out")
        .select("t").as[Long].collect().sorted.toSeq
      assert(rows == Seq(100L, 200L, 300L),
        s"exactly-once visible rows under the live trigger: $rows")
    } finally stub.stop()
  }

  test("LiveIngest.startHttp: stub-server catch-up lands silver; a second run appends only new pages") {
    val stub = new HttpStub
    val wh = java.nio.file.Files.createTempDirectory("li-http-wh").toString
    try {
      val pA = "/pages/HA/minute--1--adjusted"
      val pB = "/pages/HB/minute--1--adjusted"
      stub.pages = Map(
        s"$pA/0" -> HttpStub.barPage(Seq(60000L, 120000L), Some("1")),
        s"$pA/1" -> HttpStub.barPage(Seq(120000L, 180000L), None), // overlap
        s"$pB/0" -> HttpStub.barPage(Seq(60000L), None))
      def run(): Unit = {
        val q = graft.app.LiveIngest.startHttp(spark, stub.base,
          tickers = Seq("HA", "HB"), warehouse = wh)
        q.awaitTermination()
      }
      run()
      def silver() = spark.read.parquet(s"$wh/silver/bars_live")
        .select("ticker", "t").as[(String, Long)].collect().sorted.toSeq
      assert(silver() == Seq(("HA", 60000L), ("HA", 120000L), ("HA", 180000L),
        ("HB", 60000L)), s"catch-up rows wrong: ${silver()}")
      // the chain grows between runs; the checkpointed page offsets must
      // resume past the drained pages (boundary overlap dropped again)
      stub.pages += s"$pA/2" -> HttpStub.barPage(Seq(180000L, 240000L), None)
      run()
      assert(silver() == Seq(("HA", 60000L), ("HA", 120000L), ("HA", 180000L),
        ("HA", 240000L), ("HB", 60000L)),
        s"restart must append only the new page's new rows: ${silver()}")
      // resumed run must not refetch drained data pages (offset 0/1 done;
      // run 2 probes the frontier from page 2 onward only)
      assert(stub.hitCount(s"$pA/0") <= 3,
        s"drained page refetched on resume: ${stub.hitCount(s"$pA/0")} hits")
    } finally { stub.stop() }
  }

  test("text-pipeline projections run unchanged on a document stream") {
    // the LLM-pipeline scoring ops are stateless projections, so the SAME
    // builder incrementalizes: score a streaming corpus and compare to the
    // batch query row-for-row — the declarative-parity claim for ingest-time
    // quality filtering
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, TestSpark.Sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val input = MemoryStream[(Long, String)]
    val streamDocs = input.toDF().toDF("doc_id", "text")
    val q = graft.operators.TextOps.qualityProjection(streamDocs)
      .writeStream.outputMode("append").format("memory")
      .queryName("txt_stream_out").start()
    val (a, b) = docs.splitAt(docs.size / 2)
    input.addData(a); q.processAllAvailable()
    input.addData(b); q.processAllAvailable()
    q.stop()
    val streamed = spark.table("txt_stream_out")
    val batch = graft.operators.TextOps.qualityProjection(
      Tables.documents(spark, TestSpark.Sf0001).select("doc_id", "text"))
    assert(streamed.count() == 500)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streaming quality scores diverged from batch")
  }

  test("promote: streaming landing → batch table; replays no-op; compaction gate covers it") {
    val pages = java.nio.file.Files.createTempDirectory("promote-pages")
    val wh = java.nio.file.Files.createTempDirectory("promote-wh").toString
    val dir = pages.resolve("PRM/adjusted")
    java.nio.file.Files.createDirectories(dir)
    def page(ts: Seq[Long], next: Option[String]): String = {
      val bars = ts.map(t =>
        s"""{"t":$t,"o":1.0,"h":2.0,"l":0.5,"c":1.5,"v":100.0,"vw":1.2,"n":3}""")
        .mkString("[", ",", "]")
      s"""{"status":"OK","results":$bars,"next_url":${next.map("\"" + _ + "\"").getOrElse("null")}}"""
    }
    java.nio.file.Files.writeString(dir.resolve("page-0000.json"),
      page(Seq(60000L), None))
    def ingest(): Unit = { // AvailableNow = one catch-up run over new pages
      val q = graft.app.LiveIngest.start(spark, pages.toString, wh)
      q.awaitTermination(); ()
    }
    ingest()
    val landing = s"$wh/silver/bars_live"
    val batch = s"$wh/silver/bars"
    val keys = Seq("ticker", "timespan", "multiplier", "t", "adjusted")

    val p1 = graft.core.Sinks.promote(spark, landing, batch, keys, Seq("ticker"))
    assert(p1.nonEmpty, "first promotion must move the landed window")
    assert(spark.read.parquet(batch).count() == 1)
    // unchanged landing: the ledger short-circuits (None), data stable
    assert(graft.core.Sinks.promote(spark, landing, batch, keys, Seq("ticker")).isEmpty)
    assert(spark.read.parquet(batch).count() == 1)

    // the cursor chain grows (boundary overlap at 60000), a second catch-up
    // run lands a new sink micro-batch, and promotion moves only the delta
    java.nio.file.Files.writeString(dir.resolve("page-0000.json"),
      page(Seq(60000L), Some("page-0001.json")))
    java.nio.file.Files.writeString(dir.resolve("page-0001.json"),
      page(Seq(60000L, 120000L, 180000L), None))
    ingest()
    val p2 = graft.core.Sinks.promote(spark, landing, batch, keys, Seq("ticker"))
    assert(p2.nonEmpty && p2.get > p1.get,
      s"second promotion must advance the ledger: $p1 -> $p2")
    assert(spark.read.parquet(batch).select("t").as[Long].collect().sorted.toSeq
      == Seq(60000L, 120000L, 180000L), "exactly-once rows after two promotions")

    // the promoted table is a BATCH table: the shared fragmentation gate
    // may compact it (the landing itself must never be compacted — its
    // manifest pins the file set)
    val compacted = graft.core.Sinks.compactIfFragmented(
      spark, batch, targetFiles = 1, Seq("ticker"), factor = 1)
    assert(compacted.exists { case (before, after) => after < before },
      s"two promotions should fragment past 1 file and compact down: $compacted")
    assert(spark.read.parquet(batch).count() == 3, "compaction must not change rows")
    // the ledger survives the compaction swap: a replay is still a no-op
    assert(graft.core.Sinks.promote(spark, landing, batch, keys, Seq("ticker")).isEmpty)
    assert(spark.read.parquet(batch).count() == 3)

    // retention: with the batch table the system of record, the promoted
    // window's landing files are dead weight — expire them; the stream
    // and future promotions are unaffected (promote reads only the
    // manifest window above its ledger)
    val (win, del) = graft.core.Sinks.expirePromotedLanding(spark, landing, batch)
    assert(win > 0 && del == win,
      s"expected the full promoted window deleted, got $del of $win")
    assert(graft.core.Sinks.expirePromotedLanding(spark, landing, batch)
      == ((win, 0)), "replayed expiry must be a metadata no-op")
    // the landing keeps working as a SINK after expiry: the chain grows,
    // a catch-up run lands the delta, and promotion moves exactly it
    java.nio.file.Files.writeString(dir.resolve("page-0001.json"),
      page(Seq(60000L, 120000L, 180000L), Some("page-0002.json")))
    java.nio.file.Files.writeString(dir.resolve("page-0002.json"),
      page(Seq(180000L, 240000L), None))
    ingest()
    val p3 = graft.core.Sinks.promote(spark, landing, batch, keys, Seq("ticker"))
    assert(p3.nonEmpty && p3.get > p2.get,
      s"post-expiry promotion must advance the ledger: $p2 -> $p3")
    assert(spark.read.parquet(batch).select("t").as[Long].collect().sorted.toSeq
      == Seq(60000L, 120000L, 180000L, 240000L),
      "post-expiry promotion must land exactly the new delta")
  }

  test("streamed corpus landing promotes into the warehouse; pairs match the all-batch run") {
    val base =
      "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire in winter"
    val unrelated =
      "spark executes distributed dataframe plans with catalyst optimizing every stage of the physical query pipeline today"
    val drop1 = Seq((10L, base), (20L, unrelated))
    val drop2 = Seq((30L, base.replace("winter", "summer")), (40L, unrelated))

    // all-batch reference warehouse
    val whBatch = java.nio.file.Files.createTempDirectory("corp-batch").toString
    graft.app.CorpusIngest.run(spark, drop1.toDF("doc_id", "text"), whBatch)
    graft.app.CorpusIngest.run(spark, drop2.toDF("doc_id", "text"), whBatch)

    // streamed: drop files → parquet-sink landing → promote → batch ingest
    val root = java.nio.file.Files.createTempDirectory("corp-stream").toString
    val dropDir = s"$root/drops"
    val landing = s"$root/landing"
    val wh = s"$root/wh"
    def land(rows: Seq[(Long, String)]): Unit = {
      rows.toDF("doc_id", "text").repartition(1)
        .write.mode("append").parquet(dropDir)
      val q = graft.app.CorpusIngest.startLanding(spark, dropDir, landing)
      q.awaitTermination()
    }
    land(drop1)
    val (n1, p1) = graft.app.CorpusIngest.promoteAndIngest(spark, landing, wh)
    assert((n1, p1) == (2L, 0L), s"first promotion landed ($n1, $p1)")
    // unchanged landing: ledger short-circuit, nothing re-enters dedup
    assert(graft.app.CorpusIngest.promoteAndIngest(spark, landing, wh) == (0L, 0L))
    land(drop2)
    val (n2, _) = graft.app.CorpusIngest.promoteAndIngest(spark, landing, wh)
    assert(n2 == 2L, s"second promotion landed $n2")
    // a replayed maintenance call after everything is promoted is a no-op
    assert(graft.app.CorpusIngest.promoteAndIngest(spark, landing, wh) == (0L, 0L))

    // the streamed warehouse is bit-identical to the all-batch one where it
    // matters: the cumulative pair table and the surviving corpus view
    def pairs(w: String) = spark.read.parquet(s"$w/corpus/pairs")
      .select("doc_a", "doc_b", "jac").collect().toSet
    assert(pairs(wh) == pairs(whBatch),
      s"streamed pairs ${pairs(wh)} != batch pairs ${pairs(whBatch)}")
    def docs(w: String) = graft.app.CorpusIngest.survivors(spark, w)
      .select("doc_id").as[Long].collect().toSet
    assert(docs(wh) == docs(whBatch), "survivor sets must match")

    // governance across the stream path: a takedown must purge the staged
    // full-text mirror AND survive later promotions — the landing still
    // holds doc 30, so without the tombstone the next promote would quietly
    // re-stage and re-ingest it
    graft.app.CorpusIngest.delete(spark, wh, Seq(30L))
    assert(spark.read.parquet(s"$wh/corpus/staged_drops")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 30L).count() == 0,
      "staged mirror must be purged by the cascade")
    land(Seq((50L, "a brand new sentence about alpine lakes and late summer light")))
    graft.app.CorpusIngest.promoteAndIngest(spark, landing, wh)
    val after = spark.read.parquet(s"$wh/corpus/documents")
      .select("doc_id").as[Long].collect().toSet
    assert(!after.contains(30L), "takedown must survive later promotions")
    assert(after.contains(50L), "new streamed docs still land after a takedown")
  }

  test("streamed embedding landing promotes into the warehouse; pairs match the all-batch run") {
    def vec(major: Int, eps: Float = 0f): Array[Float] = {
      val a = Array.fill(64)(0f); a(major) = 1f; a((major + 1) % 64) = eps; a
    }
    val drop1 = Seq((1L, vec(0)), (2L, vec(30)))
    val drop2 = Seq((3L, vec(0, 0.01f)), (2L, vec(30))) // near-dup + replay

    val whBatch = java.nio.file.Files.createTempDirectory("emb-batch").toString
    graft.app.CorpusIngest.ingestEmbeddings(spark,
      drop1.toDF("vec_id", "embedding"), whBatch)
    graft.app.CorpusIngest.ingestEmbeddings(spark,
      drop2.toDF("vec_id", "embedding"), whBatch)

    val root = java.nio.file.Files.createTempDirectory("emb-stream").toString
    val dropDir = s"$root/drops"
    val landing = s"$root/landing"
    val wh = s"$root/wh"
    def land(rows: Seq[(Long, Array[Float])]): Unit = {
      rows.toDF("vec_id", "embedding").repartition(1)
        .write.mode("append").parquet(dropDir)
      graft.app.CorpusIngest.startEmbeddingLanding(spark, dropDir, landing)
        .awaitTermination()
    }
    land(drop1)
    val (n1, p1) = graft.app.CorpusIngest.promoteAndIngestEmbeddings(
      spark, landing, wh)
    assert((n1, p1) == (2L, 0L), s"first promotion: ($n1, $p1)")
    assert(graft.app.CorpusIngest.promoteAndIngestEmbeddings(
      spark, landing, wh) == (0L, 0L), "unchanged landing must short-circuit")
    land(drop2)
    val (n2, p2) = graft.app.CorpusIngest.promoteAndIngestEmbeddings(
      spark, landing, wh)
    assert((n2, p2) == (1L, 1L), s"second promotion: ($n2, $p2)")

    def pairs(w: String) = spark.read.parquet(s"$w/corpus/emb_pairs")
      .select("vec_a", "vec_b", "cos").collect().toSet
    assert(pairs(wh) == pairs(whBatch),
      s"streamed emb pairs ${pairs(wh)} != batch ${pairs(whBatch)}")
    def survivors(w: String) = graft.app.CorpusIngest.embSurvivors(spark, w)
      .select("vec_id").as[Long].collect().toSet
    assert(survivors(wh) == survivors(whBatch), "emb survivor sets must match")

    // governance through the stream path: the cascade purges the staged
    // mirror and tombstones the id, so later promotions cannot resurrect
    graft.app.CorpusIngest.deleteEmbeddings(spark, wh, Seq(1L))
    assert(spark.read.parquet(s"$wh/corpus/emb_tombstones")
      .as[Long].collect().toSeq == Seq(1L))
    land(Seq((9L, vec(40))))
    graft.app.CorpusIngest.promoteAndIngestEmbeddings(spark, landing, wh)
    val after = graft.core.Sinks.readBucketedPath(spark, s"$wh/corpus/emb_vecs")
      .select("vec_id").as[Long].collect().toSet
    assert(!after.contains(1L), "takedown must survive later promotions")
    assert(after.contains(9L), "new streamed vectors still land after a takedown")
    graft.core.GraftCaches.releaseAll(spark)
  }

  test("streamed media landing promotes into the warehouse; pairs match the all-batch run") {
    def imgs(ids: Seq[Long]) =
      graft.operators.Multimodal.syntheticImageCorpus(ids.toDF("doc_id"))
    val whBatch = java.nio.file.Files.createTempDirectory("media-batch").toString
    graft.app.CorpusIngest.ingestMedia(spark, imgs(Seq(0L, 1L, 2L)), whBatch)
    graft.app.CorpusIngest.ingestMedia(spark, imgs(Seq(10L, 11L)), whBatch)

    val root = java.nio.file.Files.createTempDirectory("media-stream").toString
    val dropDir = s"$root/drops"
    val landing = s"$root/landing"
    val wh = s"$root/wh"
    def land(ids: Seq[Long]): Unit = {
      imgs(ids).repartition(1).write.mode("append").parquet(dropDir)
      graft.app.CorpusIngest.startMediaLanding(spark, dropDir, landing)
        .awaitTermination()
    }
    land(Seq(0L, 1L, 2L))
    val (n1, p1) = graft.app.CorpusIngest.promoteAndIngestMedia(
      spark, landing, wh)
    assert((n1, p1) == (3L, 1L), s"first promotion: ($n1, $p1)")
    land(Seq(10L, 11L))
    val (n2, p2) = graft.app.CorpusIngest.promoteAndIngestMedia(
      spark, landing, wh)
    assert((n2, p2) == (2L, 1L), s"second promotion: ($n2, $p2)")

    def pairs(w: String) = spark.read.parquet(s"$w/corpus/media_pairs")
      .select("media_a", "media_b", "hamming").collect().toSet
    assert(pairs(wh) == pairs(whBatch),
      s"streamed media pairs ${pairs(wh)} != batch ${pairs(whBatch)}")
    def survivors(w: String) = graft.app.CorpusIngest.mediaSurvivors(spark, w)
      .select("media_id").as[Long].collect().toSet
    assert(survivors(wh) == survivors(whBatch),
      "media survivor sets must match")
    graft.core.GraftCaches.releaseAll(spark)
  }

  test("pinned artifacts cut from a streamed warehouse are bit-identical to the batch ones") {
    // The store-layer equalities above (pairs, survivor sets — per
    // modality) transitively imply that a snapshot or export cut from a
    // streamed warehouse equals the batch one. Transitively-implied is
    // not asserted: this case pins BOTH warehouses and compares the
    // training-facing artifacts themselves — snapshot membership AND the
    // export's (shard, pos) placement — through all three modality paths
    // that feed the curated view (text survivors; embedding and media
    // losers restricting it via links).
    import graft.app.CorpusIngest
    import graft.core.Sinks
    val base =
      "the quick brown fox jumps over the lazy dog while the cat sleeps near the warm fire in winter"
    val unrelated =
      "spark executes distributed dataframe plans with catalyst optimizing every stage of the physical query pipeline today"
    val textDrop1 = Seq((10L, base), (20L, unrelated))
    val textDrop2 = Seq((30L, base.replace("winter", "summer")),
      (40L, "a completely different document about alpine lakes and autumn light fading over quiet water"))
    def vec(major: Int, eps: Float = 0f): Array[Float] = {
      val a = Array.fill(64)(0f); a(major) = 1f; a((major + 1) % 64) = eps; a
    }
    // vec 4 is a near-dup of vec 3 → loser 4 (keep-the-minimum)
    val embDrop = Seq((3L, vec(0)), (4L, vec(0, 0.01f)), (5L, vec(30)))
    // media 0 and 1 share a render seed → near-dups; loser = media 1
    def imgs(ids: Seq[Long]) =
      graft.operators.Multimodal.syntheticImageCorpus(ids.toDF("doc_id"))
    val mediaIds = Seq(0L, 1L, 2L)
    // linkage: doc 40's content is vec 4 (an embedding loser), doc 20's
    // is media 1 (a media loser) — both must drop OUT of the curated view
    def links() = Seq(
      (100L, "doc", 40L), (100L, "vec", 4L),
      (200L, "doc", 20L), (200L, "media", 1L)
    ).toDF("content_key", "modality", "id")

    val whBatch = java.nio.file.Files.createTempDirectory("pin-batch").toString
    CorpusIngest.run(spark, textDrop1.toDF("doc_id", "text"), whBatch)
    CorpusIngest.run(spark, textDrop2.toDF("doc_id", "text"), whBatch)
    CorpusIngest.ingestEmbeddings(spark,
      embDrop.toDF("vec_id", "embedding"), whBatch)
    CorpusIngest.ingestMedia(spark, imgs(mediaIds), whBatch)
    CorpusIngest.registerLinks(spark, whBatch, links())

    // the streamed twin: every modality flows drop-dir → landing stream →
    // promote, the always-on production shape
    val root = java.nio.file.Files.createTempDirectory("pin-stream").toString
    val wh = s"$root/wh"
    def landText(rows: Seq[(Long, String)]): Unit = {
      rows.toDF("doc_id", "text").repartition(1)
        .write.mode("append").parquet(s"$root/tdrops")
      CorpusIngest.startLanding(spark, s"$root/tdrops", s"$root/tland")
        .awaitTermination()
      CorpusIngest.promoteAndIngest(spark, s"$root/tland", wh)
    }
    landText(textDrop1)
    landText(textDrop2)
    embDrop.toDF("vec_id", "embedding").repartition(1)
      .write.mode("append").parquet(s"$root/edrops")
    CorpusIngest.startEmbeddingLanding(spark, s"$root/edrops", s"$root/eland")
      .awaitTermination()
    CorpusIngest.promoteAndIngestEmbeddings(spark, s"$root/eland", wh)
    imgs(mediaIds).repartition(1).write.mode("append").parquet(s"$root/mdrops")
    CorpusIngest.startMediaLanding(spark, s"$root/mdrops", s"$root/mland")
      .awaitTermination()
    CorpusIngest.promoteAndIngestMedia(spark, s"$root/mland", wh)
    CorpusIngest.registerLinks(spark, wh, links())

    // the curated view is non-vacuous and identical: text loser 30,
    // linked-vec loser 40, linked-media loser 20 all excluded
    def curated(w: String) = CorpusIngest.curatedSurvivors(spark, w)
      .select("doc_id").as[Long].collect().toSet
    assert(curated(whBatch) == Set(10L), s"batch curated ${curated(whBatch)}")
    assert(curated(wh) == curated(whBatch), "curated views must match")

    // pin + export both at the same explicit stamps
    val ts = 1000L
    assert(CorpusIngest.snapshotCorpus(spark, whBatch, atMs = Some(ts)) == ts)
    assert(CorpusIngest.snapshotCorpus(spark, wh, atMs = Some(ts)) == ts)
    val ex = 2000L
    assert(CorpusIngest.exportCorpus(spark, whBatch, asOfMs = ts,
      numShards = 4, atMs = Some(ex)) == ex)
    assert(CorpusIngest.exportCorpus(spark, wh, asOfMs = ts,
      numShards = 4, atMs = Some(ex)) == ex)

    // the raw pinned MANIFESTS are bit-identical — membership and the
    // trainer's global (shard, pos) placement, not just the views over
    // them
    def snapManifest(w: String) = Sinks.readBucketedPath(spark,
      s"$w/corpus/snapshots/snap_ts=$ts").as[Long].collect().toSet
    assert(snapManifest(wh) == snapManifest(whBatch),
      s"snapshot manifests: ${snapManifest(wh)} vs ${snapManifest(whBatch)}")
    def placement(w: String) = Sinks.readBucketedPath(spark,
      s"$w/corpus/exports/export_ts=$ex")
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(placement(wh) == placement(whBatch),
      s"export placements: ${placement(wh)} vs ${placement(whBatch)}")
    // and the read paths over them agree too
    assert(CorpusIngest.curatedAsOf(spark, wh, ts)
      .select("doc_id").as[Long].collect().toSet ==
      CorpusIngest.curatedAsOf(spark, whBatch, ts)
        .select("doc_id").as[Long].collect().toSet)
    assert(CorpusIngest.readExport(spark, wh, ex)
      .select("doc_id", "shard", "pos")
      .as[(Long, Long, Long)].collect().toSet ==
      CorpusIngest.readExport(spark, whBatch, ex)
        .select("doc_id", "shard", "pos")
        .as[(Long, Long, Long)].collect().toSet)
    graft.core.GraftCaches.releaseAll(spark)
  }

  test("dropDuplicatesWithinWatermark removes replayed duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val stream = input.toDF().toDF("ticker", "ts", "price")
    val q = LiveBars.dedupStream(stream, "ts", "1 hour", Seq("ticker", "ts"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    val r1 = ("AAPL", ts("2024-01-01 10:00:00"), 100.0)
    val r2 = ("AAPL", ts("2024-01-01 10:05:00"), 101.0)
    input.addData(r1, r2); q.processAllAvailable()
    input.addData(r1); q.processAllAvailable() // at-least-once replay
    input.addData(("MSFT", ts("2024-01-01 12:00:00"), 55.0)); q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").filter(col("ticker") === "AAPL")
    assert(out.count() == 2, s"duplicate leaked: ${out.collect().mkString(",")}")
  }
}
