package graft

import graft.streaming.StatefulIndicators
import graft.streaming.StatefulIndicators.{AtrOut, EmaOut, RsiOut, Tick}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StatefulSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Replay the sf0.001 events fixture through a streaming indicator in >=3
    * micro-batches (event-time order, so cross-batch state is exercised) and
    * return the streamed output keyed by (ticker, t).
    */
  private def replayFixture[O <: Product : org.apache.spark.sql.Encoder](
      name: String, build: org.apache.spark.sql.Dataset[Tick] =>
        org.apache.spark.sql.Dataset[O]): Map[(String, Long), O] = {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id").cast("string").as("ticker"),
        unix_millis(col("ts")).as("t"), col("value").as("price"))
      .as[Tick].collect().sortBy(_.t)
    val input = MemoryStream[Tick]
    val q = build(input.toDS()).writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    events.grouped(events.length / 3 + 1).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    q.stop()
    spark.table(name).as[O].collect()
      .map(r => (r.productElement(0).asInstanceOf[String],
        r.productElement(1).asInstanceOf[Long]) -> r).toMap
  }

  /** Batch indicator output re-keyed to (user_id as ticker, unix-millis t). */
  private def batchByKey(df: org.apache.spark.sql.DataFrame, valueCol: String)
      : Seq[(String, Long, Option[Double])] = {
    import org.apache.spark.sql.functions._
    df.join(Tables.events(spark, TestSpark.Sf0001)
        .select(col("event_id"), unix_millis(col("ts")).as("t")), "event_id")
      .select(col("user_id").cast("string"), col("t"), col(valueCol))
      .as[(String, Long, Option[Double])].collect().toSeq
  }

  private def assertParity(streamed: Map[(String, Long), Option[Double]],
                           batch: Seq[(String, Long, Option[Double])],
                           what: String): Unit = {
    assert(batch.nonEmpty)
    batch.foreach { case (k, t, b) =>
      val s = streamed.get((k, t))
      assert(s.nonEmpty, s"$what: stream missing row ($k, $t)")
      (s.get, b) match {
        case (None, None) => ()
        case (Some(sv), Some(bv)) =>
          assert(math.abs(sv - bv) < 1e-12, s"$what diverged at ($k, $t): stream=$sv batch=$bv")
        case other => fail(s"$what null-mismatch at ($k, $t): $other")
      }
    }
  }

  test("streaming EMA carries state across micro-batches and drops late rows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val out = StatefulIndicators.emaStream(spark, input.toDS(), alpha = 0.5)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ema_out").start()

    input.addData(Tick("A", 1, 10.0), Tick("A", 2, 20.0)) // batch 1
    q.processAllAvailable()
    input.addData(Tick("A", 3, 30.0),                      // batch 2: continues
                  Tick("A", 2, 99.0),                      // late → dropped
                  Tick("B", 1, 5.0))                       // new key
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ema_out").as[EmaOut].collect()
      .map(r => (r.ticker, r.t) -> r.ema).toMap
    assert(rows(("A", 1)) == 10.0)
    assert(rows(("A", 2)) == 15.0)                  // 0.5*20 + 0.5*10
    assert(rows(("A", 3)) == 22.5,                  // state crossed the batch
      "EMA state must persist across micro-batches")
    assert(!rows.contains(("A", 2L)) || rows(("A", 2)) == 15.0,
      "late replay must not overwrite")
    assert(rows(("B", 1)) == 5.0)
    assert(rows.size == 4, s"late row leaked: $rows")
  }

  test("streaming EMA on replayed fixture equals batch emaExact") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id").cast("string").as("ticker"),
        unix_millis(col("ts")).as("t"), col("value").as("price"))
      .as[Tick].collect().sortBy(_.t)

    val input = MemoryStream[Tick]
    val out = StatefulIndicators.emaStream(spark, input.toDS(), alpha = 0.2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ema_replay").start()
    events.grouped(events.length / 3 + 1).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("ema_replay").as[EmaOut].collect()
      .map(r => (r.ticker, r.t) -> r.ema).toMap
    val batch = graft.operators.MarketOps.emaExact(
        spark, Tables.events(spark, TestSpark.Sf0001), alpha = 0.2)
      .join(Tables.events(spark, TestSpark.Sf0001)
        .select(col("event_id"), unix_millis(col("ts")).as("t")), "event_id")
      .select(col("user_id").cast("string"), col("t"), col("ema"))
      .as[(String, Long, Double)].collect()
    assert(batch.nonEmpty)
    batch.foreach { case (k, t, ema) =>
      assert(streamed.get((k, t)).exists(s => math.abs(s - ema) < 1e-12),
        s"stream/batch EMA diverged at ($k, $t)")
    }
  }

  test("idle keys past the TTL are evicted; live keys and returning keys still work") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val out = StatefulIndicators.emaStream(spark, input.toDS(), alpha = 0.5,
      idleTtl = Some("1 milliseconds"))
    // with ProcessingTimeTimeout the engine keeps scheduling batches to
    // check timers (shouldRunAnotherBatch is always true), so
    // processAllAvailable never quiesces — poll the sink with a deadline
    // instead, on an interval trigger as a live deployment would use
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ema_ttl")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("25 milliseconds"))
      .start()
    def awaitRows(n: Long, what: String): Unit = {
      val deadline = System.currentTimeMillis() + 30000
      def count() = spark.table("ema_ttl").count()
      while (count() < n && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(count() == n, s"$what: expected $n output rows, got ${count()}")
    }

    input.addData(Tick("A", 1, 10.0), Tick("A", 2, 20.0))
    awaitRows(2, "first batch")
    Thread.sleep(100) // let A's processing-time TTL lapse
    input.addData(Tick("B", 1, 5.0)) // a later batch fires A's timeout
    awaitRows(3, "live key during eviction")
    // the eviction is observable in the state-store metrics: rows removed,
    // and the store back down to the live key only
    val evicted = {
      val deadline = System.currentTimeMillis() + 30000
      def removed() = q.recentProgress
        .flatMap(_.stateOperators.headOption).map(_.numRowsRemoved).sum
      while (removed() == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      removed()
    }
    assert(evicted >= 1, "timeout path never removed idle state")

    // A returns after eviction: the recursion RE-SEEDS (ema = price, and the
    // late-row guard reset with the state) — 22.5 here would mean the state
    // survived and eviction never happened
    input.addData(Tick("A", 3, 30.0))
    awaitRows(4, "returning key")
    q.stop()
    val rows = spark.table("ema_ttl").as[EmaOut].collect()
      .map(r => (r.ticker, r.t) -> r.ema).toMap
    assert(rows(("A", 2)) == 15.0, "pre-eviction recursion intact")
    assert(rows(("A", 3)) == 30.0,
      s"returning key must re-seed, got ${rows(("A", 3))}")
    assert(rows(("B", 1)) == 5.0, "live key unaffected by the eviction pass")
  }

  test("streaming Wilder RSI carries recursive state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val out = StatefulIndicators.rsiWilderStream(spark, input.toDS(), n = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("rsi_unit").start()
    input.addData(Tick("A", 1, 10.0), Tick("A", 2, 20.0)) // batch 1
    q.processAllAvailable()
    input.addData(Tick("A", 3, 15.0), Tick("A", 1, 99.0)) // batch 2 + late row
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("rsi_unit").as[RsiOut].collect()
      .map(r => r.t -> r.rsi).toMap
    assert(rows(1L).isEmpty, "no RSI before the first change")
    assert(rows(2L).contains(100.0), "all-gain seed must be RSI 100")
    // batch 2: change = -5 → g = (10*1 + 0)/2 = 5, l = (0*1 + 5)/2 = 2.5
    // rsi = 100 - 100/(1 + 2) = 66.666... — only correct if (g, l, prev)
    // survived the micro-batch boundary
    assert(rows(3L).exists(v => math.abs(v - 100.0 / 1.5) < 1e-12),
      s"state must cross micro-batches: ${rows(3L)}")
    assert(rows.size == 3, s"late row leaked: $rows")
  }

  test("streaming Wilder RSI on replayed fixture equals batch rsiWilder") {
    val streamed = replayFixture[RsiOut]("rsi_replay",
      ds => StatefulIndicators.rsiWilderStream(spark, ds, n = 14))
    val batch = batchByKey(graft.operators.MarketOps.rsiWilder(
      spark, Tables.events(spark, TestSpark.Sf0001), n = 14), "rsi_wilder")
    assertParity(streamed.map { case (k, v) => k -> v.rsi }, batch, "RSI")
  }

  test("streaming Wilder ATR on replayed fixture equals batch atrWilder") {
    val streamed = replayFixture[AtrOut]("atr_replay",
      ds => StatefulIndicators.atrWilderStream(spark, ds, n = 14))
    val batch = batchByKey(graft.operators.MarketOps.atrWilder(
      spark, Tables.events(spark, TestSpark.Sf0001), n = 14), "atr_wilder")
    assertParity(streamed.map { case (k, v) => k -> v.atr }, batch, "ATR")
  }

  test("streaming MACD on replayed fixture is BIT-identical to batch mkt_macd") {
    import org.apache.spark.sql.functions._
    val streamed = replayFixture[StatefulIndicators.MacdOut]("macd_replay",
      ds => StatefulIndicators.macdStream(spark, ds))
    val batch = SparkEntry.queries("mkt_macd")(spark, TestSpark.Sf0001)
      .join(Tables.events(spark, TestSpark.Sf0001)
        .select(col("event_id"), unix_millis(col("ts")).as("t")), "event_id")
      .select(col("user_id").cast("string"), col("t"), col("macd"))
      .as[(String, Long, Double)].collect()
    assert(batch.nonEmpty)
    batch.foreach { case (k, t, b) =>
      val s = streamed.get((k, t))
      assert(s.nonEmpty, s"stream missing row ($k, $t)")
      // identical recursion on identical operands: exact, not tolerance
      assert(s.get.macd == b, s"macd diverged at ($k, $t): ${s.get.macd} != $b")
    }
  }

  test("streaming backtest on replayed fixture equals the batch equity curve exactly") {
    import org.apache.spark.sql.functions._
    val streamed = replayFixture[StatefulIndicators.BtOut]("bt_replay",
      ds => StatefulIndicators.backtestStream(spark, ds, fast = 5, slow = 20))
    val batch = graft.operators.MarketOps
      .backtestSmaCross(Tables.events(spark, TestSpark.Sf0001), fast = 5, slow = 20)
      .join(Tables.events(spark, TestSpark.Sf0001)
        .select(col("event_id"), unix_millis(col("ts")).as("t")), "event_id")
      .select(col("user_id").cast("string"), col("t"), col("pos"),
        col("pnl_cents"), col("cum_pnl_cents"), col("drawdown_cents"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(batch.nonEmpty)
    batch.foreach { case (k, t, pos, pnl, cum, dd) =>
      val s = streamed.get((k, t))
      assert(s.nonEmpty, s"stream missing row ($k, $t)")
      // integers: EXACT equality — same cents arithmetic on both paths
      assert((s.get.pos, s.get.pnlCents, s.get.cumPnlCents, s.get.drawdownCents)
        == ((pos, pnl, cum, dd)),
        s"equity diverged at ($k, $t): stream=${s.get} batch=($pos,$pnl,$cum,$dd)")
    }
  }

  test("streaming spike detector flags exactly the batch query's rows") {
    import org.apache.spark.sql.functions._
    val streamed = replayFixture[StatefulIndicators.SpikeOut]("spike_replay",
      ds => StatefulIndicators.spikeStream(spark, ds,
        lookback = 20, minTrail = 10, mulNum = 3L, mulDen = 1L))
    val batch = graft.operators.EventOps
      .spikeDetect(Tables.events(spark, TestSpark.Sf0001),
        lookback = 20, minTrail = 10, mulNum = 3, mulDen = 1)
      .join(Tables.events(spark, TestSpark.Sf0001)
        .select(col("event_id"), unix_millis(col("ts")).as("t")), "event_id")
      .select(col("user_id").cast("string"), col("t"), col("p_cents"),
        col("trail_n"), col("trail_sum_cents"))
      .as[(String, Long, Long, Long, Long)].collect()
    assert(batch.nonEmpty, "fixture should contain spikes")
    // every batch-flagged row streams as a spike with identical baseline
    batch.foreach { case (k, t, p, n, sum) =>
      val s = streamed.get((k, t))
      assert(s.nonEmpty, s"stream missing row ($k, $t)")
      assert(s.get.spike && (s.get.pCents, s.get.trailN, s.get.trailSumCents)
        == ((p, n, sum)),
        s"spike diverged at ($k, $t): stream=${s.get} batch=($p,$n,$sum)")
    }
    // and the stream flags NOTHING the batch query didn't (exact set parity)
    val batchKeys = batch.map(r => (r._1, r._2)).toSet
    val extra = streamed.values.filter(_.spike)
      .map(o => (o.ticker, o.t)).filterNot(batchKeys)
    assert(extra.isEmpty, s"stream over-flagged: $extra")
  }

  test("streaming CUSUM on replayed fixture equals batch cusum exactly") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val events = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id").cast("string").as("ticker"),
        unix_millis(col("ts")).as("t"), col("value").as("price"))
      .as[Tick].collect().sortBy(_.t)

    val input = MemoryStream[Tick]
    val out = StatefulIndicators.cusumStream(spark, input.toDS(),
      slackCents = 1000L, thresholdCents = 15000L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cusum_replay").start()
    events.grouped(events.length / 3 + 1).foreach { chunk =>
      input.addData(chunk); q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("cusum_replay")
      .as[StatefulIndicators.CusumOut].collect()
      .map(r => (r.ticker, r.t) -> ((r.sPos, r.sNeg, r.alarm))).toMap
    val batch = graft.operators.MarketOps.cusum(spark,
        Tables.events(spark, TestSpark.Sf0001),
        slackCents = 1000L, thresholdCents = 15000L)
      .join(Tables.events(spark, TestSpark.Sf0001)
        .select(col("event_id"), unix_millis(col("ts")).as("t")), "event_id")
      .select(col("user_id").cast("string"), col("t"), col("s_pos"),
        col("s_neg"), col("alarm"))
      .as[(String, Long, Long, Long, Int)].collect()
    assert(batch.nonEmpty)
    assert(batch.exists(_._5 != 0), "fixture must trigger alarms")
    batch.foreach { case (k, t, sp, sn, a) =>
      assert(streamed.get((k, t)).contains((sp, sn, a)),
        s"stream/batch CUSUM diverged at ($k, $t): " +
          s"${streamed.get((k, t))} vs ($sp, $sn, $a)")
    }
  }

  test("stateful stream restarts from checkpoint under a DIFFERENT shuffle partition count") {
    // the classic production restart hazard: ops bumps
    // spark.sql.shuffle.partitions and restarts the job from its
    // checkpoint. Spark pins the STATE layout to the partition count
    // recorded in the offset log at first start (OffsetSeqMetadata), so the
    // stateful operator keeps its original state partitioning under the new
    // session conf — the contract this test locks is end-to-end: the
    // restarted query accepts the checkpoint (no guarded failure) and the
    // full streamed output stays exactly the batch indicator. A parquet
    // sink (manifest-committed, recovery-capable) stands in for silver —
    // the memory sink refuses checkpoint recovery in append mode.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val outDir = java.nio.file.Files.createTempDirectory("rescale-out")
      .toString + "/ema"
    val ckpt = outDir + "_checkpoint"
    val events = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id").cast("string").as("ticker"),
        unix_millis(col("ts")).as("t"), col("value").as("price"))
      .as[Tick].collect().sortBy(_.t)
    val input = MemoryStream[Tick]
    def start() = StatefulIndicators.emaStream(spark, input.toDS(), alpha = 0.2)
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt).start()

    val half = events.length / 2
    val q1 = start()
    input.addData(events.take(half)); q1.processAllAvailable(); q1.stop()
    val rowsPhase1 = spark.read.parquet(outDir).count()
    assert(rowsPhase1 > 0 && rowsPhase1 < events.length.toLong)

    val key = "spark.sql.shuffle.partitions"
    val old = spark.conf.get(key)
    spark.conf.set(key, (old.toInt * 2).toString)
    try {
      val q2 = start()
      input.addData(events.drop(half)); q2.processAllAvailable(); q2.stop()
    } finally spark.conf.set(key, old)

    val streamed = spark.read.parquet(outDir).as[EmaOut].collect()
      .map(r => (r.ticker, r.t) -> r.ema).toMap
    assert(streamed.size > rowsPhase1.toInt,
      "restarted query produced nothing — the rescale silently stalled")
    val batch = graft.operators.MarketOps.emaExact(
        spark, Tables.events(spark, TestSpark.Sf0001), alpha = 0.2)
      .join(Tables.events(spark, TestSpark.Sf0001)
        .select(col("event_id"), unix_millis(col("ts")).as("t")), "event_id")
      .select(col("user_id").cast("string"), col("t"), col("ema"))
      .as[(String, Long, Double)].collect()
    assert(batch.nonEmpty)
    batch.foreach { case (k, t, ema) =>
      assert(streamed.get((k, t)).exists(s => math.abs(s - ema) < 1e-12),
        s"stream/batch EMA diverged after rescale restart at ($k, $t)")
    }
    assert(streamed.size == batch.length,
      s"row-count drift after rescale: stream=${streamed.size} batch=${batch.length}")
  }

  test("silence alert fires from a timer during the void, once, with the last seen t") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Tick]
    val out = StatefulIndicators.silenceAlerts(spark, input.toDS(),
      silence = "1 milliseconds")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("silence")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("25 milliseconds"))
      .start()
    def alerts() = spark.table("silence")
      .as[StatefulIndicators.SilenceAlert].collect().toSeq
    def awaitAlerts(n: Int, what: String): Seq[StatefulIndicators.SilenceAlert] = {
      val deadline = System.currentTimeMillis() + 30000
      while (alerts().length < n && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(alerts().length >= n, s"$what: got ${alerts()}")
      alerts()
    }

    input.addData(Tick("A", 5, 10.0), Tick("A", 9, 11.0))
    // B keeps ticking while A goes silent; A's alert fires on a TIMER —
    // note no A row is ever added again
    val keepAlive = new Thread { override def run(): Unit =
      (1 to 200).foreach { i => input.addData(Tick("B", i, 1.0)); Thread.sleep(25) } }
    keepAlive.start()
    val got = awaitAlerts(1, "A's silence")
    assert(got.exists(a => a.ticker == "A" && a.lastT == 9L),
      s"alert must carry A's newest event time: $got")
    // single-shot: a still-dead key does not re-alert every interval
    Thread.sleep(500)
    assert(alerts().count(_.ticker == "A") == 1,
      s"dead key re-alerted: ${alerts()}")
    keepAlive.join()
    // B went silent only after its feeder stopped — it may alert now; A
    // stays at exactly one alert
    assert(alerts().count(_.ticker == "A") == 1)
    q.stop()
  }
}
