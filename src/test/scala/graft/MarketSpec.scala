package graft

import graft.operators.{AsOf, MarketOps}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MarketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks latest right at-or-before left time, per key") {
    val bars = Seq(
      ("A", ts("2024-01-01 10:00:00"), 1L),
      ("A", ts("2024-01-01 12:00:00"), 2L),
      ("A", ts("2024-01-01 14:00:00"), 3L),
      ("B", ts("2024-01-01 12:00:00"), 4L)
    ).toDF("ticker", "t", "bar_id")
    val factors = Seq(
      ("A", ts("2024-01-01 09:00:00"), 1.0),
      ("A", ts("2024-01-01 12:00:00"), 2.0), // equal ts: inclusive match
      ("A", ts("2024-01-01 13:00:00"), 3.0)
    ).toDF("ticker", "ft", "factor")
    val out = AsOf.asofJoin(bars, factors, Seq("ticker"), "t", "ft", Seq("factor"))
      .select("bar_id", "factor").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(1.0))
    assert(out(2L).contains(2.0), "as-of must be inclusive at equal timestamps")
    assert(out(3L).contains(3.0))
    assert(out(4L).isEmpty, "key with no factors must stay null (left join)")
  }

  test("emaExact matches the recursive definition") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, 10.0),
      (2L, ts("2024-01-01 11:00:00"), 7L, 20.0),
      (3L, ts("2024-01-01 12:00:00"), 7L, 30.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val out = MarketOps.emaExact(spark, ev, alpha = 0.5)
      .select("event_id", "ema").as[(Long, Double)].collect().toMap
    assert(out(1L) == 10.0)
    assert(out(2L) == 15.0)        // 0.5*20 + 0.5*10
    assert(out(3L) == 22.5)        // 0.5*30 + 0.5*15
  }

  test("resample associativity: 1h bars from 5m bars == 1h bars direct") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val viaLadder = MarketOps.defs.find(_.name == "mkt_resample_1h").get
      .build(spark, TestSpark.Sf0001)
      .select("user_id", "bucket", "o", "h", "l", "c", "n")
    val direct = ev.groupBy(col("user_id"), window(col("ts"), "1 hour"))
      .agg(min_by(col("value"), col("ts")).as("o"), max(col("value")).as("h"),
        min(col("value")).as("l"), max_by(col("value"), col("ts")).as("c"),
        count(lit(1)).as("n"))
      .select(col("user_id"), col("window.start").as("bucket"),
        col("o"), col("h"), col("l"), col("c"), col("n"))
    assert(viaLadder.exceptAll(direct).isEmpty && direct.exceptAll(viaLadder).isEmpty,
      "5m→1h ladder must equal direct 1h aggregation")
  }

  test("incremental append emits only rows past the watermark and not already stored") {
    val out = MarketOps.defs.find(_.name == "mkt_incremental_append").get
      .build(spark, TestSpark.Sf0001)
    val existingMax = Tables.events(spark, TestSpark.Sf0001)
      .filter(col("ts") < lit("2024-01-20 00:00:00").cast("timestamp"))
      .agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val rows = out.select("ts").as[java.sql.Timestamp].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.after(existingMax)), "row at-or-before watermark leaked")
    // idempotence: applying the protocol to (existing ∪ appended) yields nothing new
    val appendedIds = out.select("event_id").as[Long].collect().toSet
    val all = Tables.events(spark, TestSpark.Sf0001)
    val storedNow = all.filter(col("ts") < lit("2024-01-20 00:00:00").cast("timestamp")
      || col("event_id").isInCollection(appendedIds))
    val wm2 = storedNow.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val again = all.filter(col("ts") >= lit("2024-01-19 00:00:00").cast("timestamp"))
      .filter(col("ts") > lit(wm2))
      .join(storedNow.select("event_id"), Seq("event_id"), "left_anti")
    assert(again.isEmpty, "incremental append is not idempotent")
  }

  test("adjustment factor: strictly-later splits only, rounded log domain") {
    val out = MarketOps.defs.find(_.name == "mkt_adjust_cumfactor").get
      .build(spark, TestSpark.Sf0001)
    val ev = Tables.events(spark, TestSpark.Sf0001)
    // the chronologically last event of every user must have adjustment 0
    val lastIds = ev.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1).select("event_id").as[Long].collect().toSet
    val adj = out.select("event_id", "cum_log_adj").as[(Long, Double)].collect().toMap
    lastIds.foreach { id =>
      assert(adj(id) == 0.0, s"last event $id has nonzero adjustment ${adj(id)}")
    }
  }

  test("backtest: no lookahead — truncating the future never changes past positions") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val cut = ev.agg(expr("percentile(event_id, 0.8)")).head().getDouble(0).toLong
    val full = MarketOps.backtestSmaCross(ev, fast = 5, slow = 20)
      .select("event_id", "pos", "pnl_cents").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val truncated = MarketOps
      .backtestSmaCross(ev.filter(col("event_id") <= cut), fast = 5, slow = 20)
      .select("event_id", "pos", "pnl_cents").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(truncated.nonEmpty && truncated.forall { case (id, v) => full(id) == v },
      "a position or pnl changed when future bars were removed — lookahead!")
  }

  test("backtest accounting: flat position earns nothing, drawdown tracks the peak") {
    val out = MarketOps
      .backtestSmaCross(Tables.events(spark, TestSpark.Sf0001), fast = 5, slow = 20)
      .select("user_id", "pos", "pnl_cents", "cum_pnl_cents", "drawdown_cents")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.forall(r => r._2 == 0L || r._2 == 1L), "position must be 0/1")
    assert(out.forall(r => r._2 != 0L || r._3 == 0L), "flat bars must earn 0")
    assert(out.forall(_._5 >= 0L), "drawdown below zero")
    // rows are ordered by event_id, so each user's last row carries the
    // final equity — it must equal the sum of that user's per-bar pnl
    val byUser = out.groupBy(_._1)
    assert(byUser.values.forall(rs => rs.map(_._3).sum == rs.last._4),
      "cumulative pnl must end at the sum of per-bar pnl")
  }

  test("backtest goes long and profits on a monotonic ramp") {
    val ramp = Seq.tabulate(60) { i =>
      (i.toLong, 1L, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"), 100.0 + i)
    }.toDF("event_id", "user_id", "ts", "value")
    val out = MarketOps.backtestSmaCross(ramp, fast = 5, slow = 20)
      .select("event_id", "pos", "cum_pnl_cents").as[(Long, Long, Long)].collect()
    // fast SMA of a rising series leads the slow one: long from bar 21 on
    assert(out.filter(_._1 >= 21).forall(_._2 == 1L), s"not long on a ramp")
    assert(out.last._3 > 0, "no profit riding a monotonic ramp")
  }

  test("rolling correlation flips sign when a pair decorrelates mid-series") {
    // tickers move in lockstep for 21 days, then mirror for 20: the
    // trailing-10 correlation reads +1 at the regime's end and -1 after
    // ten mirrored days — the time-varying signal the static screen hides
    val changes = Seq.tabulate(41)(i => if (i % 2 == 0) 1L else 3L)
    def px(flip: Boolean) = changes.zipWithIndex.scanLeft(10000L) {
      case (p, (c, i)) => p + (if (flip && i > 20) -c else c)
    }
    val tape = Seq("A" -> px(false), "B" -> px(true)).zipWithIndex.flatMap {
      case ((t, ps), ui) => ps.zipWithIndex.map { case (p, d) =>
        (d * 2L + ui, ui.toLong,
          java.sql.Timestamp.valueOf(f"2024-01-01 00:00:00")
            .toLocalDateTime.plusDays(d).atZone(java.time.ZoneId.of("UTC")),
          p / 100.0)
      }
    }.map { case (eid, uid, zdt, v) =>
      (eid, uid, java.sql.Timestamp.from(zdt.toInstant), v)
    }.toDF("event_id", "user_id", "ts", "value")
    val out = MarketOps.rollingCorrelation(tape, window = 10)
      .as[(Long, Long, java.sql.Timestamp, Double)].collect()
      .map(r => r._3.toLocalDateTime.getDayOfYear -> r._4).toMap
    assert(out(20) == 1.0, s"lockstep regime must read +1: ${out.get(20)}")
    assert(out(41) == -1.0, s"mirrored regime must read -1: ${out.get(41)}")
    // the static screen over the same tape hides the flip (|corr| < 1)
    val static = MarketOps.pairwiseCorrelation(tape, minOverlap = 20)
      .select("corr").as[Double].head()
    assert(math.abs(static) < 0.9, s"static corr should blur regimes: $static")
  }

  test("portfolio roll-up: forward-filled equity sums across keys, drawdown from the aggregate peak") {
    // key 1 trades days 1-3, key 2 stops after day 2 — day 3's portfolio
    // equity must carry key 2's LAST equity forward, not drop it to 0
    def bars(uid: Long, days: Seq[Int], px: Int => Double) =
      days.flatMap(dd => (0 until 30).map { i =>
        (uid * 1000L + dd * 100L + i, uid,
          java.sql.Timestamp.valueOf(f"2024-01-0$dd%d 10:${i}%02d:00"),
          px(dd * 30 + i))
      })
    val tape = (bars(1L, Seq(1, 2, 3), i => 100.0 + i) ++
      bars(2L, Seq(1, 2), i => 200.0 + 2 * i))
      .toDF("event_id", "user_id", "ts", "value")
    val port = MarketOps.backtestPortfolio(tape, fast = 5, slow = 20)
      .as[(java.sql.Timestamp, Long, Long)].collect()
    assert(port.length == 3, s"one row per grid day: ${port.toSeq}")
    // cross-check against the per-key frame: each day's portfolio equity
    // equals the sum over keys of the last cum_pnl at or before that day
    val frame = MarketOps.backtestSmaCross(tape, fast = 5, slow = 20)
      .select("event_id", "user_id", "cum_pnl_cents")
      .as[(Long, Long, Long)].collect()
    def dayOf(eid: Long) = (eid % 1000L) / 100L
    def lastAtOrBefore(uid: Long, d: Long): Long = {
      val rs = frame.filter(r => r._2 == uid && dayOf(r._1) <= d)
      if (rs.isEmpty) 0L else rs.maxBy(_._1)._3
    }
    port.zipWithIndex.foreach { case ((_, eq, dd), i) =>
      val d = i + 1L
      val expected = lastAtOrBefore(1L, d) + lastAtOrBefore(2L, d)
      assert(eq == expected, s"day $d equity $eq != $expected")
      assert(dd >= 0L, "drawdown below zero")
    }
    // the aggregate curve's drawdown is peak-relative
    val peaks = port.scanLeft(Long.MinValue) { case (p, (_, eq, _)) => math.max(p, eq) }.tail
    port.zip(peaks).foreach { case ((_, eq, dd), pk) =>
      assert(dd == pk - eq, s"drawdown $dd != peak $pk - equity $eq")
    }
  }

  test("ANN correlation screen recalls the exact watchlist screen's top pairs") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    // ground truth: the exact (O(k²)) watchlist tool's strongest pairs
    val exactTop = MarketOps.pairwiseCorrelation(ev, minOverlap = 10)
      .orderBy(col("corr").desc, col("user_a"), col("user_b")).limit(5)
      .select("user_a", "user_b").as[(Long, Long)].collect().toSet
    assert(exactTop.size == 5, s"fixture should have >=5 correlated pairs")
    // the screen: centered return vectors → hyperplane-LSH buckets → exact
    // cosine verify. Cosine sits slightly under Pearson when coverage
    // differs (0-filled absent days), so the screen runs at a looser
    // threshold than the corr cut it is recalled against.
    val vecs = MarketOps.returnVectors(ev)
    val dims = vecs.schema("embedding").metadata.getLong("graft.rv.dims").toInt
    assert(dims >= 2, s"day grid should be multi-day, got $dims")
    val screen = graft.operators.SimilarityOps
      .cosinePairsLsh(vecs, threshold = 0.25, dims = dims)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val hit = exactTop.count(screen.contains)
    assert(hit >= 4,
      s"screen recalled only $hit/5 top exact pairs: exact=$exactTop screen=$screen")
    graft.core.GraftCaches.releaseAll(spark)
  }

  test("risk stats summarize the portfolio curve exactly (streaks via islands)") {
    val ev = Tables.events(spark, TestSpark.Sf0001)
    val curve = MarketOps.backtestPortfolio(ev, fast = 5, slow = 20)
      .select("day", "equity_cents", "drawdown_cents")
      .as[(java.sql.Timestamp, Long, Long)].collect().sortBy(_._1.getTime)
    assert(curve.nonEmpty)
    val stats = MarketOps.riskStats(ev, fast = 5, slow = 20)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val (nDays, finalEq, peakEq, maxDd, nUw, longest) = stats
    assert(nDays == curve.length)
    assert(finalEq == curve.last._2)
    assert(peakEq == curve.map(_._2).max)
    assert(maxDd == curve.map(_._3).max)
    assert(nUw == curve.count(_._3 > 0L))
    // longest underwater streak by direct scan over the ordered curve
    val expectedLongest = curve.map(_._3 > 0L)
      .foldLeft((0L, 0L)) { case ((best, cur), uw) =>
        val c = if (uw) cur + 1 else 0L
        (math.max(best, c), c)
      }._1
    assert(longest == expectedLongest,
      s"streak $longest != scan $expectedLongest")
  }

  test("cusum: sustained drift alarms where no single step could; state restarts") {
    // key A: 10 steady +$5 steps (each delta 500 cents, under any spike
    // bar) — the cumulative drift crosses h = 3000 at the 8th step:
    // s+ after m steps = m*(500-100) = 400m > 3000 at m = 8
    val a = (0 to 10).map(i => (i.toLong, ts(f"2024-01-01 ${i}%02d:00:00"), 1L, 100.0 + 5 * i))
    // key B: flat — never alarms
    val b = (0 to 10).map(i => (100L + i, ts(f"2024-01-01 ${i}%02d:00:00"), 2L, 50.0))
    val df = (a ++ b).toDF("event_id", "ts", "user_id", "value")
    val out = MarketOps.cusum(spark, df, slackCents = 100L, thresholdCents = 3000L)
      .as[(Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> (r._3, r._4, r._5)).toMap

    assert(out(8L) == ((0L, 0L, 1)), s"drift alarm: ${out(8L)}")
    assert((1L to 7L).forall(e => out(e)._3 == 0), "no premature alarm")
    // restart: the recursion re-accumulates from zero after the alarm
    assert(out(9L) == ((400L, 0L, 0)) && out(10L) == ((800L, 0L, 0)),
      s"post-alarm restart drifted: ${out(9L)} ${out(10L)}")
    assert((100L to 110L).forall(e => out(e)._3 == 0), "flat key alarmed")
  }
}
