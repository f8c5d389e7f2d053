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
}
