package graft

import graft.streaming.StatefulIndicators
import graft.streaming.StatefulIndicators.{EmaOut, Tick}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StatefulSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

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
}
