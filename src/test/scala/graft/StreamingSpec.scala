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
