package graft

import java.nio.file.Files

import graft.core.{Schemas, Sinks}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** O-SNK3/O-SNK4 against embedded Derby, and O-SRC4 bronze raw-page landing
  * + explode into bar rows.
  */
class JdbcBronzeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("jdbc full-replace and audited append (embedded Derby)") {
    val url = s"jdbc:derby:${Files.createTempDirectory("derby")}/db;create=true"
    val day1 = Seq(("AAPL", "stocks"), ("MSFT", "stocks")).toDF("ticker", "market")
    val day2 = Seq(("AAPL", "stocks"), ("MSFT", "stocks"), ("GOOG", "stocks"))
      .toDF("ticker", "market")
    Sinks.writeJdbcReplace(day1, url, "tickers")
    Sinks.writeJdbcReplace(day2, url, "tickers")
    val cur = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "tickers").load()
    assert(cur.count() == 3, "replace must overwrite, not accumulate")

    val bars = Seq(("AAPL", 100L, 1.5)).toDF("ticker", "t", "c")
    Sinks.writeJdbcAppend(bars, url, "bars_aapl")
    Sinks.writeJdbcAppend(bars, url, "bars_aapl")
    val stored = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "bars_aapl").load()
    assert(stored.count() == 2, "append must accumulate")
    assert(stored.columns.map(_.toLowerCase).contains("insert_timestamp"),
      "audit column missing")
  }

  test("bronze landing: raw pages land whole, explode to bar rows (O-SRC4)") {
    val bronze = Files.createTempDirectory("bronze").toString
    val page =
      """{"ticker":"AAPL","queryCount":2,"resultsCount":2,"adjusted":true,
        |"results":[{"v":10.0,"vw":1.2,"o":1.0,"c":1.5,"h":2.0,"l":0.5,"t":60000,"n":3},
        |{"v":20.0,"vw":2.2,"o":1.5,"c":2.5,"h":3.0,"l":1.0,"t":120000,"n":4}],
        |"status":"OK","request_id":"r1","next_url":null}""".stripMargin.replace("\n", "")
    Files.writeString(java.nio.file.Paths.get(bronze, "page1.json"), page)
    // declared schema (no inference in the engine core — SURVEY.md §1.3)
    val pages = spark.read.schema(Schemas.rawPageSchema).json(bronze)
    assert(pages.count() == 1)
    val bars = pages
      .select(col("ticker"), col("adjusted"), explode(col("results")).as("r"))
      .select(col("ticker"), col("adjusted"), col("r.t").as("t"),
        col("r.o").as("o"), col("r.c").as("c"), col("r.v").as("v"))
      .withColumn("datetime", timestamp_millis(col("t")))
    val rows = bars.orderBy("t").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("t") == 60000L && rows(0).getAs[Double]("o") == 1.0)
    assert(rows(1).getAs[Double]("c") == 2.5)
    assert(rows(0).getAs[java.sql.Timestamp]("datetime").getTime == 60000L)
  }
}
