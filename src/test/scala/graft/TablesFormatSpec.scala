package graft

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDateTime

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Format-robustness lock for the events loader.
  *
  * The driver's fixture generator has shipped `events.ts` in two physical
  * parquet encodings across rounds: timestamp[ns] (readable by Spark 4 only
  * via `spark.sql.legacy.parquet.nanosAsLong`, surfacing as LongType) and
  * timestamp[us] (surfacing as TIMESTAMP or TIMESTAMP_NTZ). Round 10 lost 46
  * queries when the encoding flipped under a loader hard-coded to one of
  * them. This spec writes one tiny events file per encoding Spark can
  * produce and asserts `Tables.events` yields byte-identical micros and a
  * TimestampType column from each.
  */
class TablesFormatSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val baseMicros: Long = {
    // 2024-03-01T12:34:56.789012 UTC, expressed as micros since epoch.
    java.time.Instant.parse("2024-03-01T12:34:56.789012Z")
      .toEpochMilli * 1000L + 12L
  }
  private val rows = Seq(
    (1L, baseMicros, 10L, "click", 1.5, "{}"),
    (2L, baseMicros + 1500000L, 11L, "view", 2.5, "{}"),
    (3L, baseMicros + 3000000L, 12L, "click", 3.5, "{}"))

  private def eventsSchema(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def writeDir(): String = {
    val d = Files.createTempDirectory("graft-evfmt").toString
    new java.io.File(d).deleteOnExit()
    d
  }

  /** Write rows with ts encoded by `mk` under the given Spark type. */
  private def writeEvents(tsType: DataType, mk: Long => Any): String = {
    val dir = writeDir()
    val data = rows.map { case (id, us, uid, et, v, p) =>
      Row(id, mk(us), uid, et, v, p)
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), eventsSchema(tsType))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadMicros(dir: String): Seq[(Long, Long)] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType === TimestampType,
      s"loader must normalize to TimestampType, got ${df.schema("ts").dataType}")
    df.select(col("event_id"),
        org.apache.spark.sql.functions.unix_micros(col("ts")))
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
  }

  private val expected = rows.map { case (id, us, _, _, _, _) => (id, us) }

  test("legacy nanos-as-long encoding normalizes to micros TimestampType") {
    // Spark cannot write physical timestamp[ns]; with nanosAsLong=true that
    // fixture reads back as LongType nanos — which a plain long column
    // reproduces exactly at the schema level the loader branches on.
    val dir = writeEvents(LongType, us => us * 1000L)
    assert(loadMicros(dir) === expected)
  }

  test("timestamp[us] NTZ encoding (isAdjustedToUTC=false) loads as-is") {
    val dir = writeEvents(TimestampNTZType,
      us => LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
    assert(loadMicros(dir) === expected)
  }

  test("timestamp[us] UTC-adjusted encoding loads as-is") {
    val dir = writeEvents(TimestampType, us => {
      val t = new Timestamp(us / 1000L)
      t.setNanos((us % 1000000L).toInt * 1000)
      t
    })
    assert(loadMicros(dir) === expected)
  }

  test("all encodings agree with the live fixture loader on row shape") {
    val df = Tables.events(spark, TestSpark.Sf0001)
    assert(df.schema("ts").dataType === TimestampType)
    assert(df.count() > 0)
  }

  test("every fixture table loads with its expected logical schema") {
    // the round-10 lesson, widened to the whole fixture set: the driver can
    // regenerate /root/testdata with different PHYSICAL parquet encodings at
    // any time. The engine's contract is the LOGICAL schema after loading
    // through graft.Tables — names in order, and types up to the
    // timestamp/timestamp_ntz pair (both load fine everywhere the loaders
    // don't normalize; events is pinned to timestamp by Tables.events).
    // A regeneration that flips a logical type fails HERE with the column
    // named, instead of as 40 downstream AnalysisExceptions.
    val tsLike = Set("timestamp", "timestamp_ntz")
    val expected: Map[String, Seq[(String, Set[String])]] = Map(
      "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
      "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
        "n_regionkey" -> Set("int")),
      "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
        "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
        "c_mktsegment" -> Set("string")),
      "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
        "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
      "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
        "p_brand" -> Set("string"), "p_type" -> Set("string"),
        "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
      "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
        "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
        "o_orderdate" -> tsLike, "o_orderpriority" -> Set("string")),
      "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
        "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
        "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
        "l_discount" -> Set("double"), "l_tax" -> Set("double"),
        "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
        "l_shipdate" -> tsLike),
      "events" -> Seq("event_id" -> Set("bigint"), "ts" -> Set("timestamp"),
        "user_id" -> Set("bigint"), "event_type" -> Set("string"),
        "value" -> Set("double"), "props" -> Set("string")),
      "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
        "lang" -> Set("string"), "source" -> Set("string"),
        "n_chars" -> Set("bigint")),
      "embeddings" -> Seq("vec_id" -> Set("bigint"),
        "embedding" -> Set("array<float>"), "label" -> Set("int")))
    for (sf <- Seq(TestSpark.Sf0001, TestSpark.Sf001); name <- Tables.names) {
      val schema = Tables.table(spark, sf, name).schema
      val got = schema.map(f => f.name -> f.dataType.catalogString)
      val want = expected(name)
      assert(got.map(_._1) == want.map(_._1),
        s"$name@$sf column drift: got ${got.map(_._1)}, want ${want.map(_._1)}")
      got.zip(want).foreach { case ((col, typ), (_, allowed)) =>
        assert(allowed.contains(typ),
          s"$name.$col@$sf type drift: got $typ, allowed $allowed")
      }
    }
  }
}
