package graft

import graft.operators.Salting
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-technique tests: salted aggregation equivalence, bucketed
  * co-located joins (no shuffle), and SparkSessionExtensions installation.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedSum equals plain grouped sum on a skewed key distribution") {
    // hot key: 'HOT' holds 90% of rows
    val rows = (1 to 9000).map(i => ("HOT", i.toLong)) ++
      (1 to 1000).map(i => (s"k${i % 50}", i.toLong))
    val df = rows.toDF("key", "v").repartition(8)
    val plain = df.groupBy(col("key")).agg(sum(col("v")).as("sum_v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Salting.saltedSum(df, Seq("key"), "v", buckets = 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    assert(wh.contains("tmp") || !wh.contains("/root/repo"),
      s"warehouse must not pollute the repo: $wh")
    val ev = Tables.events(spark, TestSpark.Sf0001)
    ev.select("event_id", "user_id", "value").write
      .bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("bk_events")
    ev.select("user_id", "event_type").write
      .bucketBy(8, "user_id").sortBy("user_id")
      .mode("overwrite").saveAsTable("bk_types")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("bk_events").join(spark.table("bk_types"), "user_id")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(j.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("GraftExtensions installs nonce() at session build time") {
    spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val values = s2.sql("SELECT nonce(7) AS n FROM range(100)")
        .collect().map(_.getString(0))
      assert(values.forall(_.matches("[A-Z0-9]{5}")))
      assert(values.distinct.length > 90)
      // the full graft function surface resolves SQL-first, same
      // Expressions the operators self-register
      val row = s2.sql(
        """SELECT graft_dot(array(1D, 2D), array(3D, 4D)) AS dot,
          |  graft_minhash(array('a b c'), 4) AS mh,
          |  graft_simhash(array('a b c')) AS sh,
          |  graft_band_codes(array(1D, -1D),
          |    array(array(1D, 0D), array(0D, 1D)), 1) AS bc""".stripMargin).head()
      assert(row.getDouble(0) == 11.0)
      assert(row.getSeq[Long](1).size == 4)
      assert(row.getSeq[Long](3).size == 2)
    } finally {
      // shared-JVM context: don't stop() (it kills the SparkContext); the
      // extension registration is per-session state
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
