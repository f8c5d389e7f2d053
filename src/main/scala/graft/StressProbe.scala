package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: synthesizes a large event tape in-memory (spark.range — no
  * fixture I/O bias) and measures core-operator throughput, to verify the
  * plans behave linearly well past the sf0.1 fixtures. Not part of the
  * bench contract; run manually:
  *
  *   SPARK_GRAFT_STRESS_ROWS=20000000 sbt "runMain graft.StressProbe"
  *
  * Prints one JSON line of rows/sec per operator.
  */
object StressProbe {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_STRESS_ROWS", "20000000").toLong
    val keys = sys.env.getOrElse("SPARK_GRAFT_STRESS_KEYS", "1000").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stress")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // synthetic tape: ~1 tick/second per key, deterministic pseudo-random
    // prices; one hot key holding ~10% of rows (skew realism)
    val tape = spark.range(0, rows, 1, 64)
      .withColumn("user_id",
        when(pmod(col("id"), lit(10)) === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(keys.toLong))))
      .withColumn("ts", timestamp_millis(
        lit(1700000000000L) + (col("id") / keys).cast("long") * 1000))
      .withColumn("value",
        (pmod(xxhash64(col("id"), lit(1)), lit(10000L)) / 100.0 + 1.0))
      .drop("id")

    def time(tag: String)(df: org.apache.spark.sql.DataFrame): (String, Double) = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stress] $tag: $sec%.1f s (${rows / sec / 1e6}%.1f M rows/s)")
      tag -> sec
    }

    val results = Seq(
      time("scan_project")(tape.select(col("user_id"), col("value") * 2)),
      time("ohlc_resample_5m")(operators.MarketOps.resampleBars(tape, "5 minutes")),
      time("grouped_agg")(tape.groupBy(col("user_id"))
        .agg(sum(col("value")), avg(col("value")), max(col("ts")))),
      time("salted_agg_skewed")(operators.Salting.saltedSum(
        tape, Seq("user_id"), "value", buckets = 32)),
      time("window_latest_per_key")(tape.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts").desc)))
        .filter(col("rn") === 1)),
      time("keyed_dedup")(tape.dropDuplicates("user_id", "ts")),
      time("topk")(tape.orderBy(col("value").desc).limit(100))
    )
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    }.mkString("{", ",", "}")
    println(s"""{"stress_rows":$rows,"keys":$keys,"seconds":$qs}""")
    spark.stop()
  }
}
