package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query at SPARK_GRAFT_SF_DIR, prints
  * one JSON line {"metric":...,"value":total_sec,"queries":{name:sec}}.
  *
  * One warmup iteration first (not reported): JVM/codegen/parquet-footer
  * warmup otherwise lands entirely on whichever query runs first and the
  * numbers measure classloading, not the engine.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Locale.ROOT formatting: f"" uses the default locale and would emit
    // comma decimals (invalid JSON) on comma-decimal JVMs.
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))

    def once(): (Seq[(String, Double)], Seq[String]) = {
      val failed = Seq.newBuilder[String]
      val times = SparkEntry.allDefs.map { q =>
        val t0 = System.nanoTime()
        try q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failed += q.name
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
        }
        q.name -> (System.nanoTime() - t0) / 1e9
      }
      (times, failed.result())
    }

    once() // warmup
    val (results, failed) = once()
    val qs = results.map { case (k, v) => "\"" + k + "\":" + num(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(json)
    // stdout is interleaved with sbt/log4j noise; also land the line in a
    // clean file so the driver can parse it without scraping logs
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
