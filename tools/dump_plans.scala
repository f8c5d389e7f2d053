// Dump .explain("formatted") for every declared query to an output dir.
// Usage: spark-shell --master local[32] --driver-class-path target/scala-2.13/classes \
//          -I tools/dump_plans.scala
// Env: GRAFT_PLANS_OUT (default plans/r20/work), GRAFT_PLANS_SUFFIX
//      (e.g. "_before"), GRAFT_PLANS_SF (default /root/testdata/sf0.1),
//      GRAFT_PLANS_ONLY (comma-separated names; unset = all).
{
  val outDir = sys.env.getOrElse("GRAFT_PLANS_OUT", "plans/r20/work")
  val suffix = sys.env.getOrElse("GRAFT_PLANS_SUFFIX", "_before")
  val sfDir = sys.env.getOrElse("GRAFT_PLANS_SF", "/root/testdata/sf0.1")
  val only = sys.env.get("GRAFT_PLANS_ONLY").map(_.split(",").toSet)
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
  spark.sparkContext.setLogLevel("WARN")
  val defs = only.fold(graft.SparkEntry.allDefs)(sel =>
    graft.SparkEntry.allDefs.filter(d => sel(d.name)))
  defs.foreach { q =>
    try {
      spark.sparkContext.setJobDescription(s"plan:${q.name}")
      val df = q.build(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${q.name}$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plans] wrote ${q.name}")
    } catch { case e: Throwable =>
      println(s"[plans] FAILED ${q.name}: ${e.getMessage}")
    } finally {
      graft.core.GraftCaches.releaseAll(spark)
      spark.catalog.clearCache()
    }
  }
  println("[plans] done")
}
sys.exit(0)
