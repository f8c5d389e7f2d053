// Solo-time a subset of declared queries: noop-sink, N warm passes, prints
// per-pass seconds. The reliable per-query number is warm pass 2+ (verify
// skill note). Usage:
//   GRAFT_SOLO_ONLY=q05_join_revenue,ann_kmeans \
//   /opt/spark/bin/spark-shell --master "local[32]" --driver-memory 24g \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.session.timeZone=UTC --conf spark.ui.enabled=false \
//     --driver-class-path target/scala-2.13/classes -I tools/solo_time.scala
// Env: GRAFT_SOLO_SF (default /root/testdata/sf0.1), GRAFT_SOLO_PASSES (3).
{
  val sfDir = sys.env.getOrElse("GRAFT_SOLO_SF", "/root/testdata/sf0.1")
  val passes = sys.env.getOrElse("GRAFT_SOLO_PASSES", "3").toInt
  val only = sys.env.get("GRAFT_SOLO_ONLY").map(_.split(",").toSet)
  spark.sparkContext.setLogLevel("WARN")
  val defs = only.fold(graft.SparkEntry.allDefs)(sel =>
    graft.SparkEntry.allDefs.filter(d => sel(d.name)))
  defs.foreach { q =>
    val ts = (1 to passes).map { p =>
      spark.sparkContext.setJobDescription(s"solo:${q.name}:$p")
      val t0 = System.nanoTime()
      try q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
      finally {
        graft.core.GraftCaches.releaseAll(spark)
        spark.catalog.clearCache()
      }
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[solo] ${q.name}%-34s ${ts.map(t => f"$t%.3f").mkString(" ")}")
  }
  println("[solo] done")
}
sys.exit(0)
