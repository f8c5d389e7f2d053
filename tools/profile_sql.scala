// SQL-node metric attribution for one query: runs it (1 warm + 1 measured),
// then prints the final executed plan's node metrics from the SQL status
// store (the UI's SQL tab, textually).
// Env: GRAFT_PROF_ONLY (one name), GRAFT_PROF_SF.
{
  val sfDir = sys.env.getOrElse("GRAFT_PROF_SF", "/root/testdata/sf0.1")
  val name = sys.env("GRAFT_PROF_ONLY")
  spark.sparkContext.setLogLevel("WARN")
  val q = graft.SparkEntry.allDefs.find(_.name == name).get
  try q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
  finally { graft.core.GraftCaches.releaseAll(spark); spark.catalog.clearCache() }
  val store = spark.sharedState.statusStore
  val before = store.executionsList().map(_.executionId).toSet
  val t0 = System.nanoTime()
  try q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
  finally { graft.core.GraftCaches.releaseAll(spark); spark.catalog.clearCache() }
  println(f"[sqlprof] wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
  Thread.sleep(1500) // let the listener drain
  val execs = store.executionsList().filterNot(e => before(e.executionId))
  execs.foreach { e =>
    val g = store.planGraph(e.executionId)
    val mv = store.executionMetrics(e.executionId)
    println(s"[sqlprof] === execution ${e.executionId}: ${e.description.take(80)}")
    g.allNodes.foreach { n =>
      val ms = n.metrics.flatMap(m => mv.get(m.accumulatorId).map(v => s"${m.name}=$v"))
      val interesting = ms.filter(s => s.contains("time") || s.contains("rows")
        || s.contains("spill"))
      if (interesting.nonEmpty)
        println(s"[sqlprof] node ${n.id}%3d ${n.name} :: ${interesting.mkString(" | ")}")
    }
  }
  println("[sqlprof] done")
}
sys.exit(0)
