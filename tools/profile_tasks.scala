// Task-time decomposition for a set of queries: executor run time vs
// deserialize time vs GC, plus result serialization, summed per query.
// Env: GRAFT_PROF_ONLY (comma names), GRAFT_PROF_SF.
{
  import org.apache.spark.scheduler._
  import java.util.concurrent.atomic.AtomicLong
  val run = new AtomicLong; val deser = new AtomicLong
  val gc = new AtomicLong; val cnt = new AtomicLong
  val sched = new AtomicLong
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        run.addAndGet(m.executorRunTime)
        deser.addAndGet(m.executorDeserializeTime)
        gc.addAndGet(m.jvmGCTime)
      }
      if (t.taskInfo != null)
        sched.addAndGet(t.taskInfo.launchTime - 0)
      cnt.incrementAndGet()
    }
  })
  val sfDir = sys.env.getOrElse("GRAFT_PROF_SF", "/root/testdata/sf0.1")
  val only = sys.env("GRAFT_PROF_ONLY").split(",").toSet
  spark.sparkContext.setLogLevel("WARN")
  val defs = graft.SparkEntry.allDefs.filter(d => only(d.name))
  defs.foreach { q =>
    // warm
    try q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
    finally { graft.core.GraftCaches.releaseAll(spark); spark.catalog.clearCache() }
    run.set(0); deser.set(0); gc.set(0); cnt.set(0)
    val t0 = System.nanoTime()
    try q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
    finally { graft.core.GraftCaches.releaseAll(spark); spark.catalog.clearCache() }
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[tasks] ${q.name}%-32s wall $wall%6.3f tasks ${cnt.get}%5d " +
      f"run ${run.get / 1e3}%8.2f deser ${deser.get / 1e3}%7.2f " +
      f"gc ${gc.get / 1e3}%6.2f")
  }
  println("[tasks] done")
}
sys.exit(0)
