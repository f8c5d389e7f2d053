// Profile declared queries: wall split into build/plan/execute, plus job,
// stage, task counts and summed task time from a SparkListener.
// Usage: GRAFT_PROF_ONLY=a,b,c spark-shell ... -I tools/profile_q.scala
// Env: GRAFT_PROF_SF (default sf0.1), GRAFT_PROF_PASSES (default 2; the
// warm pass is the number to read).
{
  import org.apache.spark.scheduler._
  import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
  val jobCnt = new AtomicInteger; val stageCnt = new AtomicInteger
  val taskCnt = new AtomicInteger; val taskMs = new AtomicLong
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onJobStart(j: SparkListenerJobStart): Unit = jobCnt.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stageCnt.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      taskCnt.incrementAndGet()
      if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
    }
  })
  val sfDir = sys.env.getOrElse("GRAFT_PROF_SF", "/root/testdata/sf0.1")
  val passes = sys.env.getOrElse("GRAFT_PROF_PASSES", "2").toInt
  val only = sys.env.get("GRAFT_PROF_ONLY").map(_.split(",").toSet)
  spark.sparkContext.setLogLevel("WARN")
  val defs = only.fold(graft.SparkEntry.allDefs)(sel =>
    graft.SparkEntry.allDefs.filter(d => sel(d.name)))
  defs.foreach { q =>
    (1 to passes).foreach { p =>
      spark.sparkContext.setJobDescription(s"prof:${q.name}:$p")
      val t0 = System.nanoTime()
      val df = q.build(spark, sfDir)
      val t1 = System.nanoTime()   // build (may run eager probe jobs)
      val qe = df.queryExecution
      qe.executedPlan               // force analysis+optimization+planning
      val t2 = System.nanoTime()
      val (j0, s0, k0, m0) = (jobCnt.get, stageCnt.get, taskCnt.get, taskMs.get)
      try df.write.format("noop").mode("overwrite").save()
      finally {
        graft.core.GraftCaches.releaseAll(spark)
        spark.catalog.clearCache()
      }
      val t3 = System.nanoTime()
      def s(a: Long, b: Long) = f"${(b - a) / 1e9}%.3f"
      println(f"[prof] ${q.name}%-32s p$p build ${s(t0,t1)} plan ${s(t1,t2)} " +
        f"exec ${s(t2,t3)} total ${s(t0,t3)} jobs ${jobCnt.get-j0}%3d " +
        f"stages ${stageCnt.get-s0}%4d tasks ${taskCnt.get-k0}%5d " +
        f"taskSec ${(taskMs.get-m0)/1e3}%8.2f")
    }
  }
  println("[prof] done")
}
sys.exit(0)
