// Per-stage task-time attribution for one query: prints each stage's summed
// task ms, task count, and name/callsite, sorted by cost.
// Env: GRAFT_PROF_ONLY (one name), GRAFT_PROF_SF.
{
  import org.apache.spark.scheduler._
  import scala.collection.concurrent.TrieMap
  val stageInfo = new TrieMap[Int, (String, Long, Int)]()
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val (n, ms, c) = stageInfo.getOrElse(t.stageId, ("", 0L, 0))
      stageInfo(t.stageId) = (n, ms + t.taskInfo.duration, c + 1)
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val (_, ms, c) = stageInfo.getOrElse(s.stageInfo.stageId, ("", 0L, 0))
      stageInfo(s.stageInfo.stageId) =
        (s.stageInfo.name + " || " + s.stageInfo.details.linesIterator
          .filter(_.contains("graft")).take(3).mkString(" <- "), ms, c)
    }
  })
  val sfDir = sys.env.getOrElse("GRAFT_PROF_SF", "/root/testdata/sf0.1")
  val name = sys.env("GRAFT_PROF_ONLY")
  spark.sparkContext.setLogLevel("WARN")
  val q = graft.SparkEntry.allDefs.find(_.name == name).get
  // warm pass
  try q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
  finally { graft.core.GraftCaches.releaseAll(spark); spark.catalog.clearCache() }
  stageInfo.clear()
  val t0 = System.nanoTime()
  try q.build(spark, sfDir).write.format("noop").mode("overwrite").save()
  finally { graft.core.GraftCaches.releaseAll(spark); spark.catalog.clearCache() }
  println(f"[stages] wall ${(System.nanoTime() - t0) / 1e9}%.3f s")
  stageInfo.toSeq.sortBy(-_._2._2).take(25).foreach { case (id, (n, ms, c)) =>
    println(f"[stages] $id%4d ${ms / 1e3}%9.2f s $c%5d tasks  ${n.take(300)}")
  }
  println("[stages] done")
}
sys.exit(0)
