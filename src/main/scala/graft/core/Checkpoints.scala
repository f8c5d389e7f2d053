package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.SparkContext
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage-cut policy for the iterative and ingest paths.
  *
  * Components' contraction rounds and CorpusIngest's per-drop increments
  * must cut lineage eagerly (round plans double per iteration; the
  * increment's defining anti-join reads the very store its append then
  * writes). `localCheckpoint()` does that with executor-held blocks —
  * fast, but NOT durable: on a real cluster an executor loss mid-job
  * (spot reclaim, OOM kill, dynamic deallocation) makes the cut frame
  * unrecoverable and fails the whole multi-hour drop or component job.
  * The reference survives worker loss by construction (immutable bronze +
  * re-run, v2022/etl-containers/aggregates/src/aggregates_etl.py:119-125);
  * a long-running ingest driver needs the same property.
  *
  * `cut` is the one switch: by default it localCheckpoints (the right
  * trade for tests and short interactive jobs — no filesystem round
  * trip); when the session carries `spark.graft.checkpointDir`, every cut
  * becomes a RELIABLE `checkpoint()` into that directory, so a lost
  * executor re-reads the cut from durable storage instead of killing the
  * job. Correctness is identical either way — both cuts are eager and
  * both truncate lineage; only the failure domain changes.
  *
  * The directory is job-scratch, not a table: Spark writes
  * `<dir>/<uuid>/rdd-*` files and does not garbage-collect them for a
  * live session (intermediate rounds accumulate until the job ends) —
  * point it at scratch space and delete it after the run, like a shuffle
  * dir. `withCheckpointDir` scopes the switch to one call tree and
  * restores the previous setting on exit.
  */
object Checkpoints {

  /** Session conf key: set (non-empty) to switch every `cut` in the
    * session from executor-local to reliable checkpointing — the GLOBAL
    * mode a production driver sets once at session build.
    */
  val DirKey = "spark.graft.checkpointDir"

  // withCheckpointDir's scoping is a call-tree-local override, NOT a
  // session-conf flip: two concurrent call trees on one session (two
  // warehouses, two threads) would otherwise interleave set/restore and
  // cross-apply or strand each other's dirs — the same hazard class the
  // co-partition flip in Sinks takes a JVM lock for, solved here without
  // serializing whole ingest bodies because the value is only read on the
  // calling thread (all cuts are synchronous driver-side calls).
  private val localDir = new scala.util.DynamicVariable[Option[String]](None)

  /** The configured durable checkpoint dir, if any: the enclosing
    * `withCheckpointDir` scope first, the session conf otherwise.
    */
  def configured(spark: SparkSession): Option[String] =
    localDir.value.orElse(
      spark.conf.getOption(DirKey).filter(_.trim.nonEmpty))

  // SparkContext.setCheckpointDir creates a fresh UUID subdirectory per
  // call — remember the base we last set per context so repeated cuts
  // reuse one subdirectory instead of littering one per cut
  private val lastBase = new ConcurrentHashMap[SparkContext, String]()

  /** Cut `df`'s lineage EAGERLY (the frame is computed now, and the
    * returned frame's plan is a scan of the materialized result).
    * Durable when the session configures `DirKey`; executor-local
    * otherwise.
    */
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    configured(spark) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        // setCheckpointDir is CONTEXT-global while the scoped dir is
        // call-tree-local, and the reliable-checkpoint machinery captures
        // the context's dir at RDD-MARK time (Dataset.checkpoint marks
        // synchronously even with eager = false). So the lock must span
        // set + mark as one unit: marking outside it would let a
        // concurrent cut() flip the dir between our set and our mark, and
        // this frame's files would land in the OTHER call tree's scratch
        // dir — deleted when that run ends, stranding a live job's cut.
        // The locked section is cheap driver-side work (no Spark job);
        // the job that materializes the cut runs OUTSIDE the lock.
        val marked = lastBase.synchronized {
          if (lastBase.get(sc) != dir) {
            sc.setCheckpointDir(dir)
            lastBase.put(sc, dir)
          }
          df.checkpoint(eager = false)
        }
        // force materialization now — same effect as eager = true (the
        // checkpoint files write at the end of this first job), without
        // holding the lock across the job
        marked.count()
        marked
      case None => df.localCheckpoint()
    }
  }

  /** Run `body` with reliable checkpointing into `dir` — a call-tree
    * override scoped to the calling thread (restored on exit even on
    * throw), so concurrent ingests on one session can each carry their
    * own durability dir without touching the shared session conf. The
    * `spark` parameter keeps the call shape symmetric with `configured`;
    * the session itself is not mutated.
    */
  def withCheckpointDir[T](spark: SparkSession, dir: String)(body: => T): T =
    localDir.withValue(Some(dir))(body)
}
