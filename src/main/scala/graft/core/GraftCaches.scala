package graft.core

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Ownership registry for operator-internal persists.
  *
  * Several operators MUST materialize an intermediate before a self-join
  * (Spark does not CSE across join branches — see DedupOps.shingleTable,
  * SimilarityOps.cosinePairsLsh): they call `acquire` instead of a bare
  * `persist`, which records the cached frame against its session. A caller
  * that has finished consuming query results calls `releaseAll(spark)` to
  * unpersist every graft-owned intermediate WITHOUT touching caches the
  * application itself created (unlike `spark.catalog.clearCache()`).
  *
  * This is the leak fix for long-lived sessions: before it, every
  * near-dup/ANN query parked a MEMORY_AND_DISK table in the CacheManager
  * forever (round-2 bench pathology). Release is idempotent and cheap —
  * `unpersist(blocking = false)` on an already-released frame is a no-op.
  */
object GraftCaches {

  private val registry =
    new ConcurrentHashMap[SparkSession, ConcurrentLinkedQueue[DataFrame]]()

  /** Persist `df` at `level` and register it as graft-owned. Returns `df`
    * (already persisted) for chaining.
    */
  def acquire(df: DataFrame,
              level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    df.persist(level)
    registry
      .computeIfAbsent(df.sparkSession, _ => new ConcurrentLinkedQueue[DataFrame]())
      .add(df)
    df
  }

  /** Unpersist every graft-owned intermediate of `spark`. Call after the
    * consuming action completes — unpersisting earlier would force the
    * self-join branches to recompute the materialized subtree.
    */
  def releaseAll(spark: SparkSession): Unit = {
    val q = registry.remove(spark)
    if (q != null) {
      var df = q.poll()
      while (df != null) {
        df.unpersist(blocking = false)
        df = q.poll()
      }
    }
  }

  /** Number of currently registered (not yet released) frames — test hook. */
  def registered(spark: SparkSession): Int = {
    val q = registry.get(spark)
    if (q == null) 0 else q.size()
  }
}
