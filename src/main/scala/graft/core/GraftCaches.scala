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

  /** Run `body` and, on exit, release ONLY the graft-owned frames acquired
    * during it — the release discipline for a long-running server that
    * embeds individual operators: wrap each request in `withScope` and the
    * request's intermediates are unpersisted when the request finishes,
    * while caches the application (or an enclosing scope) created earlier
    * stay live. `releaseAll` remains the right call at session teardown;
    * this is the per-unit-of-work variant, so neither "release everything
    * after every request" (throws away a shared warm cache) nor "never
    * release" (the round-2 leak) is forced on the embedder.
    *
    * The body MUST run its consuming actions inside the scope — the exit
    * release would otherwise unpersist intermediates before the lazy plan
    * executes and force the self-join branches to recompute. Scoping is
    * per-SESSION, not per-thread: frames another thread acquires on the
    * same session while `body` runs are treated as part of this scope.
    * Release on exit happens even when `body` throws.
    */
  def withScope[T](spark: SparkSession)(body: => T): T = {
    val before = new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]()
    val q0 = registry.get(spark)
    if (q0 != null) q0.forEach(df => before.put(df, java.lang.Boolean.TRUE))
    try body
    finally {
      val q = registry.get(spark)
      if (q != null) {
        val it = q.iterator()
        while (it.hasNext) {
          val df = it.next()
          if (!before.containsKey(df)) {
            df.unpersist(blocking = false)
            it.remove()
          }
        }
      }
    }
  }
}
