package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Single-WRITER enforcement for a corpus warehouse.
  *
  * Every store in the warehouse is maintained under a single-writer
  * contract (Sinks.bucketedIdempotentAppend's conf flip, the commit-point
  * write orders, the rewrite swaps) — but until now the contract was only
  * asserted in comments. The failure it guards is silent: two concurrent
  * drops both pass the trim, each computes pairs against a store missing
  * the other's increment, and the cross-drop pair set is incomplete
  * forever (every append stays idempotent, so nothing crashes or even
  * warns). This ledger makes the contract REAL: a sibling lease file under
  * the warehouse root, created atomically (create-fails-if-exists), held
  * for the duration of a mutating call.
  *
  * Semantics:
  *   - acquire: exclusive-create `<warehouse>/._graft_writer_lease`
  *     holding `owner|expiryMillis`. If the file exists: the SAME owner
  *     re-acquires (refreshing expiry) — that is the crashed-holder retry
  *     re-entering cleanly, since a crash cannot release; a DIFFERENT
  *     owner fails fast with LeaseHeldException unless the lease has
  *     EXPIRED, in which case it is reclaimed (delete + re-create; losing
  *     the re-create race fails fast too).
  *   - release: delete the file iff still owned.
  *   - `withWriteLease` adds JVM-level re-entrancy (depth-counted per
  *     warehouse), so nested entry points — promoteAndIngest → run,
  *     forget → delete* — acquire once.
  *
  * The TTL bounds how long a CRASHED writer blocks the warehouse — it is
  * not a bound on how long a live one may work: `withWriteLease` runs a
  * HEARTBEAT that re-stamps the expiry every ttl/3 while the body runs,
  * so a multi-hour drop under the 15-minute default is never exposed to
  * reclaim (the one way a live-but-slow holder could reopen the silent
  * two-writer window this ledger exists to close). A crash stops the
  * heartbeat with the process, and the lease expires one ttl later.
  * Reclaim uses delete-then-create, not an atomic swap: two
  * reclaimers racing resolve to one winner because exactly one exclusive
  * create succeeds; a reader racing the window sees either lease state,
  * never a torn file (single-block write).
  *
  * This is advisory locking with cooperative writers — the right tool for
  * one pipeline's own drivers (all CorpusIngest entry points check it).
  * It does not stop a rogue process writing the directory directly, any
  * more than any lock file does.
  */
object WarehouseLease {

  final class LeaseHeldException(msg: String)
      extends IllegalStateException(msg)

  /** Thrown by `withWriteLease` when the lease was LOST to a reclaiming
    * owner while the body ran (heartbeat gap exceeded the ttl). A
    * distinct type from the acquisition-time LeaseHeldException so
    * retry wrappers (`awaitWriteLease`) can retry contention without
    * ever auto-retrying a body that may have interleaved with another
    * writer — that decision belongs to the caller.
    */
  final class LeaseLostException(msg: String)
      extends IllegalStateException(msg)

  /** Default writer identity: stable for this JVM's lifetime, unique
    * across JVMs — a crashed-and-restarted driver gets a NEW owner and
    * waits out (or outlives) its predecessor's TTL, while a retry inside
    * one surviving JVM re-enters its own lease.
    */
  val jvmOwner: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName + "#" +
      java.util.UUID.randomUUID().toString.take(8)

  val defaultTtlMs: Long = 15L * 60L * 1000L

  private def leasePath(warehouse: String) =
    new Path(warehouse, "._graft_writer_lease")

  // JVM-level re-entrancy: canonical lease URI ->
  // (owner, holding thread id, depth). The THREAD id matters: re-entrancy
  // exists for nested entry points in ONE call tree (promoteAndIngest →
  // run); a second thread of the same JVM — same default jvmOwner —
  // launching a concurrent drop is exactly the two-writer hazard, and
  // owner-only matching would wave it through as depth 2.
  private val held = new ConcurrentHashMap[String, (String, Long, Int)]()

  /** The in-JVM arbitration key must be SPELLING-INDEPENDENT: two threads
    * addressing one warehouse as "/data/wh" and "data/wh" (or
    * "file:/data/wh") reach the same directory through the filesystem but
    * would miss each other in a raw-string map — both proceeding as
    * writers with the same jvmOwner, the exact silent two-writer hole the
    * map exists to close. Qualify against the filesystem (scheme,
    * authority, working-dir resolution) so every spelling of one
    * directory arbitrates on one key.
    */
  private def heldKey(spark: SparkSession, warehouse: String): String = {
    val p = leasePath(warehouse)
    fsOf(spark, p).makeQualified(p).toString
  }

  // per-key monitors serializing the heartbeat body against release: the
  // beat's check-then-refresh is not atomic on its own, so an unlucky
  // preemption between its readLease and its writeRefresh could recreate
  // the lease file AFTER release deleted it — an orphan lease blocking
  // foreign writers for a full ttl
  private val beatMonitors = new ConcurrentHashMap[String, Object]()
  private def beatMonitor(key: String): Object =
    beatMonitors.computeIfAbsent(key, _ => new Object)

  // keys whose heartbeat observed a FOREIGN owner on the lease file while
  // we believed we held it (possible only if >ttl elapsed without a
  // successful beat — filesystem outage, driver-wide GC pause — and a
  // second writer legitimately reclaimed). The beat can only stop
  // re-stamping; the surfacing happens at the outermost withWriteLease
  // exit, which THROWS instead of returning silently-possibly-incomplete
  // results.
  private val lost = ConcurrentHashMap.newKeySet[String]()

  // heartbeat renewals for held leases — one shared daemon thread; tasks
  // are cancelled at outermost release (and double-checked against `held`
  // so a cancel/fire race can never re-stamp a released lease)
  private val renewals =
    new ConcurrentHashMap[String, java.util.concurrent.ScheduledFuture[_]]()
  private lazy val heartbeatPool = {
    val t = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val th = new Thread(r, "graft-lease-heartbeat")
        th.setDaemon(true)
        th
      })
    t
  }

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Read (owner, expiryMillis) from the lease file; None when absent.
    * Any unparseable content — missing separator, garbage expiry from a
    * torn write — reads as a never-expiring foreign holder: unreadable =
    * treat as contended, never as free (and never as a crash out of the
    * caller's entry point).
    */
  private def readLease(spark: SparkSession,
                        warehouse: String): Option[(String, Long)] = {
    val p = leasePath(warehouse)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val line =
        try new java.io.BufferedReader(new java.io.InputStreamReader(in))
          .readLine()
        finally in.close()
      val i = if (line == null) -1 else line.lastIndexOf('|')
      if (i < 0) Some(("<corrupt>", Long.MaxValue))
      else try Some((line.substring(0, i), line.substring(i + 1).trim.toLong))
      catch {
        case _: NumberFormatException => Some(("<corrupt>", Long.MaxValue))
      }
    }
  }

  private def writeExclusive(spark: SparkSession, warehouse: String,
                             owner: String, ttlMs: Long): Boolean = {
    val p = leasePath(warehouse)
    val fs = fsOf(spark, p)
    try {
      // overwrite = false: atomic create-fails-if-exists on local/HDFS —
      // the arbitration primitive
      val out = fs.create(p, false)
      try out.write(s"$owner|${System.currentTimeMillis() + ttlMs}"
        .getBytes("UTF-8"))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }
  }

  private def writeRefresh(spark: SparkSession, warehouse: String,
                           owner: String, ttlMs: Long): Unit = {
    val p = leasePath(warehouse)
    val fs = fsOf(spark, p)
    val out = fs.create(p, true)
    try out.write(s"$owner|${System.currentTimeMillis() + ttlMs}"
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** Take the warehouse write lease (filesystem level — see object doc).
    * Throws LeaseHeldException when another live owner holds it.
    */
  def acquire(spark: SparkSession, warehouse: String,
              owner: String = jvmOwner,
              ttlMs: Long = defaultTtlMs): Unit = {
    if (writeExclusive(spark, warehouse, owner, ttlMs)) return
    readLease(spark, warehouse) match {
      case None =>
        // holder released between our create and read — one retry
        if (!writeExclusive(spark, warehouse, owner, ttlMs))
          throw new LeaseHeldException(
            s"warehouse $warehouse: lost the lease race on re-acquire")
      case Some((o, _)) if o == owner =>
        // our own lease (crashed-call retry, or TTL refresh): take it back
        writeRefresh(spark, warehouse, owner, ttlMs)
      case Some((o, exp)) if exp < System.currentTimeMillis() =>
        // stale: the holder died without releasing — reclaim by
        // OVERWRITE-then-verify, never delete-then-create: a racing
        // reclaimer's delete could remove the winner's freshly created
        // lease and leave BOTH believing they hold it. With overwrite,
        // racing reclaimers last-write-wins; after a settle delay each
        // re-reads and only the one whose owner survived proceeds (the
        // settle must exceed the writers' mutual clock-visible skew on
        // the lease file — generous for one filesystem).
        writeRefresh(spark, warehouse, owner, ttlMs)
        Thread.sleep(200L)
        readLease(spark, warehouse) match {
          case Some((w, _)) if w == owner => ()
          case other => throw new LeaseHeldException(
            s"warehouse $warehouse: lease of expired owner $o was " +
              s"reclaimed by a concurrent writer (now: $other)")
        }
      case Some((o, exp)) =>
        throw new LeaseHeldException(
          s"warehouse $warehouse is being written by $o (lease expires " +
            s"${new java.sql.Timestamp(exp)}); concurrent drops would " +
            "silently lose cross-drop pairs — serialize your writers")
    }
  }

  /** Release iff still owned (a reclaimed-then-released stale lease must
    * not delete the new holder's file).
    */
  def release(spark: SparkSession, warehouse: String,
              owner: String = jvmOwner): Unit =
    readLease(spark, warehouse) match {
      case Some((o, _)) if o == owner =>
        val p = leasePath(warehouse)
        fsOf(spark, p).delete(p, false)
      case _ => ()
    }

  /** Hold the write lease around `body`, re-entrant within this JVM per
    * (owner, warehouse): nested entry points acquire once, and only the
    * outermost exit releases. Every mutating CorpusIngest entry point
    * wraps itself in this.
    */
  def withWriteLease[T](spark: SparkSession, warehouse: String,
                        owner: String = jvmOwner,
                        ttlMs: Long = defaultTtlMs)(body: => T): T = {
    val key = heldKey(spark, warehouse)
    val tid = Thread.currentThread().getId
    val depth = held.compute(key, (_, cur) => cur match {
      case null => (owner, tid, 1)
      case (o, t, d) if o == owner && t == tid => (o, t, d + 1)
      case (o, t, _) if o == owner => throw new LeaseHeldException(
        s"warehouse $warehouse is being written by owner $o on thread $t " +
          s"of this JVM (this is thread $tid) — re-entrancy is per call " +
          "tree, not per process; a concurrent drop needs its own owner " +
          "so the lease can arbitrate, or better, its own serialized slot")
      case (o, _, _) => throw new LeaseHeldException(
        s"warehouse $warehouse is being written by $o in this JVM")
    })._3
    if (depth == 1) {
      try {
        acquire(spark, warehouse, owner, ttlMs)
        // heartbeat: re-stamp expiry every ttl/3 while held, so a live
        // holder outworking its ttl is never reclaimed mid-drop. The beat
        // checks the in-memory hold AND the FILE's current owner before
        // stamping: a cancel/fire race on release, or a reclaim that
        // somehow slipped between beats, must not be clobbered by a stale
        // overwrite.
        val period = math.max(ttlMs / 3L, 100L)
        renewals.put(key, heartbeatPool.scheduleAtFixedRate(
          () => beatMonitor(key).synchronized {
            // the monitor makes check-then-refresh atomic against release:
            // without it a beat preempted between its read and its write
            // could recreate the lease file AFTER release deleted it
            val cur = held.get(key)
            if (cur != null && cur._1 == owner)
              try readLease(spark, warehouse) match {
                case Some((o2, _)) if o2 == owner =>
                  writeRefresh(spark, warehouse, owner, ttlMs)
                case other =>
                  // a foreign owner on a lease we believe we hold: >ttl
                  // passed without a successful beat and someone reclaimed.
                  // Never re-stamp — and surface it at the outermost exit
                  // (the two-writer window was OPEN; silence here is the
                  // failure mode the lease exists to close).
                  lost.add(key)
                  System.err.println(
                    s"[graft] WARN: write lease on $warehouse lost to " +
                      s"$other while held by $owner — a concurrent writer " +
                      "may have interleaved; the holding call will throw " +
                      "on exit")
              } catch { case _: Throwable => () } // next beat retries
          },
          period, period, java.util.concurrent.TimeUnit.MILLISECONDS))
      } catch {
        case e: Throwable => held.remove(key); throw e
      }
    }
    try {
      val out = body
      // surface a mid-body lease loss on the success path: the work ran,
      // but a reclaiming writer may have interleaved with it — the caller
      // must treat the drop as suspect (its appends are idempotent, so
      // re-running after re-acquiring heals)
      if (depth == 1 && lost.contains(key))
        throw new LeaseLostException(
          s"warehouse $warehouse: the write lease was lost to another " +
            "owner while this call ran (heartbeat gap exceeded the ttl); " +
            "a concurrent writer may have interleaved — re-run this " +
            "entry point after re-acquiring, its appends are idempotent")
      out
    } finally {
      val left = held.compute(key, (_, cur) => cur match {
        case (o, t, 1) if o == owner && t == tid => null
        case (o, t, d) if o == owner && t == tid => (o, t, d - 1)
        case other => other
      })
      if (left == null) {
        val hb = renewals.remove(key)
        if (hb != null) hb.cancel(false)
        // under the beat monitor: a beat already past its held-check must
        // finish (refresh-then-delete is fine) before we delete — the
        // reverse order would resurrect the file as an orphan
        beatMonitor(key).synchronized {
          release(spark, warehouse, owner)
        }
        lost.remove(key)
      }
    }
  }

  /** `withWriteLease` with PATIENCE — the entry-point shape a scheduled
    * cadence wants (promote every N minutes; a busy warehouse should
    * delay the cadence, not fail the run): a CONTENDED lease is retried
    * with jittered backoff until `timeoutMs` elapses, then the last
    * LeaseHeldException propagates. Only acquisition-time contention
    * retries — a `LeaseLostException` (the body ran but the lease was
    * lost mid-flight) always propagates immediately: auto-re-running a
    * body that may have interleaved with another writer is a caller
    * decision, never a wrapper default. Fail-fast `withWriteLease`
    * remains the right call for interactive drops.
    */
  def awaitWriteLease[T](spark: SparkSession, warehouse: String,
                         owner: String = jvmOwner,
                         ttlMs: Long = defaultTtlMs,
                         timeoutMs: Long = 10L * 60L * 1000L,
                         pollMs: Long = 2000L)(body: => T): T = {
    val deadline = System.currentTimeMillis() + timeoutMs
    val rng = new scala.util.Random
    @scala.annotation.tailrec
    def attempt(): T = {
      // retry ONLY acquisition-origin contention: a LeaseHeldException
      // thrown from INSIDE the body (a nested entry point on some other
      // warehouse, say) must propagate — re-running a body whose earlier
      // writes already executed is never a wrapper decision. The flag
      // flips the instant the body starts, so any exception after that
      // point escapes the retry loop.
      var bodyStarted = false
      val out =
        try Right(withWriteLease(spark, warehouse, owner, ttlMs) {
          bodyStarted = true; body
        })
        catch {
          case e: LeaseHeldException
            if !bodyStarted && System.currentTimeMillis() < deadline =>
            Left(e)
        }
      out match {
        case Right(t) => t
        case Left(_) =>
          // jittered poll (±25%) so two waiting cadences don't thunder
          // in lockstep at the same instants forever
          val jitter = (pollMs * (0.75 + 0.5 * rng.nextDouble())).toLong
          Thread.sleep(math.max(50L,
            math.min(jitter, deadline - System.currentTimeMillis())))
          attempt()
      }
    }
    attempt()
  }
}
