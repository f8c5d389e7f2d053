package graft.core

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Single-WRITER enforcement for a corpus warehouse.
  *
  * Every store in the warehouse is maintained under a single-writer
  * contract (Sinks.bucketedIdempotentAppend's conf flip, the commit-point
  * write orders, the rewrite swaps) — but until round 13 the contract was
  * only asserted in comments. The failure it guards is silent: two
  * concurrent drops both pass the trim, each computes pairs against a
  * store missing the other's increment, and the cross-drop pair set is
  * incomplete forever (every append stays idempotent, so nothing crashes
  * or even warns). This ledger makes the contract REAL: a lease file
  * holding `owner|expiryMillis`, held for the duration of a mutating call.
  *
  * == The arbitration primitive is PLUGGABLE per filesystem scheme ==
  *
  * Exclusive-create (`fs.create(path, overwrite = false)`) is atomic on
  * HDFS but NOT on object stores: S3A implements it as check-then-put, so
  * two racing writers can both "win" — the single-writer guarantee would
  * silently degrade to advisory exactly where a 100 TB warehouse lives.
  * (Hadoop's LOCAL create-no-overwrite is a check-then-open too; the
  * local medium here uses an O_EXCL kernel create instead.) So the lease
  * speaks to a [[LeaseMedium]] — the minimal set of atomic transitions —
  * selected by the warehouse's filesystem scheme:
  *
  *   - `file` / `hdfs` / `viewfs` → [[HadoopRenameMedium]]: exclusive
  *     create (O_EXCL on local, namenode-atomic on HDFS) plus RENAME-based
  *     single-winner transitions. Reclaim is TOKEN-GATED: racing
  *     reclaimers race an exclusive-create on a sibling gate file —
  *     exactly one wins — and the winner re-verifies the stamp it saw
  *     before publishing its own via atomic overwrite-rename, so the
  *     lease file is NEVER absent during a reclaim (a rename-away-then-
  *     recreate protocol would open an absence window an acquirer could
  *     mistake for a free warehouse). Release claims the lease file away
  *     by atomic rename, deletes it iff the content is still the
  *     releaser's, and renames it back untouched otherwise. Refresh
  *     publishes via write-sibling + atomic overwrite-rename — never
  *     absent, never torn.
  *   - a scheme registered via [[registerMedium]] → the deployment's own
  *     medium. [[CasLeaseMedium]] over an [[AtomicCell]] is the sound
  *     building block: the cell's compare-and-swap shape is exactly what
  *     S3 conditional writes (`If-None-Match: *` create, `If-Match: etag`
  *     replace/delete) provide, and under a true CAS every transition
  *     here is single-winner with NO timing assumptions.
  *   - any other scheme → [[LeaseUnsupportedException]] at acquire, with
  *     the two escape hatches spelled out. REFUSING loudly beats silently
  *     arbitrating on a broken primitive.
  *
  * Escape hatch for object-store warehouses without a registered medium:
  * set [[CoordDirKey]] (`spark.graft.lease.coordDir`) to a directory on
  * an atomic-rename filesystem (HDFS, a posix mount) — the lease files
  * for every warehouse then live THERE (named by a hash of the warehouse
  * URI), while the data stays on the object store.
  *
  * == Semantics ==
  *
  *   - acquire: create the lease if absent. If present: the SAME owner
  *     re-acquires (refreshing expiry) — the crashed-holder retry
  *     re-entering cleanly, since a crash cannot release; a DIFFERENT
  *     owner fails fast with LeaseHeldException unless the lease has
  *     EXPIRED, in which case it is reclaimed via the medium's
  *     single-winner takeover (losing the takeover race fails fast too).
  *   - release: single-winner claim of the lease, deleted iff still ours,
  *     restored untouched otherwise — a reclaimed-then-released stale
  *     lease can never delete the new holder's file.
  *   - `withWriteLease` adds JVM-level re-entrancy (depth-counted per
  *     warehouse), so nested entry points — promoteAndIngest → run,
  *     forget → delete* — acquire once.
  *
  * The TTL bounds how long a CRASHED writer blocks the warehouse — it is
  * not a bound on how long a live one may work: `withWriteLease` runs a
  * HEARTBEAT that re-stamps the expiry every ttl/3 while the body runs.
  * A crash stops the heartbeat with the process, and the lease expires
  * one ttl later.
  *
  * == Residual windows (rename media only — a CAS medium has none) ==
  *
  * Rename gives atomic single-winner CLAIMS but not compare-and-swap, so
  * two narrow hazards remain on file/hdfs, both bounded by one heartbeat
  * period (ttl/3) because the displaced holder's next beat observes the
  * foreign owner, stops re-stamping, and the holding call THROWS
  * LeaseLostException at exit instead of returning silently:
  *
  *   1. A holder's beat that read its own UNEXPIRED stamp, then paused
  *      longer than the stamp's remaining life (≥ 2·ttl/3 under healthy
  *      beats — a driver-wide GC pause class event) before publishing,
  *      can overwrite a legitimate reclaimer. Beats route an expired or
  *      nearly-expired own stamp through the single-winner reclaim path
  *      instead of the publish path, which is what pins the pause bound
  *      to the stamp's remaining life.
  *   2. A reclaimer that pauses past the reclaim token's deadline (30 s
  *      for a three-op body) lets a successor take the gate; the paused
  *      reclaimer re-checks token ownership immediately before its
  *      publish, shrinking the double-publish hazard to a pause landing
  *      exactly between two adjacent driver ops after a 30 s stall.
  *
  * == Failure semantics under an unreachable medium ==
  *
  * A medium that stops answering (coordination-db outage, filesystem
  * hang) is never treated as continued holding: acquisition-time failures
  * propagate to the caller (no lease taken); a HELD lease's heartbeat
  * retries silently while the last successfully-published stamp is in
  * date, but once one full ttl passes without a successful beat the stamp
  * has expired where this holder cannot see it — an unseen reclaim can no
  * longer be ruled out, so the lease is marked LOST and the holding call
  * throws [[LeaseLostException]] at the outermost exit. This covers a
  * medium that HANGS (a blocking connect with no timeout) as well as one
  * that fails fast: the wedged beat cannot report anything, so the exit
  * itself checks the beat-health stamp, and the release's wait on the
  * beat lock is bounded (a wedged beat never deadlocks the exit — the
  * release is skipped and the stamp expires by ttl, extendable by at
  * most one more ttl if the beat later unblocks mid-refresh). Fail-fast
  * release failures are best-effort too (logged, swallowed), so no
  * release failure can ever mask the body's outcome. LeaseSpec's
  * dead-coordination-db and wedged-medium cases assert all of this.
  * Liveness degrades gracefully under wedges, never globally: every beat
  * and every release runs its medium I/O on a SINGLE-USE daemon thread
  * (the shared scheduler only dispatches), so a wedged call orphans at
  * most one thread per wedge event and can never exhaust beating for
  * other leases — and the shipped [[JdbcAtomicCell]] bounds every
  * operation with its own timeout, so even the orphans are reclaimed
  * there.
  *
  * This is advisory locking with cooperative writers — the right tool for
  * one pipeline's own drivers (all CorpusIngest entry points check it).
  * It does not stop a rogue process writing the directory directly, any
  * more than any lock file does.
  */
object WarehouseLease {

  private lazy val log =
    org.slf4j.LoggerFactory.getLogger("graft.core.WarehouseLease")

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

  /** Thrown at acquire when the warehouse's filesystem scheme has no
    * atomic arbitration primitive and none was registered — refusing
    * loudly instead of silently degrading the single-writer guarantee
    * to advisory-only (the S3A check-then-put failure mode).
    */
  final class LeaseUnsupportedException(msg: String)
      extends IllegalStateException(msg)

  /** The atomic transitions a lease location must provide. Every state
    * change of the lease cell goes through one of these; the protocol
    * above them carries no timing assumptions beyond what the medium
    * documents.
    */
  trait LeaseMedium {
    /** Current lease content, None when absent; torn/empty reads as ""
      * (parsed upstream as a never-expiring foreign holder: unreadable =
      * contended, never free).
      */
    def read(): Option[String]
    /** Atomically create the cell with `content` iff absent. */
    def createIfAbsent(content: String): Boolean
    /** Holder re-stamp: publish `next` given the cell held `expect`.
      * Atomic-publish at minimum (the cell is never absent or torn);
      * true CAS where the backend has one.
      */
    def refresh(expect: String, next: String): Boolean
    /** Single-winner takeover: transition `expect` → `next` such that of
      * N racers on one `expect`, AT MOST ONE returns true; a cell that
      * no longer holds `expect` is left unchanged (restored if the
      * medium had to disturb it to look).
      */
    def reclaim(expect: String, next: String): Boolean
    /** Delete the cell iff it still holds `expect`; single-winner, never
      * deletes a successor's lease.
      */
    def release(expect: String): Unit
  }

  /** A conditional-write cell — the exact shape S3 conditional requests
    * expose (`If-None-Match: *` on put, `If-Match: <etag>` on put and
    * delete). A deployment backs this with its object-store SDK and
    * registers `new CasLeaseMedium(cell)` for the scheme; the in-memory
    * implementation in LeaseSpec proves the protocol single-winner under
    * racing writers.
    *
    * CONTRACT NOTE — tags must not repeat across delete/recreate
    * generations: [[CasLeaseMedium]]'s refresh/reclaim are get-then-CAS
    * in two calls, so a holder stalled between them across
    * expire → reclaim → release → re-acquire replays a tag from a PRIOR
    * generation; if the recreated cell can reuse that tag, the stale CAS
    * succeeds and two writers hold at once (the generation-reset ABA
    * [[JdbcAtomicCell]] closes with a version monotonic per name). An S3
    * backing must mind that plain etags are content-derived and DO repeat
    * for identical content — make the stored content unique per
    * generation (lease stamps carry expiry millis; add a nonce if the
    * content could ever repeat) or use a version-token API whose tags are
    * globally unique.
    */
  trait AtomicCell {
    /** (content, opaque version tag), None when absent. */
    def get(): Option[(String, String)]
    /** Create iff absent — atomic. */
    def putIfAbsent(content: String): Boolean
    /** Replace iff the current version tag equals `tag` — atomic. */
    def putIfTag(tag: String, content: String): Boolean
    /** Delete iff the current version tag equals `tag` — atomic. */
    def deleteIfTag(tag: String): Boolean
  }

  /** Sound lease medium over a compare-and-swap cell: every transition is
    * a single conditional write, so all three race classes (acquire,
    * reclaim, release-vs-reclaim) resolve to exactly one winner with no
    * settle delays and no residual windows.
    */
  final class CasLeaseMedium(cell: AtomicCell) extends LeaseMedium {
    override def read(): Option[String] = cell.get().map(_._1)
    override def createIfAbsent(content: String): Boolean =
      cell.putIfAbsent(content)
    private def ifHolds(expect: String)(f: String => Boolean): Boolean =
      cell.get() match {
        case Some((c, tag)) if c == expect => f(tag)
        case _ => false
      }
    override def refresh(expect: String, next: String): Boolean =
      ifHolds(expect)(cell.putIfTag(_, next))
    override def reclaim(expect: String, next: String): Boolean =
      ifHolds(expect)(cell.putIfTag(_, next))
    override def release(expect: String): Unit = {
      ifHolds(expect)(cell.deleteIfTag(_)); ()
    }
  }

  /** Lease medium for atomic-rename filesystems (local posix, HDFS,
    * viewfs). Exclusive create is O_EXCL on local (Hadoop's own local
    * `create(p, false)` is check-then-open — two racers both pass) and
    * namenode-atomic on HDFS. Reclaim is token-gated (exclusive-create
    * on a sibling gate file picks the one publisher; the lease file is
    * never absent mid-reclaim); release claims the lease away by atomic
    * rename, deleting iff still the releaser's and renaming it back
    * untouched otherwise; refresh publishes through write-sibling +
    * atomic overwrite-rename, so a reader never observes an absent or
    * torn lease mid-refresh. Local-scheme I/O goes through the RAW local
    * filesystem (no .crc siblings) so NIO and Hadoop ops can mix freely,
    * and local renames use NIO ATOMIC_MOVE — Hadoop's local rename falls
    * back to copy-then-delete on a failed renameTo, which would fabricate
    * claim copies under racing claimers.
    */
  final class HadoopRenameMedium(spark: SparkSession, path: Path)
      extends LeaseMedium {
    private val conf = spark.sparkContext.hadoopConfiguration
    private val isLocal = {
      val s = Option(path.toUri.getScheme)
        .getOrElse(FileSystem.getDefaultUri(conf).getScheme)
      s == "file"
    }
    private val fs =
      if (isLocal) FileSystem.getLocal(conf).getRaw
      else path.getFileSystem(conf)
    private val lease = fs.makeQualified(path)
    private def nio(p: Path) = java.nio.file.Paths.get(p.toUri.getPath)

    private def readAt(p: Path): Option[String] =
      try {
        if (!fs.exists(p)) None
        else {
          val in = fs.open(p)
          val line =
            try new java.io.BufferedReader(new java.io.InputStreamReader(in))
              .readLine()
            finally in.close()
          Some(if (line == null) "" else line)
        }
      } catch { case _: java.io.FileNotFoundException => None }

    override def read(): Option[String] = readAt(lease)

    override def createIfAbsent(content: String): Boolean =
      createIfAbsentAt(lease, content)

    private def createIfAbsentAt(p: Path, content: String): Boolean =
      if (isLocal) {
        // kernel-atomic O_EXCL create — the one create-no-overwrite that
        // is actually atomic on a posix filesystem
        try {
          java.nio.file.Files.createDirectories(nio(p).getParent)
          val ch = java.nio.channels.FileChannel.open(nio(p),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          try ch.write(java.nio.ByteBuffer.wrap(content.getBytes("UTF-8")))
          finally ch.close()
          true
        } catch { case _: java.io.IOException => false }
      } else {
        try {
          val out = fs.create(p, false)
          try out.write(content.getBytes("UTF-8")) finally out.close()
          true
        } catch { case _: java.io.IOException => false }
      }

    private def writeAt(p: Path, content: String): Unit = {
      val out = fs.create(p, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }

    /** Atomically publish `tmp`'s content over the live lease file —
      * rename(2) on local, FileContext OVERWRITE rename (namenode-atomic)
      * on HDFS. The lease file is never absent during the publish.
      */
    private def publishOver(tmp: Path): Boolean =
      try {
        if (isLocal)
          java.nio.file.Files.move(nio(tmp), nio(lease),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        else
          FileContext.getFileContext(lease.toUri, conf)
            .rename(tmp, lease, Options.Rename.OVERWRITE)
        true
      } catch {
        case _: java.io.IOException =>
          try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
          false
      }

    override def refresh(expect: String, next: String): Boolean =
      if (!read().contains(expect)) false
      else {
        val tmp = new Path(lease.getParent,
          lease.getName + ".tmp-" +
            java.util.UUID.randomUUID().toString.take(8))
        writeAt(tmp, next)
        // verify-then-atomic-publish, not CAS: the residual window (a
        // pause between the read above and this publish exceeding the
        // stamp's remaining life) is documented in the object doc; the
        // protocol routes expired stamps through reclaim() so an
        // in-date refresh can only overwrite its own live stamp
        publishOver(tmp)
      }

    /** Rename the live lease to a unique claim file; exactly one racing
      * claimer wins (the source vanishes atomically). Returns the claim
      * path and its content.
      */
    private def claimAway(): Option[(Path, String)] = {
      val claim = new Path(lease.getParent,
        lease.getName + ".claim-" +
          java.util.UUID.randomUUID().toString.take(8))
      val won =
        try {
          if (isLocal) {
            // NIO ATOMIC_MOVE is a bare rename(2): exactly one racing
            // claimer wins, the losers get NoSuchFileException. Hadoop's
            // RawLocalFileSystem.rename must NOT be used here — when its
            // renameTo fails it falls back to COPY-then-delete, which can
            // fabricate extra "claims" (copies) under racing claimers and
            // void the single-winner property this protocol stands on.
            java.nio.file.Files.move(nio(lease), nio(claim),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            true
          } else fs.rename(lease, claim) // namenode-atomic on hdfs/viewfs
        } catch { case _: java.io.IOException => false }
      if (!won) None else Some((claim, readAt(claim).getOrElse("")))
    }

    private def discard(claim: Path): Unit =
      try fs.delete(claim, false) catch { case _: java.io.IOException => () }

    // reclaim token: a sibling gate file so that of N reclaimers racing
    // one expired stamp, exactly one (the atomic token creator) may
    // publish. The lease file itself is NEVER absent during a reclaim —
    // publish is an atomic content swap — so an acquirer polling the
    // cell can never mistake a reclaim in flight for a free warehouse
    // (rename-away-then-recreate protocols open exactly that window).
    private val token = new Path(lease.getParent, lease.getName + ".reclaim")
    private val tokenTtlMs = 30000L

    private def tokenDeadline(t: String): Long = {
      val i = t.lastIndexOf('|')
      if (i < 0) Long.MaxValue
      else try t.substring(i + 1).trim.toLong
      catch { case _: NumberFormatException => Long.MaxValue }
    }

    /** Win the reclaim gate: clear a CRASHED reclaimer's expired token
      * (single-winner removal via atomic rename of the token — losers
      * back off for this round), then race the exclusive create.
      */
    private def tokenUp(me: String): Boolean = {
      val cleared = readAt(token) match {
        case None => true
        case Some(t) if tokenDeadline(t) >= System.currentTimeMillis() =>
          false // a reclaim is in flight — back off, the next pass retries
        case Some(_) =>
          // crashed reclaimer's token: remove it single-winner (rename to
          // a unique name; the copy-fallback hazard of Hadoop's local
          // rename is avoided the same way as claimAway)
          val uniq = new Path(token.getParent, token.getName + ".stale-" + me)
          try {
            if (isLocal)
              java.nio.file.Files.move(nio(token), nio(uniq),
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            else if (!fs.rename(token, uniq)) throw new java.io.IOException
            try fs.delete(uniq, false)
            catch { case _: java.io.IOException => () }
            true
          } catch { case _: java.io.IOException => false }
      }
      cleared && createIfAbsentAt(token,
        s"$me|${System.currentTimeMillis() + tokenTtlMs}")
    }

    private def dropToken(me: String): Unit =
      // only if still OURS: a >deadline pause lets a later reclaimer
      // replace the token, and deleting theirs would double-admit
      if (readAt(token).exists(_.startsWith(me + "|")))
        try fs.delete(token, false) catch { case _: java.io.IOException => () }

    override def reclaim(expect: String, next: String): Boolean = {
      val me = java.util.UUID.randomUUID().toString.take(12)
      if (!tokenUp(me)) false
      else try {
        if (!read().contains(expect)) false // transitioned since the read
        else {
          val tmp = new Path(lease.getParent,
            lease.getName + ".tmp-" + me.take(8))
          writeAt(tmp, next)
          // re-check token ownership immediately before the publish: if a
          // pause outlived the token deadline a successor reclaimer may
          // hold the gate now, and it must be the only publisher (this
          // shrinks the pause hazard to the gap between two adjacent
          // driver ops — the residual the object doc documents)
          if (readAt(token).exists(_.startsWith(me + "|"))) publishOver(tmp)
          else {
            try fs.delete(tmp, false)
            catch { case _: java.io.IOException => () }
            false
          }
        }
      } finally dropToken(me)
    }

    override def release(expect: String): Unit =
      claimAway() match {
        case None => ()
        case Some((claim, got)) if got == expect => discard(claim)
        case Some((claim, _)) =>
          // not ours anymore — a successor's lease; put it BACK by
          // renaming the claim into place (atomic, content untouched).
          // If an acquirer slipped into the claim gap, leave its lease
          // and drop the claim — the displaced successor's next beat
          // surfaces the overlap.
          try {
            if (fs.exists(lease)) discard(claim)
            else if (isLocal) {
              java.nio.file.Files.move(nio(claim), nio(lease),
                java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            } else if (!fs.rename(claim, lease)) discard(claim)
          } catch { case _: java.io.IOException => discard(claim) }
      }
  }

  /** Conf key: a directory on an atomic-rename filesystem hosting the
    * lease files of warehouses whose OWN filesystem has no atomic
    * primitive (object stores). Lease files are named by a hash of the
    * warehouse URI; the warehouse data never moves.
    */
  val CoordDirKey = "spark.graft.lease.coordDir"

  // filesystem schemes whose create/rename primitives are atomic enough
  // for HadoopRenameMedium; everything else must register a medium or
  // redirect via CoordDirKey
  private val atomicRenameSchemes = Set("file", "hdfs", "viewfs")

  // deployment-registered media by warehouse scheme (e.g. "s3a" → a
  // CasLeaseMedium over the SDK's conditional PUT)
  private val customMedia =
    new ConcurrentHashMap[String, (SparkSession, String) => LeaseMedium]()

  /** Register the lease medium for a filesystem scheme — the seam an
    * object-store deployment uses to supply its conditional-write
    * arbitration (see [[AtomicCell]] / [[CasLeaseMedium]]).
    */
  def registerMedium(scheme: String,
                     factory: (SparkSession, String) => LeaseMedium): Unit =
    customMedia.put(scheme, factory)

  def unregisterMedium(scheme: String): Unit = customMedia.remove(scheme)

  private def schemeOf(spark: SparkSession, s: String): String =
    Option(new Path(s).toUri.getScheme).getOrElse(
      FileSystem.getDefaultUri(spark.sparkContext.hadoopConfiguration)
        .getScheme)

  private def sha16(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    d.take(8).map(b => f"$b%02x").mkString
  }

  /** Where this warehouse's lease lives: a sibling file under the
    * warehouse root, unless [[CoordDirKey]] redirects every lease to a
    * coordination directory (keyed by the normalized warehouse URI, so
    * the same warehouse always maps to the same lease file).
    */
  private def leasePath(spark: SparkSession, warehouse: String): Path =
    spark.conf.getOption(CoordDirKey).filter(_.trim.nonEmpty) match {
      case Some(cd) =>
        val norm = new Path(warehouse).toUri.toString
        val base = new Path(warehouse).getName
          .replaceAll("[^A-Za-z0-9._-]", "_").take(48)
        new Path(cd, s"._graft_writer_lease-$base-${sha16(norm)}")
      case None => new Path(warehouse, "._graft_writer_lease")
    }

  /** Resolve the arbitration medium for a warehouse. Scheme-registered
    * media win; atomic-rename filesystems (including a CoordDirKey
    * redirect landing on one) get [[HadoopRenameMedium]]; anything else
    * refuses loudly.
    */
  private[graft] def mediumFor(spark: SparkSession,
                               warehouse: String): LeaseMedium = {
    val custom = customMedia.get(schemeOf(spark, warehouse))
    if (custom != null) custom(spark, warehouse)
    else {
      val p = leasePath(spark, warehouse)
      val s = schemeOf(spark, p.toString)
      if (atomicRenameSchemes(s)) new HadoopRenameMedium(spark, p)
      else throw new LeaseUnsupportedException(
        s"warehouse $warehouse: no atomic lease primitive on filesystem " +
          s"scheme '$s' — create-no-overwrite is check-then-put on object " +
          "stores (S3A et al), so exclusive-create arbitration would " +
          "silently admit two writers. Either set " +
          s"$CoordDirKey to a directory on an atomic-rename filesystem " +
          "(HDFS, a posix mount) to host the lease files there, or " +
          "WarehouseLease.registerMedium a conditional-write medium for " +
          "the scheme (CasLeaseMedium over an AtomicCell backed by the " +
          "store's conditional PUT / If-Match semantics — or the shipped " +
          "JdbcAtomicCell.mediumFactory over any transactional database, " +
          "e.g. the RDS a deployment already runs)")
    }
  }

  /** Default writer identity: stable for this JVM's lifetime, unique
    * across JVMs — a crashed-and-restarted driver gets a NEW owner and
    * waits out (or outlives) its predecessor's TTL, while a retry inside
    * one surviving JVM re-enters its own lease.
    */
  val jvmOwner: String =
    java.lang.management.ManagementFactory.getRuntimeMXBean.getName + "#" +
      java.util.UUID.randomUUID().toString.take(8)

  val defaultTtlMs: Long = 15L * 60L * 1000L

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
    * directory arbitrates on one key; schemes the session cannot resolve
    * (custom-medium stores) key on the normalized lease URI instead.
    */
  private def heldKey(spark: SparkSession, warehouse: String): String = {
    val p = leasePath(spark, warehouse)
    try fsOf(spark, p).makeQualified(p).toString
    catch { case _: Exception => "unresolved:" + p.toUri.toString }
  }

  // Qualified warehouse ROOT directories the current thread holds through
  // `withWriteLease`, depth-counted — keyed on the DATA root (not the
  // lease file's location, which CoordDirKey can move elsewhere) so
  // `heldByCurrentThread` can answer "does the single-writer contract
  // cover this store path" by prefix. Thread-local because the question
  // is per call tree: a sibling thread of the same JVM holding the lease
  // does NOT make this thread the writer.
  private val threadHeldRoots: ThreadLocal[scala.collection.mutable.Map[String, Int]] =
    ThreadLocal.withInitial(() => scala.collection.mutable.Map.empty[String, Int])

  /** Qualify a data path the same way for roots and queries so every
    * spelling of one directory compares equal (the heldKey rationale,
    * applied to data paths).
    */
  private def qualifiedDir(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    try p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
    catch { case _: Exception => "unresolved:" + p.toUri.toString }
  }

  /** True iff the CURRENT thread is inside a `withWriteLease` body whose
    * warehouse root is `path` or an ancestor of it. This is the guard the
    * self-heal gates in `core.Sinks` consult before restoring a
    * crash-parked rewrite swap: only the lease-holding call tree can know
    * no OTHER writer's swap is mid-flight — a lease-free reader renaming
    * `._compact_old` back can collide with a healthy swap's rename pair
    * and nest stale data inside the live table. Thread-scoped by design;
    * a lease held elsewhere in the JVM answers false here.
    */
  private def dropThreadRoot(rootKey: String): Unit = {
    val r = threadHeldRoots.get()
    r.get(rootKey).foreach { d =>
      if (d <= 1) r.remove(rootKey) else r(rootKey) = d - 1
    }
  }

  def heldByCurrentThread(spark: SparkSession, path: String): Boolean = {
    val roots = threadHeldRoots.get()
    if (roots.isEmpty) false
    else {
      val q = qualifiedDir(spark, path)
      roots.keysIterator.exists(r => q == r || q.startsWith(r + "/"))
    }
  }

  /** Mutable state of ONE outermost hold — a fresh instance per acquire,
    * never shared across holds of the same warehouse. Instance identity
    * IS the hold's identity: the beat closure, the exit, and the
    * abandonable release all capture THIS object, and anything that can
    * outlive the hold (a beat wedged inside a hanging medium call, an
    * abandoned release) checks `activeHolds.get(key) eq hold` before
    * acting — a zombie can touch only its own orphaned instance, never a
    * successor hold's loss-detection state (the per-KEY maps this
    * replaces had exactly that hazard: the exit's deferred removals
    * could clobber entries a successor had already started using).
    *
    *   - `lock` serializes the beat's check-then-refresh against
    *     release: without it a beat preempted between its read and its
    *     write could recreate the lease file AFTER release deleted it.
    *     A ReentrantLock (not a monitor) so release can BOUND its wait;
    *     fresh per hold so a wedged beat can never poison a later
    *     re-acquire's lock.
    *   - `lastPub` is the hold's last successfully-published stamp — the
    *     ONLY content its release may delete (exact-content match): an
    *     abandoned release unblocking after a same-default-jvmOwner
    *     re-acquire finds a successor stamp it cannot match. Stamps
    *     differ per publish except the same-millisecond same-owner-
    *     same-ttl mint, so the release ALSO skips when a successor hold
    *     is registered on the key — doing harm requires clearing both
    *     guards inside a read-to-write window.
    *   - `lastBeatOk` is the last instant the medium ANSWERED a beat
    *     (acquire counts as one) — consulted by the beat's unreachable-
    *     medium detection AND by the outermost exit: a WEDGED medium
    *     call blocks the beat thread inside the call, so the beat can
    *     never report its own staleness; the exit-time check fires
    *     regardless. Either way, > ttl without one successful beat means
    *     the published stamp expired where nobody could see it — lost,
    *     not held.
    *   - `markLost` records that the beat observed a FOREIGN owner (or a
    *     full ttl of silence) on a lease we believed we held. The beat
    *     can only stop re-stamping; the surfacing happens at the
    *     outermost exit, which THROWS instead of returning silently-
    *     possibly-interleaved results. Logged once, on the transition —
    *     the one message an operator must never miss, not a wall of it.
    */
  private final class HoldState(warehouse: String, owner: String) {
    val lock = new java.util.concurrent.locks.ReentrantLock
    val lastPub =
      new java.util.concurrent.atomic.AtomicReference[String]()
    val lastBeatOk = new java.util.concurrent.atomic.AtomicLong(0L)
    // THIS hold's scheduled heartbeat task (heartbeatPool doc): kept on
    // the hold, never in a per-key map, so no exit can cancel a
    // successor's beating
    val renewal = new java.util.concurrent.atomic.AtomicReference[
      java.util.concurrent.ScheduledFuture[_]]()
    private val lostObserved =
      new java.util.concurrent.atomic.AtomicReference[String]()
    def markLost(observed: String): Unit =
      if (lostObserved.compareAndSet(null, observed))
        log.warn(
          s"write lease on $warehouse lost ($observed) " +
            s"while held by $owner — a concurrent writer may have " +
            "interleaved; the holding call will throw on exit")
    def isLost: Boolean = lostObserved.get() != null
  }

  // the CURRENT outermost hold per canonical lease key — entries are
  // removed (identity-guarded) the moment the exit begins, so a mapping
  // present here always belongs to a live hold
  private val activeHolds = new ConcurrentHashMap[String, HoldState]()

  // the heartbeat scheduler — a small shared daemon pool that only
  // DISPATCHES: each firing hands the beat's medium I/O to
  // [[BeatDispatch.fireOnce]] (single-use daemon thread, tryLock-gated
  // on the hold lock — a previous beat still in flight makes the new one
  // skip its period). The pool threads themselves never touch the
  // medium, so a medium that WEDGES a call (hanging connect, dead
  // socket) orphans at most one single-use thread per wedge EVENT and
  // can never exhaust beating capacity — the four-wedges-silence-all-
  // beating degradation of a pool that ran the I/O itself is
  // structurally impossible. Loss detection never depended on the beats
  // anyway (the exit-time lastBeatOk check fires with every beat
  // parked), and timeouts on the medium's connects (JdbcAtomicCell
  // bounds every operation) reclaim even the orphans. Each hold's
  // scheduled task lives ON its HoldState (never in a per-key map — an
  // exit or failed acquire must only ever cancel ITS OWN task, never a
  // successor's), cancelled at outermost release and double-checked
  // against `held` and the hold's identity, so a cancel/fire race can
  // never re-stamp a released lease.
  private lazy val heartbeatPool = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val t = new java.util.concurrent.ScheduledThreadPoolExecutor(2,
      (r: Runnable) => {
        val th = new Thread(r, s"graft-lease-heartbeat-${n.incrementAndGet()}")
        th.setDaemon(true)
        th
      })
    t.setRemoveOnCancelPolicy(true)
    t
  }

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def stamp(owner: String, ttlMs: Long): String =
    s"$owner|${System.currentTimeMillis() + ttlMs}"

  /** Parse `owner|expiryMillis`. Any unparseable content — missing
    * separator, garbage expiry from a torn write — reads as a
    * never-expiring foreign holder: unreadable = treat as contended,
    * never as free (and never as a crash out of the caller's entry
    * point).
    */
  private def parseLease(raw: String): (String, Long) = {
    val i = raw.lastIndexOf('|')
    if (i < 0) ("<corrupt>", Long.MaxValue)
    else try (raw.substring(0, i), raw.substring(i + 1).trim.toLong)
    catch { case _: NumberFormatException => ("<corrupt>", Long.MaxValue) }
  }

  /** Read the warehouse's current lease as (owner, expiryMillis), None
    * when free — the first question on a contended multi-driver
    * warehouse ("which driver holds this, until when") answered without
    * provoking a LeaseHeldException. Purely a read: no transition, no
    * arbitration, and inherently a snapshot (the holder may release or a
    * reclaimer may win between this read and anything the caller does
    * with it). Unreadable/torn content reports as a never-expiring
    * "<corrupt>" holder, same as the acquire path treats it.
    */
  def status(spark: SparkSession,
             warehouse: String): Option[(String, Long)] =
    mediumFor(spark, warehouse).read().map(parseLease)

  /** THIS JVM's coordination-health gauges, monotonic since JVM start
    * (consumers diff across reads): connects the JDBC cell abandoned as
    * wedged, and beat firings skipped behind a previous one still in
    * flight. Both sit at ~zero on a healthy medium; growth is the
    * signature of an INTERMITTENTLY-wedging coordination database or
    * store — visible here long before a wedge streak outlasts a TTL and
    * surfaces as a lost lease. JVM-scoped on purpose (they answer "is
    * MY driver's view of the medium degrading"), which is why
    * `warehouseStatus` reports them under `*_jvm` names.
    */
  def coordinationGauges: Seq[(String, Long)] = Seq(
    "orphaned_connects_jvm" -> JdbcAtomicCell.orphanedConnects.get(),
    "skipped_beats_jvm" -> BeatDispatch.skippedBeats.get())

  /** Take the warehouse write lease. Throws LeaseHeldException when
    * another live owner holds it (or when a racing transition beat us),
    * LeaseUnsupportedException when the warehouse's filesystem has no
    * atomic primitive.
    */
  def acquire(spark: SparkSession, warehouse: String,
              owner: String = jvmOwner,
              ttlMs: Long = defaultTtlMs): Unit =
    acquireVia(mediumFor(spark, warehouse), warehouse, owner, ttlMs)

  /** Returns the stamp that was actually PUBLISHED on success — the
    * content an exact-stamp release must target (HoldState doc).
    */
  private def acquireVia(m: LeaseMedium, warehouse: String,
                         owner: String, ttlMs: Long): String = {
    val first = stamp(owner, ttlMs)
    if (m.createIfAbsent(first)) return first
    m.read() match {
      case None =>
        // holder released between our create and read — one retry
        val retry = stamp(owner, ttlMs)
        if (!m.createIfAbsent(retry))
          throw new LeaseHeldException(
            s"warehouse $warehouse: lost the lease race on re-acquire")
        retry
      case Some(raw) =>
        val (o, exp) = parseLease(raw)
        val now = System.currentTimeMillis()
        if (o == owner) {
          // our own lease (crashed-call retry, or TTL refresh): take it
          // back. An EXPIRED own stamp goes through the single-winner
          // reclaim — a foreign reclaimer may be mid-takeover on it, and
          // a plain publish could clobber the winner.
          val next = stamp(owner, ttlMs)
          val ok =
            if (exp < now) m.reclaim(raw, next)
            else m.refresh(raw, next)
          if (!ok) throw new LeaseHeldException(
            s"warehouse $warehouse: our lease transitioned while " +
              s"re-acquiring as $owner (a reclaimer won it); current: " +
              s"${m.read()}")
          next
        } else if (exp < now) {
          // stale: the holder died without releasing — single-winner
          // takeover via the medium (rename-claim or CAS); losing the
          // race fails fast
          val next = stamp(owner, ttlMs)
          if (!m.reclaim(raw, next))
            throw new LeaseHeldException(
              s"warehouse $warehouse: lease of expired owner $o was " +
                s"reclaimed by a concurrent writer (now: ${m.read()})")
          next
        } else throw new LeaseHeldException(
          s"warehouse $warehouse is being written by $o (lease expires " +
            s"${new java.sql.Timestamp(exp)}); concurrent drops would " +
            "silently lose cross-drop pairs — serialize your writers")
    }
  }

  /** Release iff still owned (a reclaimed-then-released stale lease must
    * not delete the new holder's file) — single-winner through the
    * medium's claim-verify-delete.
    */
  def release(spark: SparkSession, warehouse: String,
              owner: String = jvmOwner): Unit =
    releaseVia(mediumFor(spark, warehouse), owner)

  private def releaseVia(m: LeaseMedium, owner: String): Unit =
    m.read().foreach { raw =>
      if (parseLease(raw)._1 == owner) m.release(raw)
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
    // record the DATA root for this thread the moment arbitration is won:
    // from here until the outer exit, `heldByCurrentThread` must answer
    // true for stores under this warehouse (the Sinks self-heal gates ask
    // it from inside the body)
    val rootKey = qualifiedDir(spark, warehouse)
    locally {
      val r = threadHeldRoots.get(); r(rootKey) = r.getOrElse(rootKey, 0) + 1
    }
    // OUR hold instance, assigned under the in-JVM arbitration (no
    // successor can race the assignment) — the loss check and the exit
    // below use this reference and never re-read the map, which a
    // successor may have re-mapped by then
    var myHold: HoldState = null
    if (depth == 1) {
      try {
        val m = mediumFor(spark, warehouse)
        // one fresh HoldState per outermost acquire (field doc): its
        // instance identity is the hold's identity for every closure
        // below, and loss/health state lives ON it — nothing a zombie
        // can touch ever belongs to a successor hold
        val hold = new HoldState(warehouse, owner)
        hold.lastPub.set(acquireVia(m, warehouse, owner, ttlMs))
        hold.lastBeatOk.set(System.currentTimeMillis())
        activeHolds.put(key, hold)
        myHold = hold
        // heartbeat: re-stamp expiry every ttl/3 while held, so a live
        // holder outworking its ttl is never reclaimed mid-drop. The beat
        // checks the in-memory hold AND the cell's current owner before
        // stamping: a cancel/fire race on release, or a reclaim that
        // somehow slipped between beats, must not be clobbered by a stale
        // overwrite.
        val period = math.max(ttlMs / 3L, 100L)
        // ZOMBIE guard: a beat wedged inside a medium call can unblock
        // AFTER its hold exited (systematically so now that JdbcAtomicCell
        // bounds its ops) — and after a same-owner re-acquire, the
        // owner/held checks alone would wave it through. Identity, not
        // identity-by-name: this hold is the active one iff activeHolds
        // still maps to THIS instance (the exit removes the mapping
        // before anything else). A stale beat must not re-stamp (it
        // would resurrect a released lease or move the successor's stamp
        // out from under its exact-stamp release) — re-checked
        // immediately before every publish; the residue is a publish
        // wedged between its re-check and its write, read-to-write
        // instants. markLost needs no re-check: it writes to THIS hold's
        // own instance, which a successor never reads.
        def beatOnce(): Unit = {
          def stillOurs: Boolean = activeHolds.get(key) eq hold
          // hold.lock (held by the dispatcher around this body) makes
          // check-then-refresh atomic against release: without it a beat
          // preempted between its read and its write could recreate the
          // lease file AFTER release deleted it
          val cur = held.get(key)
          if (stillOurs && cur != null && cur._1 == owner)
            try {
              m.read() match {
                case Some(raw) if parseLease(raw)._1 == owner =>
                  val exp = parseLease(raw)._2
                  val now = System.currentTimeMillis()
                  val next = stamp(owner, ttlMs)
                  if (exp >= now + period) {
                    // comfortably in date: no reclaimer can legitimately
                    // act on this stamp, atomic publish is safe. A false
                    // return is transient — the next beat retries or
                    // detects the foreign owner.
                    if (stillOurs && m.refresh(raw, next))
                      hold.lastPub.set(next)
                  } else if (stillOurs && m.reclaim(raw, next))
                    hold.lastPub.set(next)
                  else if (stillOurs)
                    // expired (or expiring within one beat): a reclaimer
                    // may be acting on this very stamp, so only a
                    // single-winner takeover may re-stamp it. Losing it
                    // means a foreign writer won — unless the cell still
                    // reads as ours (our own racing transition), treat
                    // the lease as lost.
                    m.read() match {
                      case Some(r2) if parseLease(r2)._1 == owner => ()
                      case other => if (stillOurs)
                        hold.markLost(other.getOrElse("<absent>"))
                    }
                case other =>
                  // a foreign owner on a lease we believe we hold: >ttl
                  // passed without a successful beat and someone
                  // reclaimed. Never re-stamp — and surface it at the
                  // outermost exit (the two-writer window was OPEN;
                  // silence here is the failure mode the lease exists to
                  // close). The stillOurs re-check is WARN hygiene, not
                  // correctness (the mark lands on this hold's own
                  // instance either way): a zombie unblocking after its
                  // hold exited must not log a spurious loss alarm for a
                  // call that already returned cleanly.
                  if (stillOurs)
                    hold.markLost(other.getOrElse("<absent>"))
              }
              hold.lastBeatOk.set(System.currentTimeMillis())
            } catch {
              case _: Throwable =>
                // medium unreachable: the next beat retries while the
                // published stamp is in date; past one full ttl without
                // a successful beat, treat the lease as lost (doc above)
                if (stillOurs &&
                  System.currentTimeMillis() - hold.lastBeatOk.get()
                    > ttlMs)
                  hold.markLost("<medium unreachable past the ttl>")
            }
        }
        hold.renewal.set(heartbeatPool.scheduleAtFixedRate(
          () => BeatDispatch.fireOnce(hold.lock, "graft-lease-beat")(
            beatOnce()),
          period, period, java.util.concurrent.TimeUnit.MILLISECONDS))
      } catch {
        case e: Throwable =>
          // retire OUR state first — identity-guarded, and BEFORE
          // held.remove opens the in-JVM arbitration: a by-key cleanup
          // running after the open could cancel a successor's heartbeat
          // or delete its activeHolds entry (silently disabling its
          // loss detection)
          if (myHold != null) {
            Option(myHold.renewal.get()).foreach(_.cancel(false))
            activeHolds.remove(key, myHold)
            myHold = null
          }
          held.remove(key); dropThreadRoot(rootKey)
          throw e
      }
    }
    try {
      val out = body
      // surface a mid-body lease loss on the success path: the work ran,
      // but a reclaiming writer may have interleaved with it — the caller
      // must treat the drop as suspect (its appends are idempotent, so
      // re-running after re-acquiring heals). The lastBeatOk clause is
      // the WEDGED-medium case: a beat blocked inside a hanging call can
      // never report its own staleness, but a full ttl without one
      // successful beat means the stamp expired unseen either way. The
      // state read is THIS hold's own instance (activeHolds still maps
      // our key to it until the finally below) — a previous hold's
      // zombie can never have touched it.
      if (depth == 1) {
        val h = myHold
        val wasLost = h != null && h.isLost
        val beatStale = h != null &&
          System.currentTimeMillis() - h.lastBeatOk.get() > ttlMs
        if (wasLost || beatStale)
          throw new LeaseLostException(
            s"warehouse $warehouse: the write lease was lost to another " +
              "owner while this call ran (heartbeat gap exceeded the ttl" +
              (if (beatStale && !wasLost)
                " — the medium stopped answering beats" else "") +
              "); a concurrent writer may have interleaved — re-run this " +
              "entry point after re-acquiring, its appends are idempotent")
      }
      out
    } finally {
      dropThreadRoot(rootKey)
      // retire THIS hold's state BEFORE opening the in-JVM arbitration:
      // identity-guarded, so a successor's mapping is never touched, and
      // from this instant every zombie closure of this hold answers
      // `stillOurs == false`. The heartbeat task is cancelled here too —
      // it is THIS hold's own future (kept on the HoldState, never in a
      // per-key map), so no exit can ever cancel a successor's beating.
      // Ordering matters: the per-key maps this design replaced deferred
      // their removals past the releaser join, where they could clobber
      // state a successor had already started using — a
      // silent-dual-write window.
      if (depth == 1 && myHold != null) {
        activeHolds.remove(key, myHold)
        Option(myHold.renewal.get()).foreach(_.cancel(false))
      }
      val left = held.compute(key, (_, cur) => cur match {
        case (o, t, 1) if o == owner && t == tid => null
        case (o, t, d) if o == owner && t == tid => (o, t, d - 1)
        case other => other
      })
      if (left == null) {
        val hold = myHold
        // under the hold's beat lock: a beat already past its held-check
        // must finish (refresh-then-delete is fine) before we delete —
        // the reverse order would resurrect the file as an orphan. The
        // WHOLE release (lock wait AND the release's own medium I/O —
        // either can hang on a wedged medium) runs on a SINGLE-USE daemon
        // thread with a bounded join, so the holder's exit always
        // returns: on timeout the release is abandoned as an orphaned
        // thread (the stamp expires by ttl; a later-unblocking beat can
        // extend that by at most one more ttl before its held-check
        // stops it — and the shared scheduler pool is untouched, see
        // heartbeatPool). The release targets THIS hold's exact
        // last-published stamp (HoldState doc): an abandoned task that
        // unblocks after a same-owner re-acquire finds a successor stamp
        // it can never match, so it can no-op but never delete a live
        // successor lease. Release is best-effort against an unreachable
        // medium for the same reason as ever: an exception here would
        // MASK the body's outcome (including a LeaseLostException the
        // caller must see) — log and move on, never throw from the
        // release.
        val period = math.max(ttlMs / 3L, 100L)
        // `hold` is never null here: the releaser only runs on the
        // outermost frame, where myHold was assigned the moment
        // acquireVia returned (a failed acquire rethrows before the
        // try/finally) and lastPub was set in the same statement — so
        // the release always has an exact stamp to target, and the
        // owner-match deletion path (the two-writer window the
        // exact-stamp design closed) stays gone.
        val releaser = new Thread(() => {
          val locked =
            try hold.lock.tryLock(2L * period,
              java.util.concurrent.TimeUnit.MILLISECONDS)
            catch { case _: InterruptedException => false }
          if (!locked)
            // a beat is wedged mid-call and might still complete its
            // refresh: releasing concurrently could recreate the lease
            // as an orphan — skip, the stamp expires by ttl
            log.warn(
              s"write lease on $warehouse: a heartbeat is wedged " +
                "inside a hanging medium call — skipping the release; " +
                "the lease expires by ttl on its own")
          else
            try {
              // exact-stamp matching alone is not airtight: two stamps
              // minted the same millisecond with the same owner and ttl
              // are byte-identical. So a release that finds a SUCCESSOR
              // hold already active on this key (the documented recovery
              // path re-acquired) skips entirely: the successor's own
              // exit owns the release. An abandoned release must clear
              // BOTH guards to do harm — unblock when no successor is
              // registered AND match its exact string — which leaves
              // only a wedge landing between this check and the medium
              // write, read-to-write instants.
              if (activeHolds.get(key) == null)
                mediumFor(spark, warehouse).release(hold.lastPub.get())
            } catch {
              case e: Exception => log.warn(
                s"could not release the write lease on $warehouse " +
                  s"(medium unreachable?) — it expires by ttl on its own",
                e)
            } finally hold.lock.unlock()
        }, "graft-lease-release")
        releaser.setDaemon(true)
        releaser.start()
        try releaser.join(4L * period)
        catch { case _: InterruptedException =>
          Thread.currentThread().interrupt() }
        if (releaser.isAlive) log.warn(
          s"write lease on $warehouse: the release is wedged inside a " +
            "hanging medium call — abandoning it; the lease expires " +
            "by ttl on its own")
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
