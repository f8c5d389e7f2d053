package graft.core

import java.sql.{Connection, DriverManager, SQLException, Statement}

import org.apache.spark.sql.SparkSession

/** Reference [[WarehouseLease.AtomicCell]] over a JDBC one-row-per-cell
  * table — the shipped production backend for the CAS lease seam on
  * warehouses whose own filesystem has no atomic primitive (object
  * stores). Any transactional database reachable over JDBC works, and the
  * same SQL runs on Postgres/MySQL/RDS — the coordination database a cloud
  * deployment of the reference pipeline would already have (its dimension
  * sink is a MySQL RDS:
  * v2022/etl-containers/reference-data/src/reference_data_etl.py:60-67).
  *
  * The embedded Derby on the Spark classpath (`jdbc:derby:/path;create=
  * true`) is suitable for SINGLE-PROCESS and test use only: embedded
  * Derby admits one booting JVM per database (a second process fails to
  * boot it — loudly, with XSDB6 — and dual-boot detection is unreliable
  * on NFS), so it cannot arbitrate the N-drivers-on-N-hosts contention
  * the lease seam exists for. Cross-process coordination requires a
  * network-reachable database: a Derby network server, Postgres, MySQL,
  * RDS. LeaseSpec's cross-process case asserts the embedded refusal is
  * loud, never a silent second writer.
  *
  * Soundness: every transition is ONE conditional statement — an INSERT
  * guarded by the primary key, or an UPDATE guarded by `version = ?` (and
  * by the FREE sentinel, below) — so the database's atomicity makes each
  * a true compare-and-swap: of N racers conditioning on one version tag,
  * the row lock admits exactly one, the rest see update-count 0. No
  * settle delays, no residual windows — the property LeaseSpec races
  * (both with the in-memory cell and with this one).
  *
  * The version column is a monotonically increasing BIGINT, and it is
  * monotonic PER CELL NAME FOR THE TABLE'S LIFETIME, not per generation:
  * delete does not remove the row — it demotes it to a FREE-sentinel
  * content with `version + 1`, and a later create CASes the sentinel back
  * to live content with `version + 1` again. Without that, a delete-then-
  * recreate generation would restart at version 0 and a STALLED holder's
  * pre-delete tag "0" could CAS against the successor generation's fresh
  * row (the get-then-putIfTag window in `CasLeaseMedium.refresh`),
  * silently admitting two writers — the exact ABA this seam exists to
  * eliminate. With the sentinel, a tag from any earlier generation is
  * strictly smaller than the current version and can never match.
  * `get()` maps the sentinel to None, so callers observe create/delete
  * exactly as before; the sentinel content itself is reserved (a caller
  * storing the literal sentinel string would read back as absent — lease
  * stamps are `owner|expiry` and can never collide with it).
  *
  * == Failure semantics under a dead coordination database ==
  *
  * Every operation opens its own connection, so a database outage
  * surfaces as SQLException from the call that hit it — at ACQUIRE that
  * propagates to the caller (no lease taken, nothing to clean up). While
  * a lease is HELD, the protocol above this cell treats unreachability
  * as LOSS, never as continued holding: the heartbeat retries silently
  * while the last successfully-published stamp is still in date (a blip
  * costs nothing), but once a full TTL passes without one successful
  * beat the holder can no longer rule out an unseen expiry + reclaim, so
  * the lease is marked lost and the holding call THROWS
  * [[WarehouseLease.LeaseLostException]] at exit instead of returning
  * silently-possibly-interleaved results. Release through a dead
  * database is best-effort: the failure is logged and swallowed (the
  * stamp expires by TTL on its own), never allowed to mask the body's
  * outcome. LeaseSpec's dead-coordination-db case asserts all three.
  *
  * == Every operation is TIMEOUT-BOUNDED ==
  *
  * A medium that WEDGES (a TCP connect that hangs before the driver sees
  * it, a query parked on a dead-but-not-closed socket) is strictly worse
  * than one that fails fast: the protocol above still DETECTS the loss
  * (the exit-time beat-health check needs no beat to report), but the
  * wedged call used to park its calling thread for the connection's
  * lifetime. So every cell operation is bounded by `opTimeoutMs`
  * (default 10 s — an order of magnitude over a healthy coordination
  * round-trip, far under any lease ttl): the connect runs on a
  * single-use daemon thread with a claim handshake (whichever side loses
  * the claim closes the connection, so an abandoned connect that later
  * completes can never leak), and every statement carries a JDBC query
  * timeout. A timeout surfaces as SQLException (SQLState 08001/HYT00),
  * which the lease protocol already maps to retry-then-LOST — the thread
  * is always returned, and the four-wedges-silence-all-beating
  * degradation the un-bounded path risked cannot occur.
  *
  * Connections are per-call — lease traffic is a handful of statements
  * per heartbeat period, so pooling would be tuning noise; a deployment
  * with a shared pool can pass a `connect` thunk instead of a URL (the
  * timeout harness wraps the thunk either way).
  */
final class JdbcAtomicCell(connect: () => Connection, table: String,
                           cellName: String,
                           opTimeoutMs: Long = JdbcAtomicCell.DefaultOpTimeoutMs)
    extends WarehouseLease.AtomicCell {

  def this(url: String, table: String, cellName: String) =
    this(() => DriverManager.getConnection(url), table, cellName)

  import JdbcAtomicCell.FreeSentinel

  // statement-level timeout is in whole seconds per JDBC; never 0 (= none)
  private val stmtTimeoutSec = math.max(1L, opTimeoutMs / 1000L).toInt

  /** Open a connection on a single-use daemon thread, bounded by
    * `opTimeoutMs`. The claim CAS decides ownership exactly once: if the
    * waiter times out first it claims ABANDONMENT and the connect thread
    * closes whatever it later opened; if the connect finishes first it
    * claims DELIVERY and the waiter takes it. No interleaving leaks a
    * connection or hands one to a departed waiter.
    */
  private def timedConnect(): Connection = {
    val result =
      new java.util.concurrent.atomic.AtomicReference[Either[Throwable, Connection]]()
    val done = new java.util.concurrent.CountDownLatch(1)
    val claimed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val th = new Thread(() => {
      val r = try Right(connect()) catch { case t: Throwable => Left(t) }
      result.set(r)
      if (claimed.compareAndSet(false, true)) done.countDown()
      else // the waiter abandoned this connect: close, never leak
        r.foreach(c => try c.close() catch { case _: Exception => () })
    }, "graft-jdbc-cell-connect")
    th.setDaemon(true)
    th.start()
    val finished =
      try done.await(opTimeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      catch { case _: InterruptedException =>
        Thread.currentThread().interrupt(); false }
    if (finished) result.get().fold(throw _, identity)
    else if (claimed.compareAndSet(false, true)) {
      // abandonment claimed: the wedged connect's thread is ORPHANED (it
      // closes its own connection if one ever opens) — the caller's
      // thread is free, which is the whole point. An interrupt lands
      // here too (type-stable: the protocol above maps SQLException).
      // COUNTED (and logged): a healthy fleet claims ~zero abandonments,
      // so the gauge is how an operator tells "the coordination medium
      // wedges intermittently" from "healthy" before it wedges hard
      // enough to lose a lease (object doc; surfaced through
      // WarehouseLease.coordinationGauges → warehouseStatus).
      JdbcAtomicCell.orphanedConnects.incrementAndGet()
      JdbcAtomicCell.log.warn(
        "abandoned a wedged coordination-db connect after {} ms (cell {})",
        opTimeoutMs, cellName)
      throw new SQLException(
        s"JdbcAtomicCell: connect to the coordination database timed " +
          s"out (or the caller was interrupted) after <= $opTimeoutMs " +
          s"ms (cell $cellName)", "08001")
    }
    else
      // the connect finished in the instant between our timeout (or
      // interrupt) and our claim — it won delivery. Its result.set
      // happened-before its winning CAS, which happened-before our
      // failed CAS, so the result is visible WITHOUT another await
      // (which would throw immediately on a set interrupt flag and
      // leak the delivered connection).
      result.get().fold(throw _, identity)
  }

  JdbcAtomicCell.ensureTable(() => timedConnect(), table, stmtTimeoutSec)

  private def withConn[T](f: Connection => T): T = {
    val c = timedConnect()
    try f(c) finally c.close()
  }

  // X0Y32 = Derby "already exists"; 42P07/1050 are the Postgres/MySQL
  // equivalents — creation races (N media initializing at once) are
  // first-wins by design (see ensureTable)

  private def bounded[S <: Statement](st: S): S = {
    // a driver that does not support query timeouts must not turn every
    // call into a failure — the connect-side bound still holds there
    try st.setQueryTimeout(stmtTimeoutSec) catch { case _: SQLException => () }
    st
  }

  override def get(): Option[(String, String)] = withConn { c =>
    val st = bounded(c.prepareStatement(
      s"SELECT content, version FROM $table WHERE name = ?"))
    try {
      st.setString(1, cellName)
      val rs = st.executeQuery()
      // the FREE sentinel is the released state — absent to callers
      if (rs.next() && rs.getString(1) != FreeSentinel)
        Some((rs.getString(1), rs.getLong(2).toString))
      else None
    } finally st.close()
  }

  /** INSERT-or-CAS-from-sentinel: a name never seen gets a fresh row at
    * version 0; a released name's sentinel row is CASed back to live
    * content with `version + 1` — the version never restarts, which is
    * what closes the cross-generation ABA (object doc). Exactly one of N
    * racers wins either branch: the INSERT by the primary key, the
    * UPDATE by the row lock on the single sentinel-guarded statement.
    */
  override def putIfAbsent(content: String): Boolean = withConn { c =>
    val ins = bounded(c.prepareStatement(
      s"INSERT INTO $table (name, content, version) VALUES (?, ?, 0)"))
    val inserted =
      try {
        ins.setString(1, cellName)
        ins.setString(2, content)
        ins.executeUpdate() == 1
      } catch {
        // duplicate primary key (SQLState class 23) = the row exists
        // (live or sentinel) — fall through to the sentinel CAS
        case e: SQLException
          if Option(e.getSQLState).exists(_.startsWith("23")) => false
      } finally ins.close()
    inserted || {
      val st = bounded(c.prepareStatement(
        s"UPDATE $table SET content = ?, version = version + 1 " +
          "WHERE name = ? AND content = ?"))
      try {
        st.setString(1, content)
        st.setString(2, cellName)
        st.setString(3, FreeSentinel)
        st.executeUpdate() == 1
      } finally st.close()
    }
  }

  // both tag-guarded transitions also refuse the sentinel row: a live
  // cell's tag can never equal the sentinel's version (get() hides it, so
  // no caller ever reads that tag), but the guard makes resurrection
  // through putIfTag impossible by construction, not by convention
  override def putIfTag(tag: String, content: String): Boolean =
    tagAsLong(tag).exists { v =>
      withConn { c =>
        val st = bounded(c.prepareStatement(
          s"UPDATE $table SET content = ?, version = version + 1 " +
            "WHERE name = ? AND version = ? AND content <> ?"))
        try {
          st.setString(1, content)
          st.setString(2, cellName)
          st.setLong(3, v)
          st.setString(4, FreeSentinel)
          st.executeUpdate() == 1
        } finally st.close()
      }
    }

  /** Demote to the FREE sentinel with `version + 1` — never a DELETE:
    * the row (and its version lineage) lives as long as the table, so a
    * stale tag from before this release can never CAS against whatever
    * holds the name next (the generation-reset ABA, object doc).
    */
  override def deleteIfTag(tag: String): Boolean =
    tagAsLong(tag).exists { v =>
      withConn { c =>
        val st = bounded(c.prepareStatement(
          s"UPDATE $table SET content = ?, version = version + 1 " +
            "WHERE name = ? AND version = ? AND content <> ?"))
        try {
          st.setString(1, FreeSentinel)
          st.setString(2, cellName)
          st.setLong(3, v)
          st.setString(4, FreeSentinel)
          st.executeUpdate() == 1
        } finally st.close()
      }
    }

  // a foreign tag string (never produced by this cell) can match nothing —
  // answer false rather than throw, the same shape as a stale tag
  private def tagAsLong(tag: String): Option[Long] =
    try Some(tag.toLong) catch { case _: NumberFormatException => None }
}

object JdbcAtomicCell {

  private[core] val log =
    org.slf4j.LoggerFactory.getLogger("graft.core.JdbcAtomicCell")

  /** JVM-global count of connects ABANDONED by [[timedConnect]]'s claim
    * handshake (the wedged thread is orphaned; bounded at one per wedge
    * event because beats are tryLock-gated). Monotonic, never reset:
    * consumers diff across reads. A healthy medium sits at ~zero —
    * growth is the early-warning signature of an intermittently-wedging
    * coordination database, visible long before four-in-a-TTL loses a
    * lease. Surfaced as a `coordination` row of
    * [[graft.app.Governance.warehouseStatus]] via
    * [[WarehouseLease.coordinationGauges]].
    */
  val orphanedConnects = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Default bound on one cell operation (connect + statement): an order
    * of magnitude over a healthy coordination round-trip, far under any
    * lease ttl — so a wedged database reads as a failed beat (retried,
    * then LOST), never as a parked thread.
    */
  val DefaultOpTimeoutMs: Long = 10000L

  /** The released-cell row content. Reserved: `get()` reports a row
    * holding it as absent, and every write path refuses to treat it as
    * live content. Lease stamps (`owner|expiryMillis`) always contain a
    * '|' and can never collide with it.
    */
  private[core] val FreeSentinel = "__graft_free__"

  /** Identifier sanity for the table name — it is interpolated into DDL
    * (JDBC has no placeholder position for identifiers).
    */
  private def checkIdent(table: String): Unit =
    require(table.nonEmpty && table.forall(ch =>
      ch.isLetterOrDigit || ch == '_' || ch == '.'),
      s"JdbcAtomicCell: table name '$table' must be a plain identifier")

  private def ensureTable(connect: () => Connection, table: String,
                          stmtTimeoutSec: Int): Unit = {
    checkIdent(table)
    val c = connect()
    try {
      val st = c.createStatement()
      try {
        try st.setQueryTimeout(stmtTimeoutSec)
        catch { case _: SQLException => () }
        st.executeUpdate(
          s"CREATE TABLE $table (" +
            "name VARCHAR(512) NOT NULL PRIMARY KEY, " +
            "content VARCHAR(4096) NOT NULL, " +
            "version BIGINT NOT NULL)")
      } catch {
        // already exists — any SQLState; re-verify by probing the table
        // so a REAL failure (permissions, bad name) still surfaces
        case _: SQLException =>
          val probe = c.createStatement()
          try {
            try probe.setQueryTimeout(stmtTimeoutSec)
            catch { case _: SQLException => () }
            probe.executeQuery(s"SELECT 1 FROM $table WHERE 1 = 0")
          } finally probe.close()
      } finally st.close()
    } finally c.close()
  }

  private def sha16(s: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8"))
    d.take(8).map(b => f"$b%02x").mkString
  }

  /** A [[WarehouseLease]] medium factory over one coordination database:
    * each warehouse gets its own cell row (keyed by the normalized
    * warehouse URI), all in one table. Register it for the object-store
    * scheme and the lease protocol runs every transition through the
    * database's conditional writes:
    *
    * {{{
    * WarehouseLease.registerMedium("s3a",
    *   JdbcAtomicCell.mediumFactory("jdbc:postgresql://coord/leases"))
    * }}}
    *
    * The URL must reach a database every contending DRIVER can connect
    * to (Postgres/MySQL/RDS, or a Derby network server) — an embedded
    * Derby URL arbitrates only within one JVM (see the class doc).
    *
    * The cell name is a readable URI prefix plus a SHA-256 digest of the
    * FULL normalized URI — never a bare truncation, which would silently
    * serialize two warehouses sharing a long common prefix on one cell
    * (safe direction, but a surprise nobody should debug).
    *
    * MIGRATION NOTE: the naming scheme changed in this version (it was a
    * bare 512-char truncation before). A fleet upgrading across the
    * change must drain writers first: a pre-change driver arbitrates on
    * the old row, a post-change one on the new row, and the two would
    * not see each other's leases. Same-version fleets are unaffected.
    */
  def mediumFactory(url: String, table: String = "graft_lease_cells",
                    opTimeoutMs: Long = DefaultOpTimeoutMs)
      : (SparkSession, String) => WarehouseLease.LeaseMedium = {
    checkIdent(table)
    (_, warehouse) => {
      val norm = new org.apache.hadoop.fs.Path(warehouse).toUri.toString
      new WarehouseLease.CasLeaseMedium(
        new JdbcAtomicCell(() => DriverManager.getConnection(url), table,
          s"${norm.take(480)}#${sha16(norm)}", opTimeoutMs))
    }
  }
}
