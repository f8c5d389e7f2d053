package graft.core

import java.sql.{Connection, DriverManager, SQLException}

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
  * Connections are per-call — lease traffic is a handful of statements
  * per heartbeat period, so pooling would be tuning noise; a deployment
  * with a shared pool can pass a `connect` thunk instead of a URL. Give
  * the thunk connect/read TIMEOUTS (JDBC login timeout, driver socket
  * timeout): `DriverManager` sets none by default, and while the lease
  * protocol detects a HANGING database too (the holder's exit checks
  * beat health and throws LeaseLostException without deadlocking — see
  * WarehouseLease's failure-semantics doc), a timed-out call frees the
  * heartbeat thread where a wedged one parks it for the connection's
  * lifetime.
  */
final class JdbcAtomicCell(connect: () => Connection, table: String,
                           cellName: String)
    extends WarehouseLease.AtomicCell {

  def this(url: String, table: String, cellName: String) =
    this(() => DriverManager.getConnection(url), table, cellName)

  // X0Y32 = Derby "already exists"; 42P07/1050 are the Postgres/MySQL
  // equivalents — creation races (N media initializing at once) are
  // first-wins by design
  JdbcAtomicCell.ensureTable(connect, table)

  import JdbcAtomicCell.FreeSentinel

  private def withConn[T](f: Connection => T): T = {
    val c = connect()
    try f(c) finally c.close()
  }

  override def get(): Option[(String, String)] = withConn { c =>
    val st = c.prepareStatement(
      s"SELECT content, version FROM $table WHERE name = ?")
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
    val ins = c.prepareStatement(
      s"INSERT INTO $table (name, content, version) VALUES (?, ?, 0)")
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
      val st = c.prepareStatement(
        s"UPDATE $table SET content = ?, version = version + 1 " +
          "WHERE name = ? AND content = ?")
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
        val st = c.prepareStatement(
          s"UPDATE $table SET content = ?, version = version + 1 " +
            "WHERE name = ? AND version = ? AND content <> ?")
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
        val st = c.prepareStatement(
          s"UPDATE $table SET content = ?, version = version + 1 " +
            "WHERE name = ? AND version = ? AND content <> ?")
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

  private def ensureTable(connect: () => Connection, table: String): Unit = {
    checkIdent(table)
    val c = connect()
    try {
      val st = c.createStatement()
      try st.executeUpdate(
        s"CREATE TABLE $table (" +
          "name VARCHAR(512) NOT NULL PRIMARY KEY, " +
          "content VARCHAR(4096) NOT NULL, " +
          "version BIGINT NOT NULL)")
      catch {
        // already exists — any SQLState; re-verify by probing the table
        // so a REAL failure (permissions, bad name) still surfaces
        case _: SQLException =>
          val probe = c.createStatement()
          try probe.executeQuery(s"SELECT 1 FROM $table WHERE 1 = 0")
          finally probe.close()
      } finally st.close()
    } finally c.close()
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
    */
  def mediumFactory(url: String, table: String = "graft_lease_cells")
      : (SparkSession, String) => WarehouseLease.LeaseMedium = {
    checkIdent(table)
    (_, warehouse) =>
      new WarehouseLease.CasLeaseMedium(
        new JdbcAtomicCell(url, table,
          new org.apache.hadoop.fs.Path(warehouse).toUri.toString.take(512)))
  }
}
