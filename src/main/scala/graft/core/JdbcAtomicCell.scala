package graft.core

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.spark.sql.SparkSession

/** Reference [[WarehouseLease.AtomicCell]] over a JDBC one-row-per-cell
  * table — the shipped production backend for the CAS lease seam on
  * warehouses whose own filesystem has no atomic primitive (object
  * stores). Any transactional database reachable over JDBC works; the
  * embedded Derby already on the Spark classpath makes it usable with
  * zero extra infrastructure, and the same SQL runs on Postgres/MySQL/
  * RDS — the coordination database a cloud deployment of the reference
  * pipeline would already have (its dimension sink is a MySQL RDS:
  * v2022/etl-containers/reference-data/src/reference_data_etl.py:60-67).
  *
  * Soundness: every transition is ONE conditional statement — an INSERT
  * guarded by the primary key, or an UPDATE/DELETE guarded by
  * `version = ?` — so the database's atomicity makes each a true
  * compare-and-swap: of N racers conditioning on one version tag, the
  * row lock admits exactly one, the rest see update-count 0. No settle
  * delays, no residual windows — the property LeaseSpec races (both with
  * the in-memory cell and with this one).
  *
  * The version column is a monotonically increasing BIGINT bumped by
  * every successful replace; its decimal string is the opaque tag
  * [[WarehouseLease.AtomicCell]] promises. Reuse after delete+recreate is
  * harmless: a tag is only ever compared against the CURRENT row (the
  * guarded UPDATE), never across generations.
  *
  * Connections are per-call — lease traffic is a handful of statements
  * per heartbeat period, so pooling would be tuning noise; a deployment
  * with a shared pool can pass a `connect` thunk instead of a URL.
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
      if (rs.next()) Some((rs.getString(1), rs.getLong(2).toString))
      else None
    } finally st.close()
  }

  override def putIfAbsent(content: String): Boolean = withConn { c =>
    val st = c.prepareStatement(
      s"INSERT INTO $table (name, content, version) VALUES (?, ?, 0)")
    try {
      st.setString(1, cellName)
      st.setString(2, content)
      st.executeUpdate() == 1
    } catch {
      // duplicate primary key (SQLState class 23) = the cell exists —
      // the loser's answer, not an error
      case e: SQLException if Option(e.getSQLState).exists(_.startsWith("23")) =>
        false
    } finally st.close()
  }

  override def putIfTag(tag: String, content: String): Boolean =
    tagAsLong(tag).exists { v =>
      withConn { c =>
        val st = c.prepareStatement(
          s"UPDATE $table SET content = ?, version = version + 1 " +
            "WHERE name = ? AND version = ?")
        try {
          st.setString(1, content)
          st.setString(2, cellName)
          st.setLong(3, v)
          st.executeUpdate() == 1
        } finally st.close()
      }
    }

  override def deleteIfTag(tag: String): Boolean =
    tagAsLong(tag).exists { v =>
      withConn { c =>
        val st = c.prepareStatement(
          s"DELETE FROM $table WHERE name = ? AND version = ?")
        try {
          st.setString(1, cellName)
          st.setLong(2, v)
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
    *   JdbcAtomicCell.mediumFactory("jdbc:derby:/coord/leases;create=true"))
    * }}}
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
