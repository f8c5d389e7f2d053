package graft

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.core.WarehouseLease
import org.apache.spark.sql.SparkSession

/** Forked-JVM body for LeaseSpec's CROSS-PROCESS races — the shape the
  * single-writer guarantee actually defends (N drivers on N hosts), which
  * in-process thread races can never exercise: separate heartbeat pools,
  * separate `held` maps, separate JVM owners, real process death.
  *
  * Modes:
  *   - `file <warehouse> <eventsFile> <owner> <iters>` — contend for the
  *     warehouse through the file medium (`awaitWriteLease`, so a busy
  *     warehouse delays rather than fails); while holding, append
  *     `enter <owner>` / `exit <owner>` lines to the shared events file.
  *     Appends are single small O_APPEND writes on a local posix fs, so
  *     FILE ORDER is the global order of the writes — the parent asserts
  *     strict enter/exit alternation from it.
  *   - `derby-boot <jdbcUrl>` — attempt to open an embedded-Derby
  *     database another process has booted. Embedded Derby is
  *     single-JVM; the asserted contract (JdbcAtomicCell doc) is that the
  *     second process is refused LOUDLY (exit 0 after an SQLException),
  *     never admitted as a silent second coordinator (exit 2).
  */
object LeaseRaceMain {

  private def logEvent(eventsFile: String, line: String): Unit =
    Files.write(Paths.get(eventsFile), (line + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE,
      StandardOpenOption.APPEND)

  def main(args: Array[String]): Unit = args(0) match {
    case "file" =>
      val Array(_, warehouse, eventsFile, owner, iters) = args
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName(s"lease-race-$owner")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
      try {
        (0 until iters.toInt).foreach { i =>
          WarehouseLease.awaitWriteLease(spark, warehouse, owner = owner,
            ttlMs = 60000L, timeoutMs = 180000L, pollMs = 100L) {
            logEvent(eventsFile, s"enter $owner $i")
            Thread.sleep(120L) // a window wide enough to catch an intruder
            logEvent(eventsFile, s"exit $owner $i")
          }
        }
      } finally spark.stop()
      sys.exit(0)

    case "derby-boot" =>
      try {
        val c = java.sql.DriverManager.getConnection(args(1))
        c.close()
        System.err.println(
          "SECOND PROCESS BOOTED AN EMBEDDED DERBY ALREADY HELD ELSEWHERE")
        sys.exit(2)
      } catch {
        case e: java.sql.SQLException =>
          println(s"REFUSED ${e.getSQLState}: ${e.getMessage}")
          sys.exit(0)
      }

    case other =>
      System.err.println(s"unknown mode $other")
      sys.exit(3)
  }
}
