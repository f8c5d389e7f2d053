package graft

import java.nio.file.Files

import graft.app.CorpusIngest
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The COMPOSITION race (SoakRaceMain body): lease + swap token + ledger
  * publishes + keyed idempotent appends, raced TOGETHER across real JVM
  * boundaries under a seeded-random SIGKILL schedule, with lease-free
  * readers interleaved. The per-protocol suites (LeaseSpec, SwapRaceSpec,
  * the model property) prove each seam in isolation; protocol bugs that
  * survive those live in the composition — a crash landing between two
  * protocols' commit points, a reader consulting one protocol's state
  * while another's is torn. The postcondition is the deployment claim in
  * full: after kills at arbitrary points, re-running the killed drop +
  * repair returns the warehouse healthy, and every survivor view equals
  * an uninterrupted control run's, row for row.
  */
class SoakRaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def forkWriter(args: Seq[String], log: java.io.File): Process = {
    val java = System.getProperty("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    new ProcessBuilder(
      (Seq(java) ++ addOpens ++ Seq("-Xmx3g",
        "-cp", System.getProperty("java.class.path"),
        "graft.SoakRaceMain") ++ args): _*)
      .redirectErrorStream(true)
      .redirectOutput(ProcessBuilder.Redirect.appendTo(log))
      .start()
  }

  private def events(path: String): Seq[String] = {
    val p = java.nio.file.Paths.get(path)
    if (Files.exists(p))
      Files.readAllLines(p).toArray.toSeq.map(_.toString)
    else Seq.empty
  }

  test("cross-JVM mixed-workload soak: random-point kills + lease-free readers; repair heals and survivors equal an uninterrupted control") {
    // seeded schedule — reproducible, overridable for exploring other
    // kill points (SOAK_SEED env); the default seed is arbitrary
    val seed = sys.env.get("SOAK_SEED").map(_.toLong).getOrElse(20260816L)
    val rnd = new scala.util.Random(seed)

    // ---- control: the same plan, uninterrupted, in this JVM ----
    val controlWh = Files.createTempDirectory("soak-control-wh").toString
    (0 until SoakRaceMain.NumDrops)
      .foreach(k => SoakRaceMain.applyDrop(spark, controlWh, k))

    // ---- soak: forked writer, killed at seeded-random points ----
    val soakWh = Files.createTempDirectory("soak-race-wh").toString
    val eventsFile = s"$soakWh.events"
    val log = new java.io.File(s"$soakWh.writer.log")
    def logTail = new String(Files.readAllBytes(log.toPath), "UTF-8")
      .linesIterator.toSeq.takeRight(30).mkString("\n")
    val leaseTtlMs = 4000L
    var kills = 0
    val maxKills = 3
    // vanished-file race: the one failure class a lease-free CORPUS
    // read may surface when a concurrent writer's swap renames files
    // away mid-scan — retry-class by contract (fsck retries it
    // internally; survivors callers retry like the other documented
    // verdicts)
    def vanished(t: Throwable): Boolean = {
      var c = t; var d = 0
      while (c != null && d < 20) {
        if (c.isInstanceOf[java.io.FileNotFoundException]) return true
        val m = c.getMessage
        if (m != null && (m.contains("FileNotFoundException") ||
            m.contains("PATH_NOT_FOUND"))) return true
        c = c.getCause; d += 1
      }
      false
    }
    // lease-free readers against the LIVE writer: status and fsck must
    // complete; survivors may refuse only with a documented verdict or
    // the vanished-file retry class
    def liveReaderPass(): Unit = {
      CorpusIngest.warehouseStatus(spark, soakWh).collect()
      CorpusIngest.fsck(spark, soakWh).collect()
      try CorpusIngest.survivors(spark, soakWh).collect()
      catch {
        case e: IllegalStateException
          if e.getMessage.contains("mid-swap") ||
            e.getMessage.contains("crash-parked") ||
            e.getMessage.contains("torn store create") => ()
        case e: Throwable if vanished(e) => ()
      }
    }
    while (kills < maxKills && !events(eventsFile).contains("all-done")) {
      val before = events(eventsFile).count(_.startsWith("drop-start"))
      // aim each kill at a seeded-random TARGET drop so the schedule
      // spreads across the whole plan (ingests, deletes, the swap
      // cascade) instead of always landing in the first drop's
      // cold-start window; a target the resume has already passed
      // degrades to "kill wherever the writer currently is" — still a
      // valid point. The LAST kill always aims at the snapshot/export
      // tail, so the commit-marker-last publish protocol is raced under
      // composition on every run, not only when the seed happens to
      // land there.
      val targetDrop =
        if (kills == maxKills - 1)
          SoakRaceMain.NumDrops - 2 + rnd.nextInt(2)
        else rnd.nextInt(SoakRaceMain.NumDrops)
      val p = forkWriter(Seq("write", soakWh, eventsFile,
        leaseTtlMs.toString, "wedge"), log)
      def lastStart: Int = events(eventsFile)
        .filter(_.startsWith("drop-start "))
        .lastOption
        .map(_.stripPrefix("drop-start ").trim.split("\\s+")(0).toInt)
        .getOrElse(-1)
      // phase 1: the writer must enter SOME drop this incarnation
      val deadline = System.currentTimeMillis() + 180000L
      while (p.isAlive &&
          events(eventsFile).count(_.startsWith("drop-start")) <= before &&
          !events(eventsFile).contains("all-done")) {
        assert(System.currentTimeMillis() < deadline,
          s"writer never started a drop; log tail:\n$logTail")
        Thread.sleep(50L)
      }
      // phase 2: give it a bounded window to reach the target drop,
      // then kill a seeded-random interval into whatever it is doing —
      // the kill lands wherever the ingest call tree happens to be
      // (ledger publish, bucketed append, swap rename, audit append, ...)
      // While waiting, run lease-free readers against the LIVE writer —
      // the multi-host deployment shape (writers under lease, readers
      // elsewhere) that the post-kill readers below never exercise:
      // status and fsck must COMPLETE mid-swap (fsck retries the
      // vanished-file race internally), survivors may refuse only with
      // a documented verdict
      val reachBy = System.currentTimeMillis() + 60000L
      var livePasses = 0
      while (p.isAlive && lastStart < targetDrop &&
          System.currentTimeMillis() < reachBy &&
          !events(eventsFile).contains("all-done")) {
        liveReaderPass()
        livePasses += 1
        Thread.sleep(50L)
      }
      assert(livePasses > 0 || lastStart >= targetDrop ||
        events(eventsFile).contains("all-done"),
        "no live-reader pass ran and the writer never progressed")
      if (p.isAlive && !events(eventsFile).contains("all-done")) {
        Thread.sleep(rnd.nextInt(6000).toLong)
        p.destroyForcibly()
        p.waitFor()
        kills += 1
        // lease-free readers against the crash-state warehouse: status
        // and fsck must complete (their whole design is to be safe on a
        // torn warehouse); the curated view may refuse with one of the
        // two DOCUMENTED verdicts while a table is parked or a swap
        // credible — anything else is a reader bug
        CorpusIngest.warehouseStatus(spark, soakWh).collect()
        CorpusIngest.fsck(spark, soakWh).collect()
        try CorpusIngest.survivors(spark, soakWh).collect()
        catch {
          case e: IllegalStateException
            if e.getMessage.contains("mid-swap") ||
              e.getMessage.contains("crash-parked") ||
              e.getMessage.contains("torn store create") => ()
          // a kill during the FIRST drop can leave the warehouse with no
          // doc store at all — absent is a legitimate pre-first-commit
          // state, distinct from the parked/in-flight/torn verdicts
          case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") => ()
        }
      } else p.waitFor()
    }
    // final pass: restart into a CONTENDING WRITER PAIR (VERDICT r19
    // #4) — the multi-host deployment has a second writer racing for
    // the lease at the instant of a crash, and the per-protocol
    // LeaseSpec units never composed that handoff with real drops.
    // Both contenders start into the LAST KILL's crash state (the dead
    // incarnation's unexpired lease stamp is the first thing both must
    // reclaim-race), then contend drop by drop to plan completion: one
    // wins each acquire, the loser must refuse LOUDLY (a `lease-held`
    // event — never a silent co-write) and retry into useful work —
    // skipping drops the winner finished (the per-drop done-set
    // re-read) or no-op-replaying them idempotently.
    val pairRan = !events(eventsFile).contains("all-done")
    if (pairRan) {
      val pa = forkWriter(Seq("write", soakWh, eventsFile,
        leaseTtlMs.toString, "wedge", "pairA"), log)
      val pb = forkWriter(Seq("write", soakWh, eventsFile,
        leaseTtlMs.toString, "wedge", "pairB"), log)
      val deadline = System.currentTimeMillis() + 300000L
      while (!events(eventsFile).contains("all-done")) {
        assert(System.currentTimeMillis() < deadline,
          s"contending pair never completed; log tail:\n$logTail")
        assert(pa.isAlive || pb.isAlive ||
          events(eventsFile).contains("all-done"),
          s"both pair writers died; log tail:\n$logTail")
        // keep racing the live readers through the contending pass
        // too — this phase runs the snapshot/export publishes
        liveReaderPass()
        Thread.sleep(200L)
      }
      // BOTH contenders must exit cleanly: the loser's documented
      // life is refuse-retry-progress, never an unhandled refusal
      assert(pa.waitFor() == 0,
        s"pair writer A exited nonzero; log tail:\n$logTail")
      assert(pb.waitFor() == 0,
        s"pair writer B exited nonzero; log tail:\n$logTail")
      // the handoff was a real contention, observably: at least one
      // loud refusal from a pair contender, or interleaved completions
      // from both ids (two simultaneous JVMs over a multi-drop plan
      // cannot BOTH avoid the lease and the work without one of these)
      val pairRefusals = events(eventsFile).filter(e =>
        e.startsWith("lease-held ") &&
          (e.endsWith(" pairA") || e.endsWith(" pairB")))
      val pairDoneIds = events(eventsFile)
        .filter(_.startsWith("drop-done "))
        .map(_.split("\\s+"))
        .collect { case a if a.length > 2 => a(2) }.toSet
      assert(pairRefusals.nonEmpty || pairDoneIds.size == 2,
        "contending pair showed no contention: no lease-held refusal " +
          s"and work from only $pairDoneIds; log tail:\n$logTail")
    }
    assert(kills > 0, "schedule never killed the writer — not a soak")
    // the writers ran with the WEDGED medium (every 3rd lease refresh
    // stalled ~2 beat periods): the skipped-beats gauge must have moved
    // in at least one writer incarnation — the coordination-health
    // instrumentation observed under real mixed load + kills, not just
    // the unit wedge cases. Gauges are JVM-scoped, so they arrive via
    // the writers' own `gauges <orphaned> <skipped>` events.
    val skipped = events(eventsFile).filter(_.startsWith("gauges "))
      .map(_.split(' ')(2).toLong)
    assert(skipped.nonEmpty && skipped.max > 0L,
      s"wedged medium never registered a skipped beat: gauges=$skipped")

    // ---- heal + audit: repair, then fsck must return healthy ----
    CorpusIngest.repair(spark, soakWh)
    val bad = CorpusIngest.fsck(spark, soakWh)
      .filter(col("violations") > 0)
      .select("check", "severity")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(!bad.exists(_._2 == "error"),
      s"errors after repair: $bad\nwriter log tail:\n$logTail")
    // the one warn class that may legitimately survive: a kill between
    // the audit seq-ledger stamp and its row append makes the trail
    // under-report that event forever — the DOCUMENTED crash window,
    // correctly surfaced, unhealable by design (the information is gone)
    val allowedWarns = Set("audit_seq_gaps", "audit_seq_ledger_ahead")
    assert(bad.forall(b => allowedWarns.contains(b._1)),
      s"unexpected residue after repair: $bad")

    // ---- survivors hash-equal the uninterrupted control ----
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.toSeq
      df.select(cols.map(col): _*).collect()
        .map(_.toSeq.mkString("|")).sorted.toSeq
    }
    def compare(name: String,
                view: (org.apache.spark.sql.SparkSession, String) =>
                  org.apache.spark.sql.DataFrame): Unit = {
      val c = rows(view(spark, controlWh))
      val s = rows(view(spark, soakWh))
      assert(c == s,
        s"$name diverged from control (control ${c.size} rows, soak " +
          s"${s.size}); first diff: ${
            c.zipAll(s, "<missing>", "<extra>").find(p => p._1 != p._2)}")
    }
    compare("survivors", CorpusIngest.survivors)
    compare("embSurvivors", CorpusIngest.embSurvivors)
    compare("mediaSurvivors", CorpusIngest.mediaSurvivors)
    compare("datacard", CorpusIngest.datacard)
    // the pinned artifacts: the snapshot census, the export census
    // (stamps, lineage, counts — all explicit-stamped so byte-equal by
    // design), the export's full pinned placement (manifest ⋈ docs),
    // and the trainer's pre-run shard integrity view
    compare("snapshots", graft.app.CorpusSnapshots.listCorpusSnapshots)
    compare("exports", graft.app.CorpusExports.listCorpusExports)
    // the contending pair (and every crash retry before it) never
    // DOUBLE-COMMITS an explicitly-stamped artifact: exactly one
    // committed census row per stamp, however many incarnations raced
    // the publish
    assert(graft.app.CorpusSnapshots.listCorpusSnapshots(spark, soakWh)
      .where(col("snap_ts") === SoakRaceMain.SnapTs).count() == 1L,
      "snapshot stamp double-committed")
    assert(graft.app.CorpusExports.listCorpusExports(spark, soakWh)
      .where(col("export_ts") === SoakRaceMain.ExportTs).count() == 1L,
      "export stamp double-committed")
    compare("exportRead", (s, wh) =>
      graft.app.CorpusExports.readExport(s, wh, SoakRaceMain.ExportTs))
    compare("exportIntegrity", (s, wh) =>
      graft.app.CorpusExports.exportIntegrity(s, wh, SoakRaceMain.ExportTs))
    graft.core.GraftCaches.releaseAll(spark)
  }
}
