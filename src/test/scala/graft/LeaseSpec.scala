package graft

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch}
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import graft.core.WarehouseLease
import org.scalatest.funsuite.AnyFunSuite

/** Arbitration-primitive proofs for the pluggable lease media: the
  * check-then-put hazard the object-store refusal guards, the
  * single-winner property of the CAS medium under racing writers, the
  * rename-claim reclaim on atomic-rename filesystems, and the CoordDir
  * escape hatch. DurabilitySpec covers the protocol ABOVE the media
  * (re-entrancy, heartbeat, loss surfacing); this suite attacks the
  * primitives themselves.
  */
class LeaseSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** In-memory conditional-write cell — the exact S3 conditional PUT
    * shape (If-None-Match on create, If-Match: etag on replace/delete).
    * Tags are monotonic across delete/recreate generations, per the
    * AtomicCell contract note (a recreate must never reissue a tag a
    * stalled holder could replay from a prior generation).
    */
  private final class MemCell extends WarehouseLease.AtomicCell {
    private val ref = new AtomicReference[Option[(String, Long)]](None)
    private val gen = new java.util.concurrent.atomic.AtomicLong(0L)
    override def get(): Option[(String, String)] =
      ref.get().map { case (c, v) => (c, v.toString) }
    override def putIfAbsent(content: String): Boolean =
      ref.compareAndSet(None, Some((content, gen.incrementAndGet() * 1000000L)))
    override def putIfTag(tag: String, content: String): Boolean = {
      val cur = ref.get()
      cur match {
        case Some((_, v)) if v.toString == tag =>
          ref.compareAndSet(cur, Some((content, v + 1L)))
        case _ => false
      }
    }
    override def deleteIfTag(tag: String): Boolean = {
      val cur = ref.get()
      cur match {
        case Some((_, v)) if v.toString == tag => ref.compareAndSet(cur, None)
        case _ => false
      }
    }
  }

  private def race[T](n: Int)(body: Int => T): Seq[T] = {
    val start = new CountDownLatch(1)
    val out = new ConcurrentHashMap[Int, T]()
    val threads = (0 until n).map { i =>
      new Thread(() => { start.await(); out.put(i, body(i)) })
    }
    threads.foreach(_.start())
    start.countDown()
    threads.foreach(_.join(30000L))
    (0 until n).flatMap(i => Option(out.get(i)))
  }

  test("the hazard: check-then-put create-no-overwrite admits MULTIPLE winners") {
    // this is what fs.create(path, overwrite = false) compiles to on S3A:
    // a HEAD check followed by an unconditional PUT. With any scheduling
    // gap between the two, racing writers all pass the check — the
    // arbitration the lease used to rely on simply does not exist there,
    // which is why unknown schemes now REFUSE instead.
    val cell = new AtomicReference[Option[String]](None)
    def checkThenPut(content: String): Boolean =
      if (cell.get().isDefined) false
      else { Thread.sleep(25L); cell.set(Some(content)); true } // HEAD .. PUT
    val winners = race(8)(i => checkThenPut(s"writer-$i")).count(identity)
    assert(winners >= 2,
      s"expected the broken primitive to admit multiple winners, got $winners")
  }

  test("CAS medium: exactly one of N racing acquirers holds; reclaim of an expired lease has exactly one winner") {
    val cells = new ConcurrentHashMap[String, MemCell]()
    WarehouseLease.registerMedium("mem", (_, wh) =>
      new WarehouseLease.CasLeaseMedium(
        cells.computeIfAbsent(wh, _ => new MemCell)))
    try {
      val wh = "mem://bucket/warehouse-a"
      // fresh-cell race: N writers, one winner
      val okA = new AtomicInteger(0)
      val heldA = new AtomicInteger(0)
      race(16) { i =>
        try { WarehouseLease.acquire(spark, wh, owner = s"w$i",
          ttlMs = 60000L); okA.incrementAndGet() }
        catch { case _: WarehouseLease.LeaseHeldException =>
          heldA.incrementAndGet() }
      }
      assert(okA.get() == 1 && heldA.get() == 15,
        s"acquire race: ${okA.get()} winners, ${heldA.get()} refused")

      // expired-lease reclaim race: N writers against one stale stamp,
      // exactly one single-winner CAS succeeds
      val wh2 = "mem://bucket/warehouse-b"
      WarehouseLease.acquire(spark, wh2, owner = "dead", ttlMs = -1000L)
      val okB = new AtomicInteger(0)
      val heldB = new AtomicInteger(0)
      race(16) { i =>
        try { WarehouseLease.acquire(spark, wh2, owner = s"r$i",
          ttlMs = 60000L); okB.incrementAndGet() }
        catch { case _: WarehouseLease.LeaseHeldException =>
          heldB.incrementAndGet() }
      }
      assert(okB.get() == 1 && heldB.get() == 15,
        s"reclaim race: ${okB.get()} winners, ${heldB.get()} refused")
    } finally WarehouseLease.unregisterMedium("mem")
  }

  test("CAS medium: withWriteLease lifecycle — heartbeat refreshes, contender refused, release empties the cell") {
    val cells = new ConcurrentHashMap[String, MemCell]()
    WarehouseLease.registerMedium("mem", (_, wh) =>
      new WarehouseLease.CasLeaseMedium(
        cells.computeIfAbsent(wh, _ => new MemCell)))
    try {
      val wh = "mem://bucket/warehouse-c"
      WarehouseLease.withWriteLease(spark, wh, owner = "holder",
        ttlMs = 600L) {
        Thread.sleep(1500L) // several beat periods past the raw ttl
        // the CAS refresh kept us live: a contender is refused
        intercept[WarehouseLease.LeaseHeldException] {
          WarehouseLease.acquire(spark, wh, owner = "contender",
            ttlMs = 1000L)
        }
      }
      // released on exit: the cell is empty and a fresh writer enters
      assert(cells.get(wh).get().isEmpty, "release must empty the cell")
      WarehouseLease.acquire(spark, wh, owner = "next", ttlMs = 1000L)
      WarehouseLease.release(spark, wh, owner = "next")
    } finally WarehouseLease.unregisterMedium("mem")
  }

  test("JDBC cell: raw CAS — of N racers on one version tag exactly one wins each transition") {
    val url = s"jdbc:derby:${java.nio.file.Files
      .createTempDirectory("lease-jdbc-raw")}/db;create=true"
    val cell = new graft.core.JdbcAtomicCell(url, "graft_lease_cells", "c1")
    // create race
    val created = race(8)(i => cell.putIfAbsent(s"w$i")).count(identity)
    assert(created == 1, s"putIfAbsent admitted $created winners")
    // replace race on ONE observed tag — a true CAS admits exactly one
    val tag0 = cell.get().get._2
    val replaced = race(8)(i => cell.putIfTag(tag0, s"r$i")).count(identity)
    assert(replaced == 1, s"putIfTag admitted $replaced winners")
    // the losers' stale tag can no longer delete
    assert(!cell.deleteIfTag(tag0), "stale tag must not delete")
    // foreign tag strings answer false, never throw
    assert(!cell.putIfTag("not-a-tag", "x") && !cell.deleteIfTag("nope"))
    // delete race on the current tag
    val tag1 = cell.get().get._2
    val deleted = race(8)(_ => cell.deleteIfTag(tag1)).count(identity)
    assert(deleted == 1 && cell.get().isEmpty,
      s"deleteIfTag admitted $deleted winners")
    // a SECOND cell name in the same table is independent
    val other = new graft.core.JdbcAtomicCell(url, "graft_lease_cells", "c2")
    assert(other.putIfAbsent("x") && cell.get().isEmpty)
  }

  test("JDBC cell: a stalled holder's pre-delete tag cannot CAS against a successor generation") {
    // The generation-reset ABA (round-15 verdict): CasLeaseMedium.refresh
    // is get-then-CAS in two statements, so a holder can stall between
    // them across expire → reclaim → release → re-acquire. If a recreate
    // restarted the version at 0, the stalled holder's tag "0" would
    // match the SUCCESSOR's fresh row and both would believe they hold
    // the lease. The fix: release demotes to a FREE-sentinel row with
    // version + 1 (never DELETE), create CASes the sentinel back with
    // version + 1 — monotonic per name for the table's lifetime, so a
    // pre-delete tag is strictly smaller than anything that follows.
    val url = s"jdbc:derby:${java.nio.file.Files
      .createTempDirectory("lease-jdbc-gen")}/db;create=true"
    val cell = new graft.core.JdbcAtomicCell(url, "graft_lease_cells", "gen")
    assert(cell.putIfAbsent("A"))              // generation 1
    val stalledTag = cell.get().get._2         // A's beat reads, then stalls
    assert(cell.putIfTag(stalledTag, "B"))     // B reclaims A's expired lease
    val bTag = cell.get().get._2
    assert(cell.deleteIfTag(bTag))             // B releases
    assert(cell.get().isEmpty, "released cell must read absent")
    assert(cell.putIfAbsent("C"))              // C acquires generation 2
    val cTag = cell.get().get._2
    assert(cTag.toLong > bTag.toLong,
      s"the version must be monotonic across generations, got $cTag after $bTag")
    // A's stalled CAS from generation 1 wakes up: both transitions must
    // be refused, and C's row must be untouched
    assert(!cell.putIfTag(stalledTag, "A-again"),
      "a pre-delete tag must never match a successor generation's row")
    assert(!cell.deleteIfTag(stalledTag),
      "a pre-delete tag must never delete a successor generation's row")
    assert(cell.get().contains(("C", cTag)))
    // the recreate race over a released (sentinel) row is single-winner
    assert(cell.deleteIfTag(cTag))
    val winners = race(8)(i => cell.putIfAbsent(s"w$i")).count(identity)
    assert(winners == 1, s"sentinel-recreate race admitted $winners winners")
  }

  test("JDBC cell: a coordination db dying mid-hold marks the lease LOST, never silently held") {
    // The asserted semantics (JdbcAtomicCell doc): while the medium is
    // unreachable the beat retries silently as long as the last published
    // stamp is in date; past one full ttl without a successful beat the
    // holder cannot rule out an unseen reclaim, so the holding call
    // throws LeaseLostException at exit — and the release failure on the
    // way out is swallowed (the stamp expires by ttl), never allowed to
    // mask that loss.
    val dbdir = java.nio.file.Files.createTempDirectory("lease-jdbc-dead")
    val url = s"jdbc:derby:$dbdir/db;create=true"
    val failing = new java.util.concurrent.atomic.AtomicBoolean(false)
    val connect: () => java.sql.Connection = () => {
      if (failing.get()) throw new java.sql.SQLException("coordination db down")
      java.sql.DriverManager.getConnection(url)
    }
    val media = new ConcurrentHashMap[String, WarehouseLease.LeaseMedium]()
    WarehouseLease.registerMedium("deadjdbc", (_, wh) =>
      media.computeIfAbsent(wh, _ => new WarehouseLease.CasLeaseMedium(
        new graft.core.JdbcAtomicCell(connect, "graft_lease_cells", wh))))
    try {
      val wh = "deadjdbc://bucket/warehouse"
      val bodyRan = new AtomicInteger(0)
      intercept[WarehouseLease.LeaseLostException] {
        WarehouseLease.withWriteLease(spark, wh, owner = "holder",
          ttlMs = 600L) {
          bodyRan.incrementAndGet()
          failing.set(true)   // the db dies mid-hold
          Thread.sleep(1600L) // > ttl with zero successful beats
        }
      }
      assert(bodyRan.get() == 1, "the body must have run exactly once")
      // once the db is back, the stale stamp is reclaimable by a fresh
      // owner — the dead-db episode blocked the warehouse for one ttl,
      // nothing worse
      failing.set(false)
      WarehouseLease.acquire(spark, wh, owner = "next", ttlMs = 60000L)
      WarehouseLease.release(spark, wh, owner = "next")
    } finally WarehouseLease.unregisterMedium("deadjdbc")
  }

  test("a medium that WEDGES mid-hold is lost loudly at exit, never deadlocked or silently held") {
    // a HANGING medium (a blocking connect with no timeout — what
    // DriverManager gives by default) parks the beat thread inside the
    // call, so the beat can never report its own staleness. The asserted
    // semantics: the exit itself checks beat health — one full ttl
    // without a successful beat throws LeaseLostException — and its wait
    // for the wedged beat's lock is BOUNDED, so the exit returns instead
    // of deadlocking (the release is skipped; the stamp expires by ttl).
    val wedge = new java.util.concurrent.atomic.AtomicBoolean(false)
    val inner = new MemCell
    val cell = new WarehouseLease.AtomicCell {
      // park forever (beats run on single-use daemon threads — the one
      // that wedges here is orphaned; the scheduler pool never sees it)
      private def gate(): Unit =
        if (wedge.get()) new CountDownLatch(1).await()
      override def get(): Option[(String, String)] = { gate(); inner.get() }
      override def putIfAbsent(c: String): Boolean =
        { gate(); inner.putIfAbsent(c) }
      override def putIfTag(t: String, c: String): Boolean =
        { gate(); inner.putIfTag(t, c) }
      override def deleteIfTag(t: String): Boolean =
        { gate(); inner.deleteIfTag(t) }
    }
    WarehouseLease.registerMedium("wedgemem",
      (_, _) => new WarehouseLease.CasLeaseMedium(cell))
    try {
      val skippedBefore = WarehouseLease.coordinationGauges.toMap
        .apply("skipped_beats_jvm")
      val t0 = System.currentTimeMillis()
      intercept[WarehouseLease.LeaseLostException] {
        WarehouseLease.withWriteLease(spark, "wedgemem://bucket/wh",
          owner = "holder", ttlMs = 600L) {
          wedge.set(true)   // the medium becomes a black hole mid-hold
          Thread.sleep(1500L)
        }
      }
      // the exit's wait on the wedged beat is bounded (2 beat periods),
      // not a deadlock
      assert(System.currentTimeMillis() - t0 < 15000L,
        "exit must not block on the wedged beat")
      // the firings skipped behind the wedged beat registered on the
      // dispatch-side gauge (ttl 600 → period 200 ms; the beat wedges at
      // ~200 ms and at least a couple of the remaining ~6 firings in
      // the 1.5 s window must have skipped, whatever the scheduler slip)
      assert(WarehouseLease.coordinationGauges.toMap
        .apply("skipped_beats_jvm") >= skippedBefore + 2L,
        "skips behind a wedged beat must register on the gauge")
    } finally WarehouseLease.unregisterMedium("wedgemem")
  }

  test("wedged beats orphan single-use threads: beating survives MORE wedge events than any pool size") {
    // The round-16 residual: beats used to run ON the shared 4-thread
    // scheduler pool, so each wedge event parked one pool thread
    // permanently and four wedges silenced all beating for the JVM's
    // lifetime — after which every hold longer than one ttl exited with
    // a spurious LeaseLostException even against a HEALTHY medium. Beats
    // now run on single-use daemon threads (the pool only dispatches):
    // five sequential wedge events — more than the old pool could absorb
    // — must each be detected loudly, and a healthy hold afterwards must
    // still be kept alive by its beats (the exact capability the old
    // design lost).
    final class WedgeCell extends WarehouseLease.AtomicCell {
      val wedge = new java.util.concurrent.atomic.AtomicBoolean(false)
      private val inner = new MemCell
      private def gate(): Unit =
        if (wedge.get()) new CountDownLatch(1).await()
      override def get(): Option[(String, String)] = { gate(); inner.get() }
      override def putIfAbsent(c: String): Boolean =
        { gate(); inner.putIfAbsent(c) }
      override def putIfTag(t: String, c: String): Boolean =
        { gate(); inner.putIfTag(t, c) }
      override def deleteIfTag(t: String): Boolean =
        { gate(); inner.deleteIfTag(t) }
    }
    val cells = new ConcurrentHashMap[String, WedgeCell]()
    WarehouseLease.registerMedium("wedgepool", (_, wh) =>
      new WarehouseLease.CasLeaseMedium(
        cells.computeIfAbsent(wh, _ => new WedgeCell)))
    try {
      for (i <- 0 until 5) {
        val wh = s"wedgepool://bucket/wh-$i"
        intercept[WarehouseLease.LeaseLostException] {
          WarehouseLease.withWriteLease(spark, wh, owner = s"h$i",
            ttlMs = 450L) {
            cells.get(wh).wedge.set(true) // this hold's medium black-holes
            Thread.sleep(1100L)           // > ttl, zero successful beats
          }
        }
      }
      // after five orphaned wedges, a healthy lease must still BEAT: the
      // body outlives the raw ttl, a contender is refused mid-body (the
      // stamp was refreshed), and the exit is clean — no spurious loss
      val wh = "wedgepool://bucket/wh-healthy"
      WarehouseLease.withWriteLease(spark, wh, owner = "healthy",
        ttlMs = 600L) {
        Thread.sleep(1500L)
        intercept[WarehouseLease.LeaseHeldException] {
          WarehouseLease.acquire(spark, wh, owner = "contender",
            ttlMs = 1000L)
        }
      }
    } finally WarehouseLease.unregisterMedium("wedgepool")
  }

  test("a ZOMBIE beat unblocking after its hold exited can neither poison a later hold nor resurrect the lease") {
    // A beat wedged inside a medium call can unblock AFTER its hold
    // exited (systematically so now that JdbcAtomicCell bounds its ops).
    // Two hazards if it then acts: reading the SUCCESSOR hold's foreign
    // owner it would markLost the warehouse key — and nothing clears
    // `lost` at acquire, so the successor's healthy exit would throw a
    // spurious LeaseLostException; reading its own owner's residual
    // expired stamp it would re-stamp it — resurrecting a lease nobody
    // holds for a full ttl. The hold-identity guard (activeHolds maps to
    // THIS hold's state instance) makes the zombie a no-op.
    val wedge = new java.util.concurrent.atomic.AtomicBoolean(false)
    val resume = new CountDownLatch(1)
    val inner = new MemCell
    val cell = new WarehouseLease.AtomicCell {
      private def gate(): Unit =
        if (wedge.get()) { resume.await(30L,
          java.util.concurrent.TimeUnit.SECONDS); () }
      override def get(): Option[(String, String)] = { gate(); inner.get() }
      override def putIfAbsent(c: String): Boolean =
        { gate(); inner.putIfAbsent(c) }
      override def putIfTag(t: String, c: String): Boolean =
        { gate(); inner.putIfTag(t, c) }
      override def deleteIfTag(t: String): Boolean =
        { gate(); inner.deleteIfTag(t) }
    }
    WarehouseLease.registerMedium("zombiemem",
      (_, _) => new WarehouseLease.CasLeaseMedium(cell))
    try {
      val wh = "zombiemem://bucket/wh"
      // hold 1: its first beat wedges inside m.read() (holding the hold
      // lock, so the exit's release is skipped); the hold exits LOST
      intercept[WarehouseLease.LeaseLostException] {
        WarehouseLease.withWriteLease(spark, wh, owner = "z1",
          ttlMs = 450L) {
          wedge.set(true)
          Thread.sleep(1100L) // > ttl with zero successful beats
        }
      }
      wedge.set(false)
      // hold 2 (different owner) reclaims the expired residue and runs;
      // the zombie unblocks MID-HOLD and reads z2's stamp — without the
      // identity guard it would markLost and poison this hold's exit
      WarehouseLease.withWriteLease(spark, wh, owner = "z2",
        ttlMs = 60000L) {
        resume.countDown()
        Thread.sleep(500L) // let the zombie run its course
      } // must NOT throw — the zombie must not have marked z2's key lost
      // and the zombie must not have resurrected anything: after z2's
      // release the cell reads free and a fresh writer enters untroubled
      assert(inner.get().isEmpty,
        s"the cell must be free after z2's release, got ${inner.get()}")
      WarehouseLease.acquire(spark, wh, owner = "z3", ttlMs = 1000L)
      WarehouseLease.release(spark, wh, owner = "z3")
    } finally WarehouseLease.unregisterMedium("zombiemem")
  }

  test("an abandoned release unblocking after a same-owner re-acquire can never delete the successor's lease") {
    // The ADVICE r16 two-writer window: the release runs as an
    // abandonable task that used to re-read the medium at execution time
    // and match on OWNER — so a release wedged past the exit's bounded
    // wait, unblocking after the caller followed the documented recovery
    // (re-acquire with the same default jvmOwner), read the SUCCESSOR's
    // stamp, matched, and deleted a live lease. The fix: the release
    // targets the hold's exact LAST-PUBLISHED stamp content; a successor
    // stamp (new expiry millis) can never match it.
    val inner = new MemCell
    val wedgeRelease = new java.util.concurrent.atomic.AtomicBoolean(false)
    val releaseGate = new CountDownLatch(1)
    val releaseTouched = new AtomicInteger(0)
    // wedge ONLY the release thread's medium I/O (single-use daemon
    // threads named graft-lease-release) — beats and acquires flow free
    def gate(): Unit =
      if (wedgeRelease.get() &&
          Thread.currentThread().getName.startsWith("graft-lease-release")) {
        releaseTouched.incrementAndGet()
        releaseGate.await(20L, java.util.concurrent.TimeUnit.SECONDS)
        ()
      }
    val cell = new WarehouseLease.AtomicCell {
      override def get(): Option[(String, String)] = { gate(); inner.get() }
      override def putIfAbsent(c: String): Boolean =
        { gate(); inner.putIfAbsent(c) }
      override def putIfTag(t: String, c: String): Boolean =
        { gate(); inner.putIfTag(t, c) }
      override def deleteIfTag(t: String): Boolean =
        { gate(); inner.deleteIfTag(t) }
    }
    WarehouseLease.registerMedium("latemem",
      (_, _) => new WarehouseLease.CasLeaseMedium(cell))
    try {
      val wh = "latemem://bucket/wh"
      wedgeRelease.set(true)
      // hold 1: the exit's bounded join (4 beat periods = 1.2 s) expires
      // while the release is wedged inside the medium — abandoned, the
      // call returns with the stamp still published
      WarehouseLease.withWriteLease(spark, wh, owner = "dup",
        ttlMs = 900L) { Thread.sleep(50L) }
      assert(inner.get().exists(_._1.startsWith("dup|")),
        "the abandoned release must have left hold 1's stamp in place")
      // the documented recovery: re-acquire as the SAME owner (hold 2)
      WarehouseLease.withWriteLease(spark, wh, owner = "dup",
        ttlMs = 60000L) {
        val successorStamp = inner.get().map(_._1)
        // now the wedged release unblocks mid-hold-2 and runs to
        // completion — with exact-stamp targeting it must no-op
        releaseGate.countDown()
        val deadline = System.currentTimeMillis() + 5000L
        while (releaseTouched.get() == 0 &&
          System.currentTimeMillis() < deadline) Thread.sleep(20L)
        Thread.sleep(500L) // let the unblocked release finish its no-op
        assert(inner.get().map(_._1) == successorStamp ||
          inner.get().exists(_._1.startsWith("dup|")),
          s"successor's lease must survive the late release, got ${inner.get()}")
        // the two-writer window stays closed: a foreign writer is refused
        intercept[WarehouseLease.LeaseHeldException] {
          WarehouseLease.acquire(spark, wh, owner = "thief", ttlMs = 1000L)
        }
      }
    } finally {
      wedgeRelease.set(false)
      WarehouseLease.unregisterMedium("latemem")
    }
  }

  test("JDBC cell: a WEDGED connect is timeout-bounded — the calling thread is always freed") {
    // DriverManager sets no connect timeout, and a TCP connect can hang
    // before the JDBC driver even sees it. Every cell operation now runs
    // its connect on a single-use daemon thread with a bounded claim
    // handshake: a hang surfaces as SQLException within opTimeoutMs (the
    // lease protocol maps it to retry-then-LOST), the caller's thread —
    // heartbeat or exit — is returned, and a connect that completes
    // after abandonment is closed by its own thread, never leaked.
    val url = s"jdbc:derby:${java.nio.file.Files
      .createTempDirectory("lease-jdbc-wedge")}/db;create=true"
    // boot the database OUTSIDE the bounded path (same move as the
    // handshake test): a cold Derby engine pays ~1 s creation on the
    // first connect, which would trip the 500 ms bound when this test
    // runs in a fresh JVM rather than after suite-mates warmed it
    java.sql.DriverManager.getConnection(url).close()
    val hang = new java.util.concurrent.atomic.AtomicBoolean(false)
    val connect: () => java.sql.Connection = () => {
      if (hang.get()) new CountDownLatch(1).await() // a black-hole connect
      java.sql.DriverManager.getConnection(url)
    }
    val cell = new graft.core.JdbcAtomicCell(connect, "graft_lease_cells",
      "wedged", opTimeoutMs = 500L)
    assert(cell.putIfAbsent("w|1"))
    val orphansBefore = graft.core.JdbcAtomicCell.orphanedConnects.get()
    hang.set(true)
    val t0 = System.currentTimeMillis()
    val ex = intercept[java.sql.SQLException](cell.get())
    val waited = System.currentTimeMillis() - t0
    assert(waited < 5000L, s"the op must be bounded, waited $waited ms")
    assert(ex.getMessage.contains("timed out"), ex.getMessage)
    // same bound on the write paths
    intercept[java.sql.SQLException](cell.putIfTag("0", "x"))
    intercept[java.sql.SQLException](cell.deleteIfTag("0"))
    // each abandonment is COUNTED — the gauge that makes an
    // intermittently-wedging medium visible before it loses a lease
    // (monotonic JVM-global: other suites may add, never subtract)
    assert(graft.core.JdbcAtomicCell.orphanedConnects.get()
      >= orphansBefore + 3L,
      "three abandoned connects must register on the orphan gauge")
    // once the medium answers again, the cell state is intact
    hang.set(false)
    assert(cell.get().exists(_._1 == "w|1"))
    assert(cell.deleteIfTag(cell.get().get._2))
  }

  test("timed-connect claim handshake: no interleaving leaks a connection or delivers to a departed waiter") {
    // the claim CAS contract, raced for real: connects that finish well
    // inside the bound are DELIVERED (and closed by the op's own
    // finally); connects that finish around or after the bound are
    // either delivered or ABANDONED — and an abandoned connect's thread
    // must close the connection it later opens. Every connection ever
    // opened must therefore be closed once the dust settles, whatever
    // the interleaving.
    val url = s"jdbc:derby:${java.nio.file.Files
      .createTempDirectory("lease-jdbc-hand")}/db;create=true"
    // boot the database once OUTSIDE the bounded path: the first embedded
    // connect pays the db creation (~1 s), every later one is
    // milliseconds — the race below must straddle the bound with the
    // artificial delays, not with boot cost
    java.sql.DriverManager.getConnection(url).close()
    val open = ConcurrentHashMap.newKeySet[java.sql.Connection]()
    def track(real: java.sql.Connection): java.sql.Connection = {
      open.add(real)
      java.lang.reflect.Proxy.newProxyInstance(
        classOf[java.sql.Connection].getClassLoader,
        Array(classOf[java.sql.Connection]),
        (_, method, args) => {
          if (method.getName == "close") open.remove(real)
          try {
            if (args == null) method.invoke(real)
            else method.invoke(real, args: _*)
          } catch {
            case e: java.lang.reflect.InvocationTargetException =>
              throw e.getCause
          }
        }).asInstanceOf[java.sql.Connection]
    }
    val delayMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val connect: () => java.sql.Connection = () => {
      val d = delayMs.get()
      if (d > 0) Thread.sleep(d)
      track(java.sql.DriverManager.getConnection(url))
    }
    val cell = new graft.core.JdbcAtomicCell(connect, "graft_lease_cells",
      "handshake", opTimeoutMs = 300L)
    assert(cell.putIfAbsent("h|1"))
    val rnd = new scala.util.Random(7L)
    var delivered = 0
    var abandoned = 0
    (0 until 60).foreach { _ =>
      // straddle the 300 ms bound: instant, half, at-the-bound, double
      delayMs.set(Seq(0L, 150L, 300L, 600L)(rnd.nextInt(4)))
      try { cell.get(); delivered += 1 }
      catch { case _: java.sql.SQLException => abandoned += 1 }
    }
    delayMs.set(0L)
    assert(delivered > 0 && abandoned > 0,
      s"the race must exercise both outcomes (delivered=$delivered, " +
        s"abandoned=$abandoned) — retune the delays if the box shifted")
    // all delivered connections closed by withConn already; abandoned
    // ones close on their orphan threads within their delay + epsilon
    val deadline = System.currentTimeMillis() + 10000L
    while (!open.isEmpty && System.currentTimeMillis() < deadline)
      Thread.sleep(50L)
    assert(open.isEmpty, s"${open.size()} connections leaked")
    // and the cell still answers correctly afterwards
    assert(cell.get().exists(_._1 == "h|1"))
  }

  test("mediumFactory: warehouses sharing a long URI prefix never share a lease cell") {
    // the cell name used to be uri.take(512) — two warehouses sharing a
    // 512-char prefix silently serialized on ONE cell (safe direction,
    // but a surprise); the name now carries a digest of the FULL uri
    val url = s"jdbc:derby:${java.nio.file.Files
      .createTempDirectory("lease-jdbc-pfx")}/db;create=true"
    WarehouseLease.registerMedium("jdbcpfx",
      graft.core.JdbcAtomicCell.mediumFactory(url))
    try {
      val prefix = "jdbcpfx://bucket/" + ("a" * 520)
      WarehouseLease.acquire(spark, s"$prefix/wh1", owner = "one",
        ttlMs = 60000L)
      // a shared cell would throw LeaseHeldException here
      WarehouseLease.acquire(spark, s"$prefix/wh2", owner = "two",
        ttlMs = 60000L)
      WarehouseLease.release(spark, s"$prefix/wh1", owner = "one")
      WarehouseLease.release(spark, s"$prefix/wh2", owner = "two")
    } finally WarehouseLease.unregisterMedium("jdbcpfx")
  }

  test("model equivalence: the JDBC cell and the in-memory cell are indistinguishable over randomized op schedules") {
    // The CAS medium's cross-process soundness cannot be raced on this
    // box (no derbynet/derbyclient ships with Spark) — the strongest
    // available substitute is SEMANTIC EQUIVALENCE to the raced in-memory
    // model: the same randomized schedule of get/putIfAbsent/putIfTag/
    // deleteIfTag, including stale tags replayed across delete/recreate
    // GENERATIONS (the ABA class), must produce identical externally-
    // visible results at every step. Tags are opaque and backend-specific,
    // so schedules reference them POSITIONALLY ("the tag observed by the
    // get at step i") and each cell replays with its own observations.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    sealed trait Op
    case object Get extends Op
    final case class PutIfAbsent(c: String) extends Op
    final case class PutIfTag(ref: Int, c: String) extends Op
    final case class DeleteIfTag(ref: Int) extends Op
    val contents = Gen.oneOf("w0|1", "w1|2", "w2|3", "w3|4")
    def opGen(len: Int): Gen[Op] = Gen.frequency(
      3 -> Gen.const(Get),
      2 -> contents.map(PutIfAbsent),
      3 -> Gen.zip(Gen.chooseNum(0, math.max(0, len - 1)), contents)
        .map { case (r, c) => PutIfTag(r, c) },
      2 -> Gen.chooseNum(0, math.max(0, len - 1)).map(DeleteIfTag))
    val schedGen: Gen[List[Op]] =
      Gen.chooseNum(4, 12).flatMap(n =>
        Gen.sequence[List[Op], Op]((0 until n).map(i => opGen(i + 1))))
    val url = s"jdbc:derby:${java.nio.file.Files
      .createTempDirectory("lease-jdbc-model")}/db;create=true"
    var checked = 0
    (0 until 1000).foreach { seed =>
      schedGen.apply(Gen.Parameters.default, Seed(seed.toLong)).foreach { ops =>
        checked += 1
        val jdbc = new graft.core.JdbcAtomicCell(url, "graft_model_cells",
          s"m$seed")
        val mem = new MemCell
        // per-cell positional tag observations (None until that step's
        // get ran, or when it observed an absent cell)
        val jTags = Array.fill[Option[String]](ops.length)(None)
        val mTags = Array.fill[Option[String]](ops.length)(None)
        // a tag string neither backend ever issues — both must refuse it
        val bogus = "909090909"
        ops.zipWithIndex.foreach { case (op, i) =>
          op match {
            case Get =>
              val (j, m) = (jdbc.get(), mem.get())
              assert(j.map(_._1) == m.map(_._1),
                s"seed $seed step $i: get saw ${j.map(_._1)} vs ${m.map(_._1)} ($ops)")
              jTags(i) = j.map(_._2); mTags(i) = m.map(_._2)
            case PutIfAbsent(c) =>
              assert(jdbc.putIfAbsent(c) == mem.putIfAbsent(c),
                s"seed $seed step $i: putIfAbsent($c) diverged ($ops)")
            case PutIfTag(ref, c) =>
              val r = jdbc.putIfTag(jTags(ref).getOrElse(bogus), c) ==
                mem.putIfTag(mTags(ref).getOrElse(bogus), c)
              assert(r, s"seed $seed step $i: putIfTag(@$ref, $c) diverged ($ops)")
            case DeleteIfTag(ref) =>
              val r = jdbc.deleteIfTag(jTags(ref).getOrElse(bogus)) ==
                mem.deleteIfTag(mTags(ref).getOrElse(bogus))
              assert(r, s"seed $seed step $i: deleteIfTag(@$ref) diverged ($ops)")
          }
          // the externally visible CONTENT must agree after every step
          assert(jdbc.get().map(_._1) == mem.get().map(_._1),
            s"seed $seed step $i: post-op content diverged ($ops)")
        }
      }
    }
    assert(checked >= 900, s"only $checked schedules generated")
  }

  test("JDBC cell medium: one winner per acquire/reclaim race; lifecycle over the database") {
    val url = s"jdbc:derby:${java.nio.file.Files
      .createTempDirectory("lease-jdbc-med")}/db;create=true"
    WarehouseLease.registerMedium("jdbccell",
      graft.core.JdbcAtomicCell.mediumFactory(url))
    try {
      // fresh-cell race: N writers, one winner — same bar as the MemCell
      // proof, now over a real transactional backend
      val wh = "jdbccell://bucket/warehouse-a"
      val okA = new AtomicInteger(0)
      val heldA = new AtomicInteger(0)
      race(16) { i =>
        try { WarehouseLease.acquire(spark, wh, owner = s"w$i",
          ttlMs = 60000L); okA.incrementAndGet() }
        catch { case _: WarehouseLease.LeaseHeldException =>
          heldA.incrementAndGet() }
      }
      assert(okA.get() == 1 && heldA.get() == 15,
        s"acquire race: ${okA.get()} winners, ${heldA.get()} refused")

      // expired-lease reclaim race: one single-winner conditional UPDATE
      val wh2 = "jdbccell://bucket/warehouse-b"
      WarehouseLease.acquire(spark, wh2, owner = "dead", ttlMs = -1000L)
      val okB = new AtomicInteger(0)
      val heldB = new AtomicInteger(0)
      race(16) { i =>
        try { WarehouseLease.acquire(spark, wh2, owner = s"r$i",
          ttlMs = 60000L); okB.incrementAndGet() }
        catch { case _: WarehouseLease.LeaseHeldException =>
          heldB.incrementAndGet() }
      }
      assert(okB.get() == 1 && heldB.get() == 15,
        s"reclaim race: ${okB.get()} winners, ${heldB.get()} refused")

      // lifecycle: heartbeat refreshes through conditional UPDATEs keep a
      // slow holder live; release deletes the row; a fresh writer enters
      val wh3 = "jdbccell://bucket/warehouse-c"
      WarehouseLease.withWriteLease(spark, wh3, owner = "holder",
        ttlMs = 600L) {
        Thread.sleep(1500L)
        intercept[WarehouseLease.LeaseHeldException] {
          WarehouseLease.acquire(spark, wh3, owner = "contender",
            ttlMs = 1000L)
        }
      }
      WarehouseLease.acquire(spark, wh3, owner = "next", ttlMs = 1000L)
      WarehouseLease.release(spark, wh3, owner = "next")

      // release-vs-reclaim race: a slow holder releasing its EXPIRED lease
      // while N reclaimers race it. Every interleaving is safe on a CAS
      // cell: a reclaimer's single-winner CAS can beat the release (whose
      // stale-tag DELETE then no-ops against the new version), or the
      // DELETE can land between the reclaimers' reads and their CASes —
      // in which case every reclaim fails this pass (contention, retried
      // by the caller's next attempt) and the cell is left EMPTY. The
      // invariant is never-more-than-one admitted, and convergence: after
      // the dust settles the warehouse is held by the one winner or free.
      val wh4 = "jdbccell://bucket/warehouse-d"
      WarehouseLease.acquire(spark, wh4, owner = "slow", ttlMs = -1000L)
      val okC = new AtomicInteger(0)
      race(9) { i =>
        if (i == 0) WarehouseLease.release(spark, wh4, owner = "slow")
        else {
          try { WarehouseLease.acquire(spark, wh4, owner = s"c$i",
            ttlMs = 60000L); okC.incrementAndGet() }
          catch { case _: WarehouseLease.LeaseHeldException => () }
        }
      }
      assert(okC.get() <= 1,
        s"release-vs-reclaim race admitted ${okC.get()} writers")
      if (okC.get() == 0) {
        // the release won every interleaving: the cell must be free now
        WarehouseLease.acquire(spark, wh4, owner = "late", ttlMs = 60000L)
        WarehouseLease.release(spark, wh4, owner = "late")
      }
    } finally WarehouseLease.unregisterMedium("jdbccell")
  }

  test("object-store scheme with no medium refuses loudly instead of degrading") {
    val ex = intercept[WarehouseLease.LeaseUnsupportedException] {
      WarehouseLease.acquire(spark, "s3a://bucket/wh", owner = "x")
    }
    assert(ex.getMessage.contains("check-then-put") &&
      ex.getMessage.contains(WarehouseLease.CoordDirKey) &&
      ex.getMessage.contains("registerMedium"), ex.getMessage)
    // withWriteLease refuses the same way, and leaves the in-JVM
    // bookkeeping clean for a later (supported) attempt
    intercept[WarehouseLease.LeaseUnsupportedException] {
      WarehouseLease.withWriteLease(spark, "s3a://bucket/wh",
        owner = "x") { fail("body must not run") }
    }
    intercept[WarehouseLease.LeaseUnsupportedException] {
      WarehouseLease.withWriteLease(spark, "s3a://bucket/wh",
        owner = "x") { fail("body must not run") }
    }
  }

  test("coordDir hosts an object-store warehouse's lease on an atomic filesystem") {
    val cd = java.nio.file.Files.createTempDirectory("lease-coord").toString
    spark.conf.set(WarehouseLease.CoordDirKey, cd)
    try {
      val wh = "s3a://bucket/wh-coord"
      WarehouseLease.acquire(spark, wh, owner = "a", ttlMs = 60000L)
      // the lease landed under the coordination dir, not the object store
      val files = new java.io.File(cd).listFiles()
        .filter(_.getName.startsWith("._graft_writer_lease"))
      assert(files.length == 1, files.mkString(","))
      // arbitration works across owners
      intercept[WarehouseLease.LeaseHeldException] {
        WarehouseLease.acquire(spark, wh, owner = "b", ttlMs = 1000L)
      }
      // a DIFFERENT warehouse maps to a different lease file — no
      // cross-warehouse contention through the shared dir
      WarehouseLease.acquire(spark, "s3a://bucket/wh-other", owner = "b",
        ttlMs = 60000L)
      WarehouseLease.release(spark, "s3a://bucket/wh-other", owner = "b")
      WarehouseLease.release(spark, wh, owner = "a")
      WarehouseLease.acquire(spark, wh, owner = "b", ttlMs = 1000L)
      WarehouseLease.release(spark, wh, owner = "b")
    } finally spark.conf.unset(WarehouseLease.CoordDirKey)
  }

  test("rename medium: exactly one of N racing local reclaimers wins the expired lease") {
    val wh = java.nio.file.Files.createTempDirectory("lease-claimrace").toString
    WarehouseLease.acquire(spark, wh, owner = "dead", ttlMs = -1000L)
    val ok = new AtomicInteger(0)
    val refused = new AtomicInteger(0)
    race(8) { i =>
      try { WarehouseLease.acquire(spark, wh, owner = s"rc$i",
        ttlMs = 60000L); ok.incrementAndGet() }
      catch { case _: WarehouseLease.LeaseHeldException =>
        refused.incrementAndGet() }
    }
    assert(ok.get() == 1 && refused.get() == 7,
      s"rename-claim reclaim: ${ok.get()} winners, ${refused.get()} refused")
    // the winner's lease file is intact and no claim residue leaks into
    // reads: only the single live lease remains
    val leases = new java.io.File(wh).listFiles()
      .filter(_.getName.startsWith("._graft_writer_lease"))
    assert(leases.map(_.getName).toSeq == Seq("._graft_writer_lease"),
      leases.map(_.getName).mkString(","))
  }

  test("rename medium: a claim of a lease that transitioned since the read is refused and restored") {
    val wh = java.nio.file.Files.createTempDirectory("lease-restore").toString
    val m = WarehouseLease.mediumFor(spark, wh)
    val stale = s"dead|${System.currentTimeMillis() - 5000L}"
    assert(m.createIfAbsent(stale))
    // the lease transitions (a faster reclaimer won it and is live)
    val fresh = s"winner|${System.currentTimeMillis() + 60000L}"
    assert(m.reclaim(stale, fresh), "first reclaim must win")
    // a SLOW reclaimer still holding the stale content now tries: it must
    // lose AND leave the winner's lease exactly as it was — this is the
    // racing-reclaimer overwrite hazard the old overwrite-then-verify
    // settle window could not close
    assert(!m.reclaim(stale, s"slow|${System.currentTimeMillis() + 60000L}"),
      "stale reclaim must be refused")
    assert(m.read().contains(fresh),
      s"winner's lease must be restored untouched, got ${m.read()}")
    // same single-winner shape for release: a stale releaser must not
    // delete the winner's lease
    m.release(stale)
    assert(m.read().contains(fresh), "stale release must not delete")
    m.release(fresh)
    assert(m.read().isEmpty)
  }

  // ---- cross-process races (forked JVMs) ----------------------------------
  //
  // The single-writer claim defends N DRIVERS on N hosts; everything above
  // races threads inside one JVM (one heartbeat pool, one `held` map, one
  // jvmOwner namespace). These fork real JVMs over java.class.path (tests
  // fork, so that is the full test classpath) and let separate processes
  // contend through the actual media.

  private def forkJvm(args: Seq[String], log: java.io.File): Process = {
    val java = System.getProperty("java.home") + "/bin/java"
    // same module opens the build gives every Spark JVM here
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
      (Seq(java) ++ addOpens ++ Seq("-Xmx2g",
        "-cp", System.getProperty("java.class.path"),
        "graft.LeaseRaceMain") ++ args): _*)
      .redirectErrorStream(true)
      .redirectOutput(log)
      .start()
  }

  test("file medium, CROSS-PROCESS: two forked JVMs contending for one warehouse never interleave their holds") {
    val wh = java.nio.file.Files.createTempDirectory("lease-xproc").toString
    val events = s"$wh/../lease-xproc-events-${System.nanoTime()}.log"
    val iters = 4
    val procs = Seq("alpha", "beta").map { owner =>
      val log = java.io.File.createTempFile(s"lease-xproc-$owner", ".log")
      (owner, log, forkJvm(
        Seq("file", wh, events, owner, iters.toString), log))
    }
    procs.foreach { case (owner, log, p) =>
      assert(p.waitFor(300L, java.util.concurrent.TimeUnit.SECONDS),
        s"racer $owner did not finish")
      assert(p.exitValue() == 0,
        s"racer $owner exited ${p.exitValue()}:\n" +
          new String(java.nio.file.Files.readAllBytes(log.toPath), "UTF-8")
            .linesIterator.toSeq.takeRight(25).mkString("\n"))
    }
    // O_APPEND writes on a local posix fs: file order IS the global order
    // of the enter/exit events. The single-writer invariant is strict
    // alternation — an `enter` while another owner is inside is exactly
    // the two-writer interleaving the lease exists to make impossible.
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(events)).toArray.map(_.toString)
    var inside: Option[String] = None
    lines.foreach { l =>
      val parts = l.split(' ')
      (parts(0), parts(1)) match {
        case ("enter", o) =>
          assert(inside.isEmpty,
            s"$o entered while ${inside.getOrElse("?")} held the lease:\n" +
              lines.mkString("\n"))
          inside = Some(o)
        case ("exit", o) =>
          assert(inside.contains(o), s"unmatched exit in:\n${lines.mkString("\n")}")
          inside = None
        case _ => fail(s"garbled event line '$l'")
      }
    }
    assert(inside.isEmpty, "a hold never exited")
    // both processes completed every iteration — nobody starved out
    Seq("alpha", "beta").foreach { o =>
      assert(lines.count(_.startsWith(s"enter $o")) == iters,
        s"$o completed ${lines.count(_.startsWith(s"enter $o"))}/$iters holds")
    }
  }

  test("embedded Derby, CROSS-PROCESS: a second process is refused loudly, never admitted as a second coordinator") {
    // Embedded Derby is single-JVM (JdbcAtomicCell's doc): it CANNOT
    // arbitrate cross-process — the asserted contract is that the failure
    // mode is a loud refusal (the second driver cannot coordinate at
    // all), never a silent second writer. Cross-process CAS arbitration
    // needs a network-reachable database (Derby network server, Postgres,
    // MySQL, RDS), which this container deliberately does not ship.
    val dbdir = java.nio.file.Files.createTempDirectory("lease-xproc-derby")
    val url = s"jdbc:derby:$dbdir/db"
    // boot the db in THIS process and hold a live cell over it
    val cell = new graft.core.JdbcAtomicCell(s"$url;create=true",
      "graft_lease_cells", "xproc")
    assert(cell.putIfAbsent("holder|9999999999999"))
    val log = java.io.File.createTempFile("lease-xproc-derby", ".log")
    val p = forkJvm(Seq("derby-boot", url), log)
    assert(p.waitFor(120L, java.util.concurrent.TimeUnit.SECONDS),
      "derby-boot probe did not finish")
    val out = new String(
      java.nio.file.Files.readAllBytes(log.toPath), "UTF-8")
    assert(p.exitValue() == 0, s"exit ${p.exitValue()}:\n$out")
    assert(out.contains("REFUSED"), out)
    // the holder's cell is untouched by the refused intruder
    assert(cell.get().contains(("holder|9999999999999", "0")))
    assert(cell.deleteIfTag("0"))
  }

  test("status reads the current holder without provoking contention") {
    val wh = java.nio.file.Files.createTempDirectory("lease-status").toString
    assert(WarehouseLease.status(spark, wh).isEmpty, "free warehouse")
    WarehouseLease.acquire(spark, wh, owner = "ops-driver", ttlMs = 60000L)
    val st = WarehouseLease.status(spark, wh)
    assert(st.exists(_._1 == "ops-driver"), st.toString)
    assert(st.exists(_._2 > System.currentTimeMillis()), "expiry in the future")
    // the read took no transition: the holder still holds, a contender is
    // still refused, and release still works
    intercept[WarehouseLease.LeaseHeldException] {
      WarehouseLease.acquire(spark, wh, owner = "other", ttlMs = 1000L)
    }
    WarehouseLease.release(spark, wh, owner = "ops-driver")
    assert(WarehouseLease.status(spark, wh).isEmpty, "released reads free")
  }

  test("heldByCurrentThread: true only inside the holding call tree, for the root and its subpaths") {
    val wh = java.nio.file.Files.createTempDirectory("lease-held").toString
    val store = s"$wh/corpus/pairs"
    assert(!WarehouseLease.heldByCurrentThread(spark, wh))
    assert(!WarehouseLease.heldByCurrentThread(spark, store))
    WarehouseLease.withWriteLease(spark, wh) {
      assert(WarehouseLease.heldByCurrentThread(spark, wh))
      assert(WarehouseLease.heldByCurrentThread(spark, store),
        "a store path under the held root must count as covered")
      // prefix match is per path SEGMENT, not per character: a sibling
      // directory sharing the root's name as a string prefix is NOT under
      // the lease
      assert(!WarehouseLease.heldByCurrentThread(spark, wh + "x/corpus"))
      // re-entrant depth keeps the answer true until the OUTERMOST exit
      WarehouseLease.withWriteLease(spark, wh) {
        assert(WarehouseLease.heldByCurrentThread(spark, store))
      }
      assert(WarehouseLease.heldByCurrentThread(spark, store))
      // thread-scoped: a sibling thread of the same JVM is NOT the writer
      var onOther = true
      val t = new Thread(() => {
        onOther = WarehouseLease.heldByCurrentThread(spark, store)
      })
      t.start(); t.join(10000L)
      assert(!onOther, "another thread must not inherit the hold")
    }
    assert(!WarehouseLease.heldByCurrentThread(spark, store),
      "the hold must clear at the outermost exit")
  }
}
