package graft.core

/** Fire one tryLock-gated body on a single-use daemon thread — the
  * dispatch half of the wedge-proof beat pattern shared by
  * [[WarehouseLease]] heartbeats and [[SwapProtocol]] token re-stamps.
  * The shared scheduler pool only schedules; the medium/filesystem I/O
  * runs on a thread nobody else needs, so a call that WEDGES (hanging
  * connect, dead socket, degraded store) orphans at most one thread per
  * wedge event and can never exhaust beating capacity. A previous
  * firing still in flight — wedged or merely slow — makes the new one
  * SKIP its period instead of queueing behind the lock.
  */
private[core] object BeatDispatch {

  /** JVM-global count of beat firings SKIPPED because the previous
    * firing still held the hold's lock — wedged, or merely slow.
    * Monotonic, never reset (consumers diff across reads). Near-zero on
    * a healthy medium/filesystem; sustained growth means SOME beat is
    * parked inside its I/O — the same intermittent-wedge signature as
    * [[JdbcAtomicCell.orphanedConnects]], from the dispatch side
    * (surfaced together through [[WarehouseLease.coordinationGauges]]).
    */
  val skippedBeats = new java.util.concurrent.atomic.AtomicLong(0L)

  def fireOnce(lock: java.util.concurrent.locks.ReentrantLock,
               threadName: String)(body: => Unit): Unit = {
    val th = new Thread(() => {
      if (lock.tryLock()) {
        try body finally lock.unlock()
      } else skippedBeats.incrementAndGet()
    }, threadName)
    th.setDaemon(true)
    th.start()
  }
}
