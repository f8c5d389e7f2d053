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

  def fireOnce(lock: java.util.concurrent.locks.ReentrantLock,
               threadName: String)(body: => Unit): Unit = {
    val th = new Thread(() => {
      if (lock.tryLock()) {
        try body finally lock.unlock()
      }
    }, threadName)
    th.setDaemon(true)
    th.start()
  }
}
