package graft.core

import org.apache.spark.sql.SparkSession

/** THE warehouse tree traversal — one driver-side recursive listing that
  * feeds every residue recognizer at once. fsck, repair, and status each
  * need the same walk (crash-parked swaps, writeAtomic temp residue, and
  * whatever recognizer comes next); before this seam existed each census
  * ran its own traversal, and at a many-thousand-table warehouse the
  * duplicated metadata storm was the slowest row of the first read every
  * inherited-warehouse operator makes. Now a caller scans ONCE and reads
  * all findings off the result.
  *
  * Cost contract: exactly ONE `listStatus` batch per visited directory
  * (locked by WalkSpec against a call-counting filesystem) — every
  * verdict, including the parked one (`<t>._compact_old` present, live
  * `<t>` absent — both names are siblings by construction), is answered
  * from the directory's own listing, never a per-candidate `exists`
  * round-trip. So a warehouse of tens of thousands of tables costs
  * exactly its directory count in metadata calls, once per scan, not
  * once per recognizer.
  *
  * Listings run on a small bounded pool ([[Parallelism]] wide): each
  * directory's verdicts depend only on its OWN listing, so sibling
  * subtrees are independent once their parent is listed, and on
  * round-trip-bound stores (S3/ABFS-class, ~10–50 ms per `listStatus`)
  * a serial walk pays its directory count in SEQUENTIAL round-trips —
  * minutes at tens of thousands of tables — where the pool bounds the
  * wall near dirs/width + depth·latency. Local filesystems lose nothing
  * (the pool degrades to cheap in-process calls). A directory that
  * VANISHES between its parent's listing and its own (a live writer
  * dropping a table under a lease-free scan) is skipped, not crashed
  * on: gone means nothing to census, and fsck's design goal is to
  * complete on a warehouse that is being worked on.
  *
  * Descent rule (shared by all recognizers, unchanged from the walks it
  * replaces): control artifacts (`._`-prefixed names and
  * `._compact_old`/`._compact_tmp` park/stage dirs) are never descended
  * into; data dirs are — a table dir's files come back in its one
  * listing and recursion stops where subdirectories stop, which bounds
  * the walk at the warehouse's directory tree, shallow and
  * metadata-sized by layout.
  */
private[graft] object WarehouseWalk {

  /** Concurrent listings per scan. Sized for latency-hiding on remote
    * metadata round-trips, small enough to stay polite to a namenode /
    * object-store listing quota.
    */
  private val Parallelism = 16

  /** ONE shared lazy pool for every scan in the process — fsck/status
    * call scan() on every invocation, and spinning 16 threads up and
    * down per call was a measurable slice of the operational read
    * path's floor (VERDICT r19). Daemon threads, never shut down: the
    * pool dies with the JVM. Scans stay independent — completion is
    * tracked per-scan by a pending counter + latch, not by pool
    * drain, so concurrent scans interleave tasks safely (no task ever
    * blocks on another task, so a saturated pool cannot deadlock,
    * only queue).
    */
  private lazy val pool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      Parallelism,
      (r: Runnable) => {
        val t = new Thread(r, "graft-warehouse-walk")
        t.setDaemon(true)
        t
      })

  /** One scan's findings:
    *   - `parkedSwaps` — `<table>._compact_old` dirs whose live
    *     `<table>` sibling is absent (the crash-parked rewrite-swap
    *     signature, [[SwapProtocol]] doc);
    *   - `tempResidue` — (path, mtimeMs) of every file
    *     [[AtomicFiles.isTempResidue]] recognizes as `writeAtomic`
    *     crash residue. The mtime rides along so census/clear callers
    *     can apply an age bound: a LEASE-FREE scan can catch a live
    *     writer's in-flight temp (the swap-token beat re-stamps one
    *     every TTL/3), and only age separates that from a dead
    *     writer's residue.
    */
  final case class Findings(parkedSwaps: Seq[String],
                            tempResidue: Seq[(String, Long)])

  def scan(spark: SparkSession, root: String): Findings = {
    val rp = new org.apache.hadoop.fs.Path(root)
    val fs = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rp)) Findings(Seq.empty, Seq.empty)
    else {
      val parked = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val residue =
        new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
      // manual completion tracking (pending listings), not pool
      // shutdown-and-await: tasks submit child tasks, so "queue empty"
      // is only meaningful when no task is still running either. First
      // failure wins and fails the scan loudly; later tasks become
      // no-ops so the latch still falls.
      val pending = new java.util.concurrent.atomic.AtomicLong(0L)
      val failed =
        new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val done = new java.util.concurrent.CountDownLatch(1)
      def submit(p: org.apache.hadoop.fs.Path): Unit = {
        pending.incrementAndGet()
        pool.execute { () =>
          try { if (failed.get() == null) visit(p) }
          catch {
            case t: Throwable => failed.compareAndSet(null, t)
          } finally {
            if (pending.decrementAndGet() == 0L) done.countDown()
          }
        }
      }
      def visit(p: org.apache.hadoop.fs.Path): Unit = {
        val listing =
          try fs.listStatus(p)
          catch {
            // dropped between its parent's listing and this one by a
            // live writer — nothing to census (see object doc)
            case _: java.io.FileNotFoundException => return
          }
        // the parked verdict consults the sibling NAME SET from this
        // same listing (one snapshot — a name and its parked twin are
        // read in the same batch, so the verdict is internally
        // consistent, unlike two racing exists probes)
        val names = listing.iterator.map(_.getPath.getName).toSet
        listing.foreach { st =>
          val name = st.getPath.getName
          if (st.isFile) {
            if (AtomicFiles.isTempResidue(name))
              residue.add((st.getPath.toString, st.getModificationTime))
          } else if (name.endsWith("._compact_old")) {
            if (!names.contains(name.stripSuffix("._compact_old")))
              parked.add(st.getPath.toString)
          } else if (!name.startsWith("._") && !name.contains("._compact_"))
            submit(st.getPath)
        }
      }
      submit(rp)
      done.await()
      if (failed.get() != null) throw failed.get()
      import scala.jdk.CollectionConverters._
      // deterministic order regardless of pool scheduling — callers
      // count/iterate, but a stable artifact beats a racy one
      Findings(parked.asScala.toSeq.sorted,
        residue.asScala.toSeq.sortBy(_._1))
    }
  }
}
