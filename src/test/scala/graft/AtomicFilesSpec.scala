package graft

import java.nio.file.Files

import graft.app.CorpusStore
import graft.core.Sinks
import org.scalatest.funsuite.AnyFunSuite

/** The sibling-ledger atomicity contract (core/AtomicFiles): every tiny
  * control file a lease-free reader can poll while a leased writer
  * re-stamps it — watermark/promote longs, bucket specs, threshold and
  * params stamps, swap tokens — publishes atomically and reads
  * fail-safe. The bug class these lock: `create(overwrite)` rewrites a
  * file as delete-then-recreate-then-write, so a racing reader caught
  * ABSENT (branch-flipping -1) or a torn line (an uncaught parse error
  * out of fsck/status) — found live by the swap-token races and then
  * grepped out of every other ledger site.
  */
class AtomicFilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("ledger hammer: a lease-free reader polling across re-stamps never sees absence, emptiness, or a torn line") {
    val dir = Files.createTempDirectory("ledger-hammer").toString
    val ledger = s"$dir/_watermark"
    CorpusStore.writeLongLedger(spark, ledger, 0L)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = new Thread(() => {
      var v = 1L
      while (!stop.get()) {
        CorpusStore.writeLongLedger(spark, ledger, v)
        v += 1
        Thread.sleep(1L)
      }
    })
    writer.setDaemon(true)
    writer.start()
    // the reader loop is the fsck/status shape: poll with no sleep.
    // -1 here means the reader caught the ledger ABSENT or unreadable
    // mid-re-stamp — the exact misread the atomic publish removes (the
    // pre-fix create(overwrite) write failed this within milliseconds).
    var polls = 0L
    var last = 0L
    val deadline = System.currentTimeMillis() + 3000L
    while (System.currentTimeMillis() < deadline) {
      val v = CorpusStore.readLongLedger(spark, ledger)
      assert(v >= 0L,
        s"reader caught the ledger mid-re-stamp as absent/torn after $polls polls")
      assert(v >= last, s"ledger went backwards: $last -> $v")
      last = v
      polls += 1
    }
    stop.set(true)
    writer.join(5000L)
    assert(polls > 1000L, s"hammer barely ran ($polls polls)")
    assert(last > 100L, s"writer barely ran (last value $last)")
  }

  test("readLongLedger maps garbage and foreign residue to -1, per its own fail-safe doc") {
    val dir = Files.createTempDirectory("ledger-garbage").toString
    val ledger = s"$dir/_watermark"
    // absent
    assert(CorpusStore.readLongLedger(spark, ledger) == -1L)
    // unparsable content (hand surgery / foreign residue): -1, never a
    // NumberFormatException out of fsck — the old body threw here
    Files.write(java.nio.file.Paths.get(ledger),
      "not-a-number".getBytes("UTF-8"))
    assert(CorpusStore.readLongLedger(spark, ledger) == -1L)
    // empty (a pre-atomic writer's torn stamp): -1
    Files.write(java.nio.file.Paths.get(ledger), Array.empty[Byte])
    assert(CorpusStore.readLongLedger(spark, ledger) == -1L)
    // healthy after a re-stamp over the residue
    CorpusStore.writeLongLedger(spark, ledger, 42L)
    assert(CorpusStore.readLongLedger(spark, ledger) == 42L)
  }

  test("a stale .crc sidecar from a pre-atomic writer cannot poison raw ledger reads") {
    val dir = Files.createTempDirectory("ledger-crc").toString
    val ledger = s"$dir/_watermark"
    val p = new org.apache.hadoop.fs.Path(ledger)
    // legacy write through the CHECKSUMMED fs: data + .crc sidecar
    val cfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = cfs.create(p, true)
    try out.write("7".getBytes("UTF-8")) finally out.close()
    assert(cfs.exists(new org.apache.hadoop.fs.Path(s"$dir/._watermark.crc")),
      "fixture did not produce a checksum sidecar")
    // the atomic re-stamp replaces the data RAW; the sidecar goes stale
    CorpusStore.writeLongLedger(spark, ledger, 8L)
    // raw reads ignore it — a checksummed read would throw ChecksumException
    assert(CorpusStore.readLongLedger(spark, ledger) == 8L)
  }

  test("stableBatchTs restamps a torn (empty) legacy stamp instead of bricking the batchId") {
    val dir = Files.createTempDirectory("batch-ts").toString
    // a pre-atomic writer crashed between create and write: empty file
    Files.write(java.nio.file.Paths.get(s"$dir/batch-7"), Array.empty[Byte])
    val ts = Sinks.stableBatchTs(spark, dir, 7L) // old body NPE'd forever
    assert(math.abs(System.currentTimeMillis() - ts.getTime) < 60000L)
    // the restamp is durable: a replay reads the SAME instant back
    assert(Sinks.stableBatchTs(spark, dir, 7L) == ts)
  }
}
