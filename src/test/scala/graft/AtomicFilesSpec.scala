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
/** A local filesystem answering for the `nofc:` scheme with NO
  * AbstractFileSystem (FileContext) binding, whose rename refuses —
  * forces AtomicFiles.writeAtomic down its third ladder rung (direct
  * single-PUT overwrite). Instantiated by Hadoop via reflection
  * (fs.nofc.impl).
  */
class NoFileContextRawFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("nofc:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean = false
}

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

  test("re-stamping a legacy checksummed ledger removes its .crc sidecar — a pre-change reader's checksummed open stays healthy") {
    val dir = Files.createTempDirectory("ledger-crc").toString
    val ledger = s"$dir/_watermark"
    val p = new org.apache.hadoop.fs.Path(ledger)
    val crc = new org.apache.hadoop.fs.Path(s"$dir/._watermark.crc")
    // legacy write through the CHECKSUMMED fs: data + .crc sidecar
    val cfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = cfs.create(p, true)
    try out.write("7".getBytes("UTF-8")) finally out.close()
    assert(cfs.exists(crc), "fixture did not produce a checksum sidecar")
    // the atomic re-stamp goes RAW; a raw rename alone would leave the
    // sidecar permanently stale — poisoning every CHECKSUMMED open a
    // pre-change reader makes from then on (ADVICE r17) — so a re-stamp
    // that finds a sidecar deletes JUST the sidecar first (never the
    // data file: that would re-open the torn-absence window for raw
    // readers; a checksummed open with no sidecar reads unverified)
    CorpusStore.writeLongLedger(spark, ledger, 8L)
    assert(!cfs.exists(crc),
      "first atomic re-stamp must remove the legacy .crc sidecar")
    assert(CorpusStore.readLongLedger(spark, ledger) == 8L)
    // a PRE-change (checksummed) reader of the re-stamped ledger: no
    // ChecksumException, correct content
    val in = cfs.open(p)
    val legacyRead =
      try new java.io.BufferedReader(new java.io.InputStreamReader(in))
        .readLine()
      finally in.close()
    assert(legacyRead == "8",
      s"checksummed read after re-stamp returned $legacyRead")
    // subsequent re-stamps are the pure atomic rename — no sidecar ever
    // reappears
    CorpusStore.writeLongLedger(spark, ledger, 9L)
    assert(!cfs.exists(crc) && CorpusStore.readLongLedger(spark, ledger) == 9L)
  }

  test("scheme-ladder rung 3: no FileContext binding -> direct single-PUT overwrite, no temp residue") {
    // a scheme whose FileSystem exists but has no AbstractFileSystem
    // binding (some object stores): writeAtomic's rename returns false,
    // the FileContext lookup throws UnsupportedFileSystemException, and
    // the publish falls back to a direct create — a single PUT, atomic
    // at read level on those stores
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.nofc.impl", classOf[NoFileContextRawFs].getName)
    val dir = Files.createTempDirectory("ledger-nofc").toString
    val fs = new org.apache.hadoop.fs.Path(s"nofc://$dir/_watermark")
      .getFileSystem(conf)
    val p = new org.apache.hadoop.fs.Path(s"$dir/_watermark")
    graft.core.AtomicFiles.writeAtomic(fs, p, "11")
    assert(graft.core.AtomicFiles.readLine(fs, p).contains("11"))
    // the failed-rename temp was cleaned before the direct PUT
    val residue = new java.io.File(dir).listFiles()
      .filter(_.getName.contains(".tmp-"))
    assert(residue.isEmpty, s"rung-3 left temp residue: ${residue.toSeq}")
    // overwrite through the same rung
    graft.core.AtomicFiles.writeAtomic(fs, p, "12")
    assert(graft.core.AtomicFiles.readLine(fs, p).contains("12"))
  }

  test("dropStore sweeps EVERY ._* sibling: ledgers, writeAtomic .tmp-* residue, and a parked compaction dir") {
    import org.apache.spark.sql.functions.lit
    val dir = Files.createTempDirectory("ledger-residue").toString
    val table = s"$dir/store"
    spark.range(3).select(lit("x").as("v")).write.parquet(table)
    // a ledger family OUTSIDE the old fixed list: stale after a
    // drop-and-rebuild it would SKIP guarded work (the dangerous
    // direction; absent fail-safes to -1 = re-do)
    CorpusStore.writeLongLedger(spark, s"$table._promoted_upto", 5L)
    // a writer crashed between writeAtomic's temp create and its rename:
    // documented-inert residue, previously immortal (ADVICE r17)
    Files.write(java.nio.file.Paths.get(s"$table._watermark.tmp-deadbeef"),
      "torn".getBytes("UTF-8"))
    // a parked compaction copy: left behind, the DROPPED table would
    // read as crash-parked ("run repair") instead of absent
    Files.createDirectories(java.nio.file.Paths.get(s"$table._compact_old"))
    Files.write(java.nio.file.Paths.get(s"$table._compact_old/part-0"),
      "old".getBytes("UTF-8"))
    // an UNRELATED sibling's residue must survive this table's drop
    Files.write(java.nio.file.Paths.get(s"$dir/other._watermark.tmp-ffffffff"),
      "torn".getBytes("UTF-8"))
    CorpusStore.dropStore(spark, table)
    val left = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!left.exists(_.startsWith("store")),
      s"dropStore left table residue: $left")
    assert(left.contains("other._watermark.tmp-ffffffff"),
      "dropStore must not sweep a different table's residue")
    // and the dropped table reads ABSENT, not crash-parked
    assert(!Sinks.storePresent(spark, table))
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
