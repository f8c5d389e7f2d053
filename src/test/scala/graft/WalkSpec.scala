package graft

import java.nio.file.Files

import graft.core.{AtomicFiles, WarehouseWalk}
import org.scalatest.funsuite.AnyFunSuite

/** A local filesystem answering for the `walkct:` scheme that counts
  * `listStatus` calls per directory — the instrument for WarehouseWalk's
  * cost contract (exactly one listing batch per visited directory, no
  * directory visited twice, control dirs never visited). Instantiated by
  * Hadoop via reflection (fs.walkct.impl).
  */
class CountingListRawFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("walkct:///")
  override def listStatus(p: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] = {
    CountingListRawFs.counts.merge(p.toUri.getPath, Int.box(1),
      (a: Integer, b: Integer) => Int.box(a + b))
    super.listStatus(p)
  }
}
object CountingListRawFs {
  val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}

/** A local filesystem answering for the `walkslow:` scheme that charges
  * every `listStatus` a fixed latency — the round-trip-bound shape of a
  * remote metadata store (S3/ABFS-class), where the walk's pool either
  * hides the latency or doesn't.
  */
class SlowListRawFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("walkslow:///")
  override def listStatus(p: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] = {
    Thread.sleep(SlowListRawFs.latencyMs)
    super.listStatus(p)
  }
}
object SlowListRawFs {
  val latencyMs = 5L
}

/** A local filesystem answering for the `walkvan:` scheme where any
  * directory named `vanished` lists from its parent but throws
  * FileNotFoundException on its own listing — the shape of a table a
  * live writer drops between a lease-free scan's two metadata calls.
  */
class VanishingDirRawFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("walkvan:///")
  override def listStatus(p: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] =
    if (p.getName == "vanished")
      throw new java.io.FileNotFoundException(p.toString)
    else super.listStatus(p)
}

/** The shared warehouse traversal (core/WarehouseWalk): ONE driver-side
  * walk feeds every residue recognizer — parked swaps + writeAtomic temp
  * residue — at exactly one `listStatus` batch per directory. Before the
  * seam, fsck ran the same traversal once per census; these lock that
  * the fold kept both findings correct AND halved the metadata bill.
  */
class WalkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** A scratch warehouse exercising every walk verdict:
    *   - `t1` crash-parked (`t1._compact_old` present, live absent)
    *   - `t2` live, with ledger temp residue AND a healthy ledger
    *   - `snap_ts=5/` nested dir with commit-marker residue (the
    *     non-sibling-ledger residue shape the r18 recognizer missed)
    *   - `._checkpoints`-style control dir that must never be descended
    */
  private def buildTree(): String = {
    val dir = Files.createTempDirectory("walk-tree").toString
    def mkdir(p: String) = Files.createDirectories(java.nio.file.Paths.get(p))
    def touch(p: String) = Files.write(java.nio.file.Paths.get(p),
      "x".getBytes("UTF-8"))
    mkdir(s"$dir/t1._compact_old"); touch(s"$dir/t1._compact_old/part-0")
    mkdir(s"$dir/t2"); touch(s"$dir/t2/part-0")
    touch(s"$dir/t2._watermark")
    touch(s"$dir/t2._watermark.tmp-deadbeef")
    mkdir(s"$dir/snap_ts=5"); touch(s"$dir/snap_ts=5/_snap_commit")
    touch(s"$dir/snap_ts=5/_snap_commit.tmp-01234567")
    mkdir(s"$dir/._ctl"); touch(s"$dir/._ctl/inner.tmp-deadbeef")
    // a parked pair WITH its live twin present = healthy mid-swap
    // stage-out or pre-drop residue, NOT parked
    mkdir(s"$dir/t3"); touch(s"$dir/t3/part-0")
    mkdir(s"$dir/t3._compact_old")
    dir
  }

  test("one scan, both recognizers: parked swaps and temp residue off a single traversal") {
    val dir = buildTree()
    val scan = WarehouseWalk.scan(spark, dir)
    assert(scan.parkedSwaps.map(_.split('/').last) == Seq("t1._compact_old"),
      s"parked: ${scan.parkedSwaps}")
    val residue = scan.tempResidue.map(_._1.split('/').last).sorted
    assert(residue == Seq("_snap_commit.tmp-01234567",
      "t2._watermark.tmp-deadbeef"),
      s"residue (must include the non-sibling commit-marker shape and " +
        s"exclude the control dir's): $residue")
    // mtimes ride along for the age bound
    assert(scan.tempResidue.forall(_._2 > 0L))
  }

  test("cost contract: exactly one listStatus batch per directory, control dirs never listed") {
    val dir = buildTree()
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.walkct.impl", classOf[CountingListRawFs].getName)
    CountingListRawFs.counts.clear()
    val scan = WarehouseWalk.scan(spark, s"walkct://$dir")
    // findings are intact through the counting scheme
    assert(scan.parkedSwaps.map(_.split('/').last) == Seq("t1._compact_old"))
    assert(scan.tempResidue.size == 2)
    val visited = CountingListRawFs.counts.keySet()
      .toArray(Array.empty[String]).map(_.split('/').last).toSet
    val counts = CountingListRawFs.counts.values()
      .toArray(Array.empty[Integer]).map(_.intValue())
    assert(counts.forall(_ == 1),
      s"a directory was listed more than once: ${CountingListRawFs.counts}")
    assert(visited == Set(dir.split('/').last, "t2", "snap_ts=5", "t3"),
      s"visited set drifted (control/parked dirs must not be listed): $visited")
  }

  test("parallel walk: a wide warehouse lists each directory exactly once and misses nothing") {
    // wide enough that the bounded pool genuinely interleaves (16
    // workers over ~300 dirs), with plants scattered through the range:
    // locks that the parallel traversal neither double-lists nor drops
    // a subtree, and that the findings come back in deterministic order
    val dir = Files.createTempDirectory("walk-wide").toString
    def mkdir(p: String) = Files.createDirectories(java.nio.file.Paths.get(p))
    def touch(p: String) = Files.write(java.nio.file.Paths.get(p),
      "x".getBytes("UTF-8"))
    val parkedIdx = Seq(7, 131, 288)
    val residueIdx = Seq(19, 140, 299)
    (0 until 300).foreach { i =>
      mkdir(s"$dir/t$i"); touch(s"$dir/t$i/part-0")
      if (residueIdx.contains(i)) touch(s"$dir/t$i/._spec.tmp-deadbeef")
    }
    parkedIdx.foreach { i =>
      // parked = `tN._compact_old` present with the live twin REMOVED
      mkdir(s"$dir/p$i._compact_old"); touch(s"$dir/p$i._compact_old/part-0")
    }
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.walkct.impl", classOf[CountingListRawFs].getName)
    CountingListRawFs.counts.clear()
    val scan = WarehouseWalk.scan(spark, s"walkct://$dir")
    assert(scan.parkedSwaps.map(_.split('/').last) ==
      parkedIdx.map(i => s"p$i._compact_old").sorted,
      s"parked: ${scan.parkedSwaps}")
    // the residue's parent dir names, in the scan's path-sorted order
    assert(scan.tempResidue.map(_._1.split('/').takeRight(2).head) ==
      residueIdx.map(i => s"t$i").sortBy(t => s"$dir/$t"),
      s"residue: ${scan.tempResidue}")
    val counts = CountingListRawFs.counts.values()
      .toArray(Array.empty[Integer]).map(_.intValue())
    assert(counts.length == 301 && counts.forall(_ == 1),
      s"expected 301 single-listing visits, got ${counts.length} dirs, " +
        s"max count ${if (counts.isEmpty) 0 else counts.max}")
  }

  test("the pool genuinely hides remote listing latency: wall stays far under the serial round-trip bound") {
    // 150 table dirs × 5 ms per listing = 755 ms if the walk paid the
    // round-trips serially (the pre-r19 shape); 16 concurrent listings
    // bound it near 150/16 × 5 ms ≈ 50 ms. Assert < half the serial
    // bound — a ~7× headroom over the expected wall, so scheduler jitter
    // on a loaded box can't flake it, while a regression to a serial
    // walk (the failure this locks against) overshoots by 2×.
    val dir = Files.createTempDirectory("walk-slow").toString
    val nDirs = 150
    (0 until nDirs).foreach { i =>
      Files.createDirectories(java.nio.file.Paths.get(s"$dir/t$i"))
      Files.write(java.nio.file.Paths.get(s"$dir/t$i/part-0"),
        "x".getBytes("UTF-8"))
    }
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.walkslow.impl", classOf[SlowListRawFs].getName)
    val t0 = System.nanoTime()
    val scan = WarehouseWalk.scan(spark, s"walkslow://$dir")
    val wallMs = (System.nanoTime() - t0) / 1000000L
    assert(scan.parkedSwaps.isEmpty && scan.tempResidue.isEmpty)
    val serialBoundMs = (nDirs + 1) * SlowListRawFs.latencyMs
    assert(wallMs < serialBoundMs / 2,
      s"walk took $wallMs ms against a $serialBoundMs ms serial bound — " +
        "the pool is not hiding listing latency")
  }

  test("a directory dropped between its parent's listing and its own is skipped, not crashed on") {
    val dir = Files.createTempDirectory("walk-vanish").toString
    def mkdir(p: String) = Files.createDirectories(java.nio.file.Paths.get(p))
    def touch(p: String) = Files.write(java.nio.file.Paths.get(p),
      "x".getBytes("UTF-8"))
    mkdir(s"$dir/t1"); touch(s"$dir/t1/part-0")
    touch(s"$dir/t1/._spec.tmp-deadbeef")
    mkdir(s"$dir/vanished"); touch(s"$dir/vanished/part-0")
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.walkvan.impl", classOf[VanishingDirRawFs].getName)
    val scan = WarehouseWalk.scan(spark, s"walkvan://$dir")
    // the vanished table contributes nothing; the rest of the scan is
    // unaffected — fsck completes on a warehouse that is being worked on
    assert(scan.tempResidue.map(_._1.split('/').last) ==
      Seq("._spec.tmp-deadbeef"), s"residue: ${scan.tempResidue}")
    assert(scan.parkedSwaps.isEmpty)
  }

  test("isTempResidue matches exactly writeAtomic's stamp shape — all its target families, nothing looser") {
    // sibling-ledger family (the r18 shape)
    assert(AtomicFiles.isTempResidue("documents._watermark.tmp-deadbeef"))
    // non-sibling families writeAtomic also stamps (ADVICE r18: their
    // residue was invisible to the census and immortal)
    assert(AtomicFiles.isTempResidue("batch-3.tmp-abcdef01"))
    assert(AtomicFiles.isTempResidue("_snap_commit.tmp-01234567"))
    assert(AtomicFiles.isTempResidue("_export_commit.tmp-00ff00ff"))
    // not writeAtomic's shape: wrong nonce length / alphabet / case,
    // empty target name, or no marker at all
    assert(!AtomicFiles.isTempResidue("x.tmp-abc"))
    assert(!AtomicFiles.isTempResidue("x.tmp-deadbeef9"))
    assert(!AtomicFiles.isTempResidue("x.tmp-DEADBEEF"))
    assert(!AtomicFiles.isTempResidue("x.tmp-ghijklmn"))
    assert(!AtomicFiles.isTempResidue(".tmp-deadbeef"))
    assert(!AtomicFiles.isTempResidue("part-00000.parquet"))
    assert(!AtomicFiles.isTempResidue("_temporary"))
    // right nonce SHAPE but no control-family marker in the target name
    // (ADVICE r19): an operator-placed or externally-written file that
    // coincidentally matches the generic `<any>.tmp-hex8` pattern is a
    // bystander — the age bound protects live writers, this family gate
    // protects innocent files from repair's delete
    assert(!AtomicFiles.isTempResidue("data.tmp-12345678"))
    assert(!AtomicFiles.isTempResidue("backup.tar.tmp-0a1b2c3d"))
    // the family gate is self-enforcing at the WRITE: a writeAtomic
    // target outside every recognized family is refused loudly, so a
    // new ledger family cannot ship with census-invisible residue
    val badTarget = new org.apache.hadoop.fs.Path(
      java.nio.file.Files.createTempDirectory("walk-badtgt").toString,
      "data")
    val fs = badTarget.getFileSystem(
      TestSpark.spark.sparkContext.hadoopConfiguration)
    val refused = intercept[IllegalArgumentException] {
      AtomicFiles.writeAtomic(fs, badTarget, "1")
    }
    assert(refused.getMessage.contains("isControlTargetName"))
  }
}
