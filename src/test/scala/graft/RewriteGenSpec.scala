package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{AtomicFiles, Sinks}

/** A local filesystem answering for the `frozenmt:` scheme whose
  * DIRECTORY mtimes never move — the S3/ABFS-class behavior (no real
  * directories, so nothing a writer does under a prefix changes any
  * "directory" timestamp). Registered via Hadoop conf
  * (fs.frozenmt.impl); file I/O is real local I/O, only the observable
  * directory mtime is pinned.
  */
class FrozenMtimeRawFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("frozenmt:///")
  override def getFileStatus(p: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus = {
    val st = super.getFileStatus(p)
    if (!st.isDirectory) st
    else new org.apache.hadoop.fs.FileStatus(st.getLen, true,
      st.getReplication, st.getBlockSize, /* frozen mtime */ 1234567890000L,
      st.getPath)
  }
}

/** Locks for the warehouse's CROSS-DRIVER freshness signal, object-store
  * edition (VERDICT r19 #1): `Sinks.freshenIfRewritten` originally keyed
  * on the table directory's mtime, which S3/ABFS-class stores do not
  * maintain — a foreign driver's rewrite under such a prefix moved no
  * mtime and the refresh silently never fired on exactly the 100 TB
  * deployment shape the guard exists for. The portable signal is the
  * `._rewritegen` sibling ledger ([[Sinks.stampRewriteGen]]), re-stamped
  * by every publish that changes a table's file set; these specs pin
  *
  *   1. the refresh DECISION on an mtime-frozen filesystem — a foreign
  *      rewrite that only the generation ledger announces still fires
  *      the refresh (and quiet steady-state reads stay refresh-free);
  *   2. the publish-side contract — every rewrite/append primitive
  *      re-stamps the generation, so no publish path can regress into
  *      mtime-only visibility;
  *   3. the first-observation rule — the FIRST guarded read of a path
  *      refreshes unconditionally (un-guarded reads elsewhere in the
  *      session may have populated the shared FileStatusCache before
  *      the guard ever saw the path — ADVICE r19).
  */
class RewriteGenSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def genOf(path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path + "._rewritegen")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicFiles.readLine(fs, p)
  }

  test("mtime-frozen filesystem: a foreign rewrite announced only by the generation ledger still fires the refresh") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.frozenmt.impl", classOf[FrozenMtimeRawFs].getName)
    val local = java.nio.file.Files.createTempDirectory("frozenmt").toString
    val path = s"frozenmt://$local/table"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p)
    // the scheme really is mtime-frozen — the premise of the spec
    val mt0 = fs.getFileStatus(p).getModificationTime
    fs.mkdirs(new org.apache.hadoop.fs.Path(path, "child"))
    assert(fs.getFileStatus(p).getModificationTime == mt0,
      "fixture broken: directory mtime moved")

    // first observation refreshes unconditionally (see spec 3 below);
    // from then on a QUIET table costs metadata only, no refresh
    assert(Sinks.freshenIfRewritten(spark, path))
    assert(!Sinks.freshenIfRewritten(spark, path))
    assert(!Sinks.freshenIfRewritten(spark, path))

    // a foreign driver's swap: files replaced under the prefix, no
    // directory mtime anywhere — ONLY the generation ledger moves
    // (every graft publish primitive stamps it; see the publish spec)
    Sinks.stampRewriteGen(spark, path)
    assert(Sinks.freshenIfRewritten(spark, path),
      "foreign rewrite was invisible on a store with no directory mtimes " +
        "— the r19 mtime-keyed guard's blind spot is back")
    assert(!Sinks.freshenIfRewritten(spark, path))

    // every subsequent foreign publish fires exactly once more
    Sinks.stampRewriteGen(spark, path)
    assert(Sinks.freshenIfRewritten(spark, path))
    assert(!Sinks.freshenIfRewritten(spark, path))
  }

  test("every publish primitive re-stamps the generation — swap, compaction, keyed delete, appends, current view, snapshot, recovery") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gen-pub").toString

    // plain store: create + append (idempotentAppend stamps both)
    val t1 = s"$dir/plain"
    Sinks.idempotentAppend((1L to 4L).toDF("id"), t1, Seq("id"), Nil)
    val g1 = genOf(t1)
    assert(g1.nonEmpty, "idempotentAppend create did not stamp a generation")
    Sinks.idempotentAppend((3L to 6L).toDF("id"), t1, Seq("id"), Nil)
    val g2 = genOf(t1)
    assert(g2.nonEmpty && g2 != g1, "append did not move the generation")
    // compaction (rewrite swap)
    Sinks.compact(spark, t1, targetFiles = 1)
    val g3 = genOf(t1)
    assert(g3.nonEmpty && g3 != g2, "compact did not move the generation")
    // keyed hard delete (rewrite swap)
    Sinks.deleteByKey(spark, t1, Seq(3L).toDF("id"), Seq("id"))
    val g4 = genOf(t1)
    assert(g4.nonEmpty && g4 != g3, "deleteByKey did not move the generation")
    // a MISS (no matching key) is a no-op publish: generation untouched
    Sinks.deleteByKey(spark, t1, Seq(99L).toDF("id"), Seq("id"))
    assert(genOf(t1) == g4, "no-op delete must not claim a rewrite")

    // current view overwrite + snapshot partition write
    val t2 = s"$dir/current"
    Sinks.writeCurrent((1 to 3).toDF("v"), t2)
    val c1 = genOf(t2)
    assert(c1.nonEmpty, "writeCurrent did not stamp a generation")
    Sinks.writeCurrent((4 to 6).toDF("v"), t2)
    assert(genOf(t2) != c1, "overwrite did not move the generation")
    val t3 = s"$dir/hist"
    Sinks.writeSnapshot((1 to 3).toDF("v"), t3,
      new java.sql.Timestamp(1700000000000L))
    assert(genOf(t3).nonEmpty, "writeSnapshot did not stamp a generation")

    // bucketed store: create, append, content rewrite
    val t4 = s"$dir/bucketed"
    Sinks.bucketedIdempotentAppend((1L to 4L).toDF("id"), t4,
      keys = Seq("id"), bucketKeys = Seq("id"), buckets = 2)
    val b1 = genOf(t4)
    assert(b1.nonEmpty, "bucketed create did not stamp a generation")
    Sinks.bucketedIdempotentAppend((3L to 8L).toDF("id"), t4,
      keys = Seq("id"), bucketKeys = Seq("id"), buckets = 2)
    val b2 = genOf(t4)
    assert(b2.nonEmpty && b2 != b1,
      "bucketed append did not move the generation")
    Sinks.rewriteBucketed(spark, t4,
      Sinks.readBucketedPath(spark, t4).filter($"id" =!= 5L))
    val b3 = genOf(t4)
    assert(b3.nonEmpty && b3 != b2,
      "bucketed rewrite swap did not move the generation")

    // crash-park recovery: absent -> present is a publish too
    val live = new org.apache.hadoop.fs.Path(t1)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(live, new org.apache.hadoop.fs.Path(t1 + "._compact_old")))
    assert(Sinks.recoverSwap(spark, t1))
    val g5 = genOf(t1)
    assert(g5.nonEmpty && g5 != g4, "recoverSwap did not move the generation")
  }

  test("the generation ledger survives dropStore only as long as the table: a drop sweeps it with the other ._ siblings") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("gen-drop").toString
    val t = s"$dir/t"
    Sinks.idempotentAppend((1L to 3L).toDF("id"), t, Seq("id"), Nil)
    assert(genOf(t).nonEmpty)
    graft.app.CorpusStore.dropStore(spark, t)
    assert(genOf(t).isEmpty,
      "a surviving ._rewritegen after dropStore would make a rebuilt " +
        "table's first publish look like a no-change to a reader that " +
        "stamped before the drop")
  }

  test("unreadable generation ledger fails toward refresh-every-read, never trust-the-cache") {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = java.nio.file.Files.createTempDirectory("gen-unreadable").toString
    val path = s"$dir/t"
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    fs.mkdirs(p)
    assert(Sinks.freshenIfRewritten(spark, path)) // first observation
    assert(!Sinks.freshenIfRewritten(spark, path))
    // a DIRECTORY where the ledger file should be: readLine's open
    // throws on every retry — persistently unreadable, not absent
    fs.mkdirs(new org.apache.hadoop.fs.Path(path + "._rewritegen"))
    assert(Sinks.freshenIfRewritten(spark, path),
      "an unreadable freshness signal must refresh, not trust the cache")
    assert(Sinks.freshenIfRewritten(spark, path),
      "persistent unreadability must KEEP refreshing (stale reads are " +
        "the guarded failure; a relist is only a cost)")
  }
}
