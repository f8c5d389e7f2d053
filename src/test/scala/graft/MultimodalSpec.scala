package graft

import graft.operators.Multimodal
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("binary plumbing: schema, partition-batched decode, deterministic features") {
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "image", "fake-png-payload".getBytes("UTF-8"), "s3://x/1"),
        Row(2L, "audio", "fake-wav".getBytes("UTF-8"), "s3://x/2"),
        Row(3L, "image", Array.emptyByteArray, "s3://x/3")), 2),
      Multimodal.mediaSchema)
    val out = Multimodal.extractFeatures(media)
    assert(out.schema == Multimodal.featureSchema)
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(2) == 16L) // n_bytes
    assert(rows(3L).getLong(2) == 0L)  // empty payload doesn't crash the stub
    // deterministic: same payload → same checksum, on any partitioning
    val again = Multimodal.extractFeatures(media.repartition(3)).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    rows.foreach { case (id, r) => assert(again(id) == r.getLong(5)) }
    // width/height in the stub's declared ranges
    assert(out.collect().forall(r => r.getInt(3) >= 640 && r.getInt(4) >= 360))
  }

  test("resize plumbing: target dims carried, output bounded, null/empty safe") {
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "image", Array.fill(4096)(7.toByte), "s3://x/1"),
        Row(2L, "image", null, "s3://x/2"),
        Row(3L, "image", Array.emptyByteArray, "s3://x/3")), 2),
      Multimodal.mediaSchema)
    val out = Multimodal.resizeMedia(media, targetW = 64, targetH = 64)
    assert(out.schema == Multimodal.resizedSchema)
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(1) == 64 && byId(1L).getInt(2) == 64)
    val resized = byId(1L).getAs[Array[Byte]]("content")
    assert(resized.length == 4, s"64*64/1024 = 4 bytes, got ${resized.length}")
    assert(byId(2L).getAs[Array[Byte]]("content") == null)
    assert(byId(3L).getAs[Array[Byte]]("content").isEmpty)
    // deterministic under repartitioning
    val again = Multimodal.resizeMedia(media.repartition(3), 64, 64).collect()
      .map(r => r.getLong(0) -> Option(r.getAs[Array[Byte]]("content")).map(_.toSeq)).toMap
    byId.foreach { case (id, r) =>
      assert(again(id) == Option(r.getAs[Array[Byte]]("content")).map(_.toSeq))
    }
  }

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real decode: a PNG payload yields its true dimensions, non-image falls back to stub") {
    val png = pngBytes(123, 45)
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "image", png, "s3://x/1.png"),
        Row(2L, "audio", "not-an-image".getBytes("UTF-8"), "s3://x/2")), 2),
      Multimodal.mediaSchema)
    val byId = Multimodal.extractFeatures(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getInt(3) == 123 && byId(1L).getInt(4) == 45,
      "javax.imageio must read the PNG header's true dimensions")
    val (sw, sh, _) = Multimodal.decodeStub("not-an-image".getBytes("UTF-8"))
    assert(byId(2L).getInt(3) == sw && byId(2L).getInt(4) == sh,
      "undecodable payload must take the labeled stub path")
  }

  test("real resize: PNG payload re-encodes at target dimensions and stays decodable") {
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L, "image", pngBytes(100, 80), "s"))),
      Multimodal.mediaSchema)
    val out = Multimodal.resizeMedia(media, targetW = 32, targetH = 16).collect()(0)
    val resized = out.getAs[Array[Byte]]("content")
    val dims = Multimodal.decodeImage(resized)
    assert(dims.contains((32, 16)),
      s"resized payload must be a real 32x16 image, decoded $dims")
  }

  test("frame sampling: every step-th fixed-size frame, short tail kept") {
    val payload = Array.tabulate(1000)(i => (i % 251).toByte) // 4 frames of 256
    val media = Seq((1L, payload)).toDF("media_id", "content")
    val out = Multimodal.sampleFrames(media, frameBytes = 256, step = 1)
      .orderBy("frame_idx").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.map(_.getLong(3)).toSeq == Seq(256L, 256L, 256L, 232L),
      "tail frame keeps its true length")
    val sampled = Multimodal.sampleFrames(media, frameBytes = 256, step = 2)
      .select("frame_idx").as[Long].collect().sorted.toSeq
    assert(sampled == Seq(0L, 2L), "step must skip frames, not truncate them")
  }

  // -- perceptual hash ------------------------------------------------------

  /** PNG of a resolution-independent smooth pattern: channel values are a
    * pure function of the NORMALIZED coordinates (x/w, y/h), so renderings
    * at different sizes depict the same scene.
    */
  private def scenePng(w: Int, h: Int, shift: Int = 0, invert: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach { x =>
      (0 until h).foreach { y =>
        val u = x.toDouble / w; val v = y.toDouble / h
        val base = (60 + 120 * math.sin(3 * u + 1) * math.cos(2 * v)).toInt.max(0).min(200)
        val c = (if (invert) 200 - base else base) + shift
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("averageHash: exact brightness invariance, inversion far apart, undecodable None") {
    val h0 = Multimodal.averageHash(scenePng(40, 30)).get
    val hShift = Multimodal.averageHash(scenePng(40, 30, shift = 7)).get
    assert(h0 == hShift,
      "uniform brightness shift must leave the hash bit-identical (exact integer thresholding)")
    val hInv = Multimodal.averageHash(scenePng(40, 30, invert = true)).get
    assert(hamming(h0, hInv) >= 20,
      s"inverted scene must sit far away, got hamming ${hamming(h0, hInv)}")
    assert(Multimodal.averageHash("not an image".getBytes("UTF-8")).isEmpty)
    // blank image is the degenerate all-ones hash the banding guard drops
    val blank = {
      val img = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Multimodal.averageHash(bos.toByteArray).get
    }
    assert(blank == -1L, "flat image: every cell mean equals the grid mean")
  }

  test("averageHash: resolution-invariant within the banding budget") {
    val small = Multimodal.averageHash(scenePng(16, 16)).get
    val big = Multimodal.averageHash(scenePng(48, 48)).get
    assert(hamming(small, big) <= 3,
      s"same scene at 16x16 vs 48x48 must hash within 3 bits, got ${hamming(small, big)}")
  }

  test("nearDupFromHashes: pigeonhole recall at the hamming boundary, exact cutoff above it") {
    val h = 0x5a5a_1234_9abc_def0L
    val h3 = h ^ (1L << 5) ^ (1L << 20) ^ (1L << 60)  // hamming 3: spread across chunks
    val h4 = h ^ 0xfL                                  // hamming 4: all flips in ONE chunk,
                                                       // so 3 chunks still match — banding
                                                       // candidates it, verify must reject
    val hashes = Seq((1L, h), (2L, h3), (3L, h4)).toDF("media_id", "phash")
    val pairs = Multimodal.nearDupFromHashes(hashes, maxHamming = 3)
      .orderBy("media_a", "media_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs.contains((1L, 2L, 3L)), s"hamming-3 pair must be recovered, got $pairs")
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 3L),
      "hamming-4 pair shares 3 chunks (candidate) but must fail exact verify")
  }

  test("phashNearDup end-to-end: planted near-dups found, strangers and blanks excluded, deterministic") {
    def blankPng: Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "image", scenePng(32, 24), "s"),
        Row(2L, "image", scenePng(32, 24, shift = 5), "s"),      // planted: brightness
        Row(3L, "image", scenePng(16, 16), "s"),                 // planted: resolution
        Row(4L, "image", scenePng(32, 24, invert = true), "s"),  // stranger
        Row(5L, "image", blankPng, "s"),                         // degenerate — dropped
        Row(6L, "image", blankPng, "s"),                         // (would pair with 5)
        Row(7L, "audio", "undecodable".getBytes("UTF-8"), "s")), 3),
      Multimodal.mediaSchema)
    val pairs = Multimodal.phashNearDup(media, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"brightness-shifted pair missing from $pairs")
    assert(pairs.contains((1L, 3L)), s"resolution pair missing from $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"inverted stranger paired: $pairs")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L || p._1 == 6L || p._2 == 6L),
      "blank images must be dropped by the degenerate-hash guard, not flood the bucket join")
    val again = Multimodal.phashNearDup(media.repartition(5), maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again == pairs, "pairs must be partitioning-independent")
  }

  test("syntheticImageCorpus: planted pairs hash identical, unique seeds far apart") {
    val docs = (0L until 40L).toDF("doc_id")
    val hashes = Multimodal.imageHashes(Multimodal.syntheticImageCorpus(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes.size == 40 && hashes(0L) == hashes(1L) && hashes(10L) == hashes(11L),
      "the +2-brightness member must hash bit-identical to its base")
    assert(hashes(20L) == hashes(21L) && hashes(30L) == hashes(31L),
      "every (10k, 10k+1) pair is planted")
    // non-planted neighbours must not collide within the banding budget
    assert(hamming(hashes(2L), hashes(3L)) > 3)
    assert(hamming(hashes(22L), hashes(23L)) > 3)
  }

  test("incremental phash equals the full recompute restricted to new-side pairs") {
    val imgs = Multimodal.syntheticImageCorpus((0L until 150L).toDF("doc_id"))
    val isNew = col("media_id") % 7 === 0
    val full = Multimodal.phashNearDup(imgs, maxHamming = 3)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    val wantNewSide = full.filter(p => p._1 % 7 == 0 || p._2 % 7 == 0)
    val got = Multimodal.phashNearDupIncremental(
      Multimodal.phashBandTable(imgs.filter(!isNew)),
      imgs.filter(isNew), maxHamming = 3)
      .select("media_a", "media_b").as[(Long, Long)].collect().toSet
    assert(got == wantNewSide,
      s"extra=${got -- wantNewSide} missing=${wantNewSide -- got}")
    // (0,1) probes store-from-drop, (20,21) drop-from-store: both directions
    assert(got.contains((0L, 1L)) && got.contains((20L, 21L)), s"$got")
    assert((full -- wantNewSide).nonEmpty,
      "split should leave old-old pairs out of the increment")
    graft.core.GraftCaches.releaseAll(spark)
  }

  test("phash store: bucketed round-trip, replay no-op, zero store-side exchange/sort") {
    import graft.core.Sinks
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val dir = java.nio.file.Files.createTempDirectory("phashstore").toString
    val bandP = s"$dir/phash_bands"
    val base = Multimodal.syntheticImageCorpus((0L until 60L).toDF("doc_id"))
    Multimodal.appendPhashStoreBucketed(
      base.filter(col("media_id") % 7 =!= 0), bandP, buckets = 2)
    graft.core.GraftCaches.releaseAll(spark)
    assert(Sinks.isBucketedStore(spark, bandP))
    val rows = spark.read.parquet(bandP).count()
    Multimodal.appendPhashStoreBucketed(
      base.filter(col("media_id") % 7 =!= 0), bandP, buckets = 2)
    graft.core.GraftCaches.releaseAll(spark)
    assert(spark.read.parquet(bandP).count() == rows,
      "replayed append duplicated store rows")

    val confs = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val olds = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pairs = Multimodal.phashNearDupIncremental(
        Sinks.readBucketedPath(spark, bandP),
        base.filter(col("media_id") % 7 === 0), maxHamming = 3)
      def storeNodes(pf: PartialFunction[org.apache.spark.sql.execution.SparkPlan, org.apache.spark.sql.execution.SparkPlan]) =
        pairs.queryExecution.executedPlan.collect(pf).filter { n =>
          val leaves = n.children.flatMap(_.collectLeaves())
          leaves.nonEmpty && leaves.forall(_.toString.contains("phash_bands"))
        }
      assert(storeNodes { case e: ShuffleExchangeLike => e }.isEmpty,
        s"store side re-shuffles:\n${pairs.queryExecution.executedPlan}")
      assert(storeNodes {
        case s: org.apache.spark.sql.execution.SortExec => s }.isEmpty,
        s"store side re-sorts:\n${pairs.queryExecution.executedPlan}")
      val got = pairs.select("media_a", "media_b").as[(Long, Long)].collect().toSet
      assert(got.contains((0L, 1L)) && got.contains((20L, 21L)), s"$got")
    } finally olds.foreach { case (k, v) => spark.conf.set(k, v) }
    graft.core.GraftCaches.releaseAll(spark)
  }
}
