package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: media payloads ride as opaque `binary` columns with
  * typed metadata; decode / feature-extract run per partition in batches.
  *
  * Image payloads decode/resize for REAL via javax.imageio (PNG/BMP/GIF/
  * JPEG ship in the JDK); payloads no JDK reader recognizes (audio/video —
  * ffmpeg is not in this container) fall back to the clearly-marked
  * deterministic `decodeStub`/`resizeStub`, keeping the Spark-side plumbing
  * (schema, binary column handling, partition-batched extraction shape)
  * identical on both paths. At scale the binary column is read from
  * parquet/`binaryFile` sources with `spark.sql.files.maxPartitionBytes`
  * sized so a partition of payloads fits executor memory; extraction is a
  * narrow per-partition map (no shuffle).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("content", BinaryType),
    StructField("meta_source", StringType)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("checksum", LongType)))

  /** STUB decoder: the no-codec fallback for payloads the JDK cannot parse
    * (audio/video — ffmpeg is not in this container). Deterministic fake:
    * dimensions derived from payload length, checksum from bytes.
    */
  def decodeStub(content: Array[Byte]): (Int, Int, Long) = {
    var sum = 0L
    var i = 0
    while (i < content.length) { sum = sum * 31 + (content(i) & 0xff); i += 1 }
    (640 + (content.length % 640), 360 + (content.length % 360), sum)
  }

  // avoid per-task tmp-file churn from ImageIO's disk cache on executors
  javax.imageio.ImageIO.setUseCache(false)

  /** REAL image decode via javax.imageio (in the JDK — PNG/BMP/GIF/JPEG/
    * WBMP, no external codecs): header-only width/height read through the
    * format's ImageReader, so feature extraction never materializes pixel
    * buffers. None for payloads no JDK reader recognizes → decodeStub.
    */
  def decodeImage(content: Array[Byte]): Option[(Int, Int)] =
    if (content.length < 8) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try { r.setInput(iis); Some((r.getWidth(0), r.getHeight(0))) }
          finally r.dispose()
        }
      } finally if (iis != null) iis.close()
    } catch { case scala.util.control.NonFatal(_) => None } // corrupt header → fallback

  /** Partition-batched feature extraction over a media DataFrame — the
    * mapInPandas-shaped stage: iterate rows inside a partition, decode each
    * payload once, emit the typed feature row.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(featureSchema)
    media.select(col("media_id"), col("kind"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val content = r.getAs[Array[Byte]]("content")
          if (content == null) // missing payload → null features, not an NPE
            Row(r.getLong(0), r.getString(1), null, null, null, null)
          else {
            val (sw, sh, sum) = decodeStub(content)
            // real dimensions when the JDK can parse the payload; the
            // deterministic stub dims otherwise (checksum is bytes either way)
            val (w, h) = decodeImage(content).getOrElse((sw, sh))
            Row(r.getLong(0), r.getString(1), content.length.toLong, w, h, sum)
          }
        }
      }(enc)
  }

  /** REAL image resize for JDK-decodable payloads: decode, bilinear-scale
    * on a BufferedImage, re-encode PNG — all in javax.imageio/java.awt
    * (headless-safe). None when no reader recognizes the payload.
    */
  def resizeImage(content: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(
          targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, targetW, targetH, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB resize: the no-codec fallback (the payload is resampled by
    * striding so output size tracks the target dimensions); null-safe like
    * decodeStub.
    */
  def resizeStub(content: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    val targetLen = math.max(1, (targetW.toLong * targetH / 1024).toInt)
    if (content.isEmpty) Array.emptyByteArray
    else {
      val out = new Array[Byte](math.min(targetLen, content.length))
      val stride = math.max(1, content.length / out.length)
      var i = 0
      while (i < out.length) { out(i) = content(i * stride); i += 1 }
      out
    }
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("content", BinaryType)))

  /** Partition-batched resize stage — same narrow no-shuffle shape as
    * extractFeatures, emitting the re-encoded payload with its new
    * dimensions.
    */
  def resizeMedia(media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val enc = RowEncoder.encoderFor(resizedSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          val content = r.getAs[Array[Byte]]("content")
          if (content == null) Row(r.getLong(0), targetW, targetH, null)
          else Row(r.getLong(0), targetW, targetH,
            resizeImage(content, targetW, targetH)
              .getOrElse(resizeStub(content, targetW, targetH)))
        }
      }(enc)
  }

  /** Frame sampling: the payload as fixed-size frames, every `step`-th one
    * emitted. Declarative (sequence + explode + substring over binary), so
    * it stays in codegen, needs no UDF, and is oracle-expressible — the
    * generator-shaped stage of a video pipeline as a Spark plan.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, step: Int): DataFrame =
    media
      .filter(col("content").isNotNull && octet_length(col("content")) > 0)
      .withColumn("frame_idx", explode(expr(
        s"sequence(0, int(ceil(octet_length(content) / ${frameBytes}D)) - 1, $step)")))
      .withColumn("frame", expr(
        s"substring(content, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(col("frame")).as("frame_md5"),
        octet_length(col("frame")).cast("long").as("frame_bytes"))

  // ---------------------------------------------------------------------
  // Perceptual near-duplicate detection (average-hash / aHash)
  // ---------------------------------------------------------------------

  /** 64-bit average-hash (aHash) of an image payload: decode via
    * javax.imageio, area-average per-pixel luminance (r+g+b, no division)
    * onto an 8×8 cell grid, then set bit i iff cell i's mean luminance is
    * >= the whole-grid mean. The threshold comparison is done with exact
    * cross-multiplied Long arithmetic — `cellSum*totalCount >=
    * totalSum*cellCount` — never floating point, so a uniform brightness
    * shift of +δ per channel (which adds 3δ to every pixel's luminance)
    * provably leaves every comparison, hence the hash, bit-identical.
    * Exact up to ~8192×8192 images (765·w·h·max(cellCount) stays inside
    * Long). None when no JDK reader recognizes the payload.
    *
    * Downscaling to the fixed 8×8 grid makes the hash resolution-invariant:
    * the same scene rendered at different sizes lands within a few bits.
    */
  def averageHash(content: Array[Byte]): Option[Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null || img.getWidth < 1 || img.getHeight < 1) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Long](64)
        val counts = new Array[Long](64)
        var y = 0
        while (y < h) {
          val cy = y * 8 / h
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            val i = cy * 8 + x * 8 / w
            sums(i) += lum
            counts(i) += 1
            x += 1
          }
          y += 1
        }
        var totalSum = 0L
        var totalCount = 0L
        var i = 0
        while (i < 64) { totalSum += sums(i); totalCount += counts(i); i += 1 }
        var hash = 0L
        i = 0
        while (i < 64) {
          // cellMean >= gridMean, exactly: sums/counts >= totalSum/totalCount
          if (counts(i) > 0 && sums(i) * totalCount >= totalSum * counts(i))
            hash |= 1L << i
          i += 1
        }
        Some(hash)
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private val hashSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("phash", LongType, nullable = true)))

  /** Per-image aHash — the same narrow partition-batched shape as
    * extractFeatures (decode once per payload, no shuffle). Undecodable or
    * null payloads carry a null phash and drop out of downstream joins.
    */
  def imageHashes(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(hashSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          // positional access: upstream mapPartitions stages (e.g. the
          // synthetic corpus) emit schema-less GenericRows
          val content = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val ph =
            if (content == null) None
            else averageHash(content)
          Row(r.getLong(0), ph.map(Long.box).orNull)
        }
      }(enc)
  }

  /** Perceptual near-dup pairs at hamming <= maxHamming over the aHash,
    * simhash-style chunk banding (cf. DedupOps.simhash): split the 64-bit
    * hash into maxHamming+1 equal chunks — two hashes within maxHamming
    * bits MUST agree on at least one whole chunk (pigeonhole), so the
    * bucket self-join on (chunk_idx, chunk_value) has guaranteed recall;
    * `bit_count(xor)` then verifies candidates exactly.
    *
    * Scale shape: decode is a narrow map; the hash table is ONE long per
    * image, persisted once (Spark does not CSE across self-join branches);
    * the band table is maxHamming+1 thin rows per image; the candidate
    * join shuffles only (id, chunk, hash) triples keyed by 16-bit chunk
    * values. Blank/flat images all hash to the all-ones degenerate value
    * and would form one quadratic bucket — they are dropped up front
    * (dropDegenerate), the same df-cap reasoning as the n-gram blacklist.
    */
  def phashNearDup(media: DataFrame, maxHamming: Int = 3,
                   dropDegenerate: Boolean = true): DataFrame = {
    val base = imageHashes(media).filter(col("phash").isNotNull)
    nearDupFromHashes(
      if (dropDegenerate) base.filter(col("phash") =!= lit(-1L)) else base,
      maxHamming)
  }

  /** Chunk-band rows for a (media_id, phash) table: maxHamming+1 rows per
    * image, (media_id, ci, chunk, phash) — the phash rides along so the
    * band join verifies candidates inline with bit_count, no second join.
    */
  private def bandChunks(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && 64 % (maxHamming + 1) == 0,
      s"maxHamming+1 must divide 64, got $maxHamming")
    val chunks = maxHamming + 1
    val bits = 64 / chunks
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    hashes.select(
      col("media_id"), col("phash"),
      explode(array((0 until chunks).map(lit): _*)).as("ci"))
      .withColumn("chunk",
        expr(s"shiftrightunsigned(phash, ci * $bits)").bitwiseAND(lit(mask)))
  }

  /** The banding + verify stage over an existing (media_id, phash) table —
    * the entry point when hashes are already persisted in the warehouse
    * (the production shape: hash once on ingest, band-join per near-dup
    * sweep, never re-decode).
    */
  def nearDupFromHashes(hashTable: DataFrame, maxHamming: Int): DataFrame = {
    val banded = bandChunks(graft.core.GraftCaches.acquire(hashTable),
      maxHamming)
    banded.as("a").join(banded.as("b"),
        col("a.ci") === col("b.ci") && col("a.chunk") === col("b.chunk") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        expr("bit_count(a.phash ^ b.phash)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** The banded pHash SIGNATURE STORE schema: decode + hash a media drop
    * once, band the 64-bit hash into maxHamming+1 chunk rows
    * (media_id, ci, chunk, phash). This is what a production pipeline
    * persists per corpus and appends per drop — the image twin of
    * `DedupOps.minhashBandTable` — so later increments band-join old
    * images without ever re-decoding them. Null-hash rows (undecodable
    * payloads) and the degenerate all-ones hash (blank/flat images — one
    * quadratic bucket) are excluded at the store boundary.
    */
  def phashBandTable(media: DataFrame, maxHamming: Int = 3): DataFrame =
    phashBandTableFromHashes(imageHashes(media), maxHamming)

  /** `phashBandTable` from an already-computed (media_id, phash) frame —
    * the entry point for a caller (CorpusIngest.ingestMedia) that pays the
    * decode once and feeds both the band store and the hash commit table.
    */
  def phashBandTableFromHashes(hashes: DataFrame,
                               maxHamming: Int = 3): DataFrame =
    bandChunks(
      hashes.filter(col("phash").isNotNull && col("phash") =!= lit(-1L)),
      maxHamming)

  /** Persist a media drop's banded pHash store as a path-anchored BUCKETED
    * table on the band-join key (ci, chunk), keyed (media_id, ci) so a
    * replayed drop is a data no-op — the image modality's
    * `appendSignatureStoreBucketed`. `buckets` only matters on the first
    * drop (the on-disk spec ledger wins thereafter).
    */
  def appendPhashStoreBucketed(newMedia: DataFrame, bandPath: String,
                               buckets: Int, maxHamming: Int = 3): Unit = {
    // geometry ledger: chunk count is maxHamming + 1 (pigeonhole), so a
    // drifted cut re-chunks the hash and the (ci, chunk, media_id) no-op
    // keys stop matching replayed rows
    graft.core.Sinks.checkAndStampParams(newMedia.sparkSession, bandPath,
      Seq("maxHamming" -> maxHamming.toString))
    // idempotence keys include the bucket keys: chunk is a deterministic
    // function of (media_id, ci), so (ci, chunk, media_id) is equivalent
    // to (media_id, ci) — and the bucketed scan then satisfies the
    // existence anti-join's distribution, no store-side exchange per
    // append (the DedupOps.appendSignatureStoreBucketed equivalence)
    graft.core.Sinks.bucketedIdempotentAppend(
      phashBandTable(newMedia, maxHamming), bandPath,
      keys = Seq("ci", "chunk", "media_id"), bucketKeys = Seq("ci", "chunk"),
      buckets = buckets)
  }

  /** INCREMENTAL perceptual near-dup: pairs involving at least one NEW
    * image — the drop-shape twin of `minhashLshIncremental` /
    * `cosinePairsLshIncremental` for the image modality. Hashes are
    * decoded fresh ONLY for `newMedia`; the corpus side arrives as the
    * PERSISTED banded store, so old images are never re-decoded (or even
    * re-banded — the store rows carry the chunk AND the full hash, so
    * candidate verification is inline bit_count, no second store join).
    * Pairs split exactly into new-old ∪ new-new; the store side, bucketed
    * on (ci, chunk), plans no exchange, and the SHUFFLE_HASH hint (the
    * increment builds, the store streams) keeps it unsorted too. Old-old
    * pairs are previous increments' outputs and are not re-derived.
    */
  def phashNearDupIncremental(storedBands: DataFrame, newMedia: DataFrame,
                              maxHamming: Int = 3,
                              commitIds: Option[DataFrame] = None,
                              excludeBuckets: Option[DataFrame] = None,
                              saltHotBuckets: Int = 0): DataFrame =
    // persisted: the fresh bands feed both the new-old probe and the
    // new-new self-join, and Spark does not CSE across join branches
    phashIncrementalFromBands(storedBands,
      graft.core.GraftCaches.acquire(phashBandTable(newMedia, maxHamming)),
      maxHamming, commitIds, excludeBuckets, saltHotBuckets)

  /** The pair derivation half of `phashNearDupIncremental`, taking the
    * increment's banded frame directly — for a caller that already decoded
    * the drop once (CorpusIngest.ingestMedia). `freshBands` must be
    * materialized by the caller: it feeds two join branches.
    *
    * `commitIds`: the media ids present in the COMMIT-POINT hash table
    * (one id column). The band store verifies inline from its own phash
    * payload, so — unlike the text/embedding paths, whose verify resolve
    * naturally nulls out ids missing from the commit table — orphan band
    * rows left by a crashed-and-never-retried drop would emit GHOST pairs
    * referencing media absent from media_hashes, and a ghost
    * component-minimum could mark a real image as a loser in
    * mediaSurvivors. The guard semi-joins the new-old pairs (already
    * hamming-filtered, increment-bounded) against the commit ids — the
    * commit table streams off its media_id buckets exchange-free; the
    * store-sized band scan is never re-keyed. Pass None only when no
    * commit table exists yet.
    */
  /** The (ci, chunk) buckets of a banded pHash store holding more than
    * `cap` images — the image twin of `DedupOps.overflowingBuckets`
    * (co-located aggregate off the bucketed scan, drop-with-ledger recall
    * contract).
    */
  def overflowingChunkBuckets(storedBands: DataFrame, cap: Int): DataFrame =
    storedBands.groupBy(col("ci"), col("chunk"))
      .agg(count(lit(1)).as("n_media"))
      .filter(col("n_media") > cap)

  def phashIncrementalFromBands(storedBands: DataFrame, fresh: DataFrame,
                                maxHamming: Int = 3,
                                commitIds: Option[DataFrame] = None,
                                excludeBuckets: Option[DataFrame] = None,
                                saltHotBuckets: Int = 0): DataFrame = {
    val store = storedBands.select(
      col("media_id"), col("ci"), col("chunk"), col("phash"))
    // hot-bucket screen on the INCREMENT side only — the store scan keeps
    // its exchange-free shape; see DedupOps.minhashLshIncremental
    val freshKept = excludeBuckets.fold(fresh)(hot =>
      fresh.join(broadcast(hot.select(col("ci"), col("chunk"))),
        Seq("ci", "chunk"), "left_anti"))
    val coldNewOld = freshKept.hint("shuffle_hash").as("a").join(store.as("b"),
        col("a.ci") === col("b.ci") && col("a.chunk") === col("b.chunk") &&
          col("a.media_id") =!= col("b.media_id"))
      .select(least(col("a.media_id"), col("b.media_id")).as("media_a"),
        greatest(col("a.media_id"), col("b.media_id")).as("media_b"),
        expr("bit_count(a.phash ^ b.phash)").cast("long").as("hamming"),
        col("b.media_id").as("_store_id"))
      .filter(col("hamming") <= maxHamming)
    // salted hot branch (the text/embedding twins' shape): hot members
    // arrive via a broadcast semi against the tiny hot set and spread
    // over salted sub-keys, preserving the skipped buckets' recall with
    // bounded per-task fan-in. Hot new-old pairs re-enter BEFORE the
    // commit guard so ghost-pair protection covers both branches.
    val hotBranches = excludeBuckets.filter(_ => saltHotBuckets > 0).map { h =>
      val hotSet = broadcast(h.select(col("ci"), col("chunk")))
      val hotFresh = graft.core.GraftCaches.acquire(
        fresh.join(hotSet, Seq("ci", "chunk"), "left_semi"))
      val hotStore = store.join(hotSet, Seq("ci", "chunk"), "left_semi")
      val hotNewOld = Salting.saltedSkewJoin(hotFresh, hotStore,
          Seq("ci", "chunk"), col("media_id"), saltHotBuckets,
          col("a.media_id") =!= col("b.media_id"))
        .select(least(col("a.media_id"), col("b.media_id")).as("media_a"),
          greatest(col("a.media_id"), col("b.media_id")).as("media_b"),
          expr("bit_count(a.phash ^ b.phash)").cast("long").as("hamming"),
          col("b.media_id").as("_store_id"))
        .filter(col("hamming") <= maxHamming)
      val hotNewNew = Salting.saltedSkewJoin(hotFresh, hotFresh,
          Seq("ci", "chunk"), col("media_id"), saltHotBuckets,
          col("a.media_id") < col("b.media_id"))
        .select(col("a.media_id").as("media_a"),
          col("b.media_id").as("media_b"),
          expr("bit_count(a.phash ^ b.phash)").cast("long").as("hamming"))
        .filter(col("hamming") <= maxHamming)
      (hotNewOld, hotNewNew)
    }
    val newOldRaw = hotBranches.map(_._1).foldLeft(coldNewOld)(_ unionByName _)
    // INNER join, not semi: the commit table is unique on its id (it is
    // the keyed commit point), so inner ≡ semi here — and inner admits a
    // build-LEFT shuffle_hash, letting the pair-bounded side build the
    // hash table while the commit table streams off its id buckets
    // (a left_semi can only build right, which would hash the corpus)
    val newOld = commitIds.fold(newOldRaw) { ids =>
      newOldRaw.hint("shuffle_hash").join(
        ids.select(col(ids.columns.head).as("_store_id")),
        Seq("_store_id"))
    }.drop("_store_id")
    val coldNewNew = freshKept.as("a").join(freshKept.as("b"),
        col("a.ci") === col("b.ci") && col("a.chunk") === col("b.chunk") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        expr("bit_count(a.phash ^ b.phash)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
    val newNew = hotBranches.map(_._2).foldLeft(coldNewNew)(_ unionByName _)
    newOld.unionByName(newNew)
      .distinct()
  }

  /** Synthetic-but-REAL image corpus for the declared phash query: one
    * 16×16 PNG per document, every pixel a pure function of (seed, x, y).
    * Documents (10k, 10k+1) share a seed, with the odd member's channels
    * uniformly +2-shifted — channels stay in [0, 200+2] so the shift never
    * clips, and by averageHash's exact-arithmetic invariance the pair's
    * hashes are bit-identical (hamming 0). All other documents get unique
    * seeds → pseudorandom pixels → hashes far apart. PNG is lossless, so
    * the planted structure survives the encode→decode round trip.
    */
  def syntheticImageCorpus(docs: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("content", BinaryType))))
    docs.select(col("doc_id"))
      .mapPartitions { rows =>
        rows.map { r =>
          val d = r.getLong(0)
          val seed = if (d % 10 < 2) d - (d % 10) else d
          val delta = if (d % 10 == 1) 2 else 0
          Row(d, renderPng(seed, delta))
        }
      }(enc)
  }

  /** Deterministic 16×16 PNG whose channels derive from a splitmix64-style
    * mix of (seed, x, y), each bounded to [0, 200] before the uniform
    * +delta brightness shift (202 < 255 — no channel ever clips).
    */
  private[operators] def renderPng(seed: Long, delta: Int): Array[Byte] = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        val m = mix(seed * 0x100000001b3L + (x.toLong << 32) + y)
        val rr = (((m >>> 0) & 0xff) % 201).toInt + delta
        val gg = (((m >>> 16) & 0xff) % 201).toInt + delta
        val bb = (((m >>> 32) & 0xff) % 201).toInt + delta
        img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  val defs: Seq[QueryDef] = Seq(
    // Binary-column plumbing with an exact oracle: documents' text encoded
    // as a binary payload; per-kind byte statistics. encode() → BLOB and
    // octet_length are engine-portable; the decode stage itself is covered
    // by MultimodalSpec (stub decoder is not SQL-expressible).
    QueryDef.sqlBacked(
      "mm_binary_meta",
      """SELECT doc_id % 4 AS kind_id,
        |  count(*) AS n,
        |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |  CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
        |FROM documents
        |GROUP BY 1
        |ORDER BY kind_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("content", col("text").cast("binary"))
        .groupBy((col("doc_id") % 4).as("kind_id"))
        .agg(count(lit(1)).as("n"),
          sum(octet_length(col("content"))).cast("long").as("total_bytes"),
          max(octet_length(col("content"))).cast("long").as("max_bytes"))
        .orderBy(col("kind_id"))
    },

    // Frame sampling end-to-end with an exact oracle: documents' text as the
    // binary payload, 256-byte frames, every 4th frame kept; md5 + length
    // are engine-portable over identical byte slices. DuckDB cannot slice
    // BLOBs, so the oracle slices the VARCHAR — equivalent because the
    // corpus is pure single-byte text (octet_length == length for every
    // doc at every fixture scale; verified before declaring).
    QueryDef.sqlBacked(
      "mm_frame_sample",
      """WITH f AS (SELECT doc_id AS media_id,
        |        unnest(range(0, CAST(ceil(length(text) / 256.0) AS BIGINT), 4))
        |          AS frame_idx,
        |        text
        |      FROM documents WHERE length(text) > 0)
        |SELECT media_id, frame_idx,
        |  md5(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256)) AS frame_md5,
        |  CAST(length(substring(text, CAST(frame_idx * 256 + 1 AS INT), 256))
        |       AS BIGINT) AS frame_bytes
        |FROM f
        |ORDER BY media_id, frame_idx""".stripMargin) { (s, d) =>
      sampleFrames(
        Tables.documents(s, d).select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("content")),
        frameBytes = 256, step = 4)
        .orderBy(col("media_id"), col("frame_idx"))
    },

    // Perceptual near-dup end-to-end with a planted-ground-truth oracle:
    // the corpus is generated (REAL 16×16 PNGs, one per document) so that
    // exactly the (10k, 10k+1) pairs are near-duplicates — the odd member
    // is a uniform +2 brightness shift, which averageHash's exact integer
    // thresholding provably maps to the identical 64-bit hash — while all
    // other documents carry unique pseudorandom pixels whose hashes sit
    // far apart. The oracle therefore states the construction; hash-
    // equality proves the REAL path (PNG encode → javax.imageio decode →
    // area-average → threshold → chunk-band join → bit_count verify)
    // recovers the planted pairs with perfect recall AND zero false
    // positives at every fixture scale.
    QueryDef.sqlBacked(
      "mm_phash_near_dup",
      """SELECT a.doc_id AS media_a, b.doc_id AS media_b,
        |  CAST(0 AS BIGINT) AS hamming
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 10 = 0
        |ORDER BY media_a, media_b""".stripMargin) { (s, d) =>
      phashNearDup(syntheticImageCorpus(Tables.documents(s, d)), maxHamming = 3)
        .orderBy(col("media_a"), col("media_b"))
    },

    // INCREMENTAL image near-dup — a media drop (doc_id % 7 = 0 stands in
    // for the new batch) checked against the persisted banded pHash store:
    // hashes decoded fresh only for the increment, only pairs touching a
    // new image derived. The oracle states the planted construction
    // restricted to pairs with a new side (gcd(7, 10) = 1, so both the
    // even and odd member of a planted pair land in the drop for some k —
    // both probe directions are exercised at every fixture scale). The
    // bucketed-store round trip with its zero-exchange/zero-sort plan is
    // locked in MultimodalSpec.
    QueryDef.sqlBacked(
      "mm_phash_incremental",
      """SELECT a.doc_id AS media_a, b.doc_id AS media_b,
        |  CAST(0 AS BIGINT) AS hamming
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |WHERE a.doc_id % 10 = 0
        |  AND (a.doc_id % 7 = 0 OR b.doc_id % 7 = 0)
        |ORDER BY media_a, media_b""".stripMargin) { (s, d) =>
      val imgs = syntheticImageCorpus(Tables.documents(s, d))
      val isNew = col("media_id") % 7 === 0
      phashNearDupIncremental(
        phashBandTable(imgs.filter(!isNew)),
        imgs.filter(isNew), maxHamming = 3)
        .orderBy(col("media_a"), col("media_b"))
    }
  )
}
