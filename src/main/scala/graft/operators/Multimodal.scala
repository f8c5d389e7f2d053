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
    }
  )
}
