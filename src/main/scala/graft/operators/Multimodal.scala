package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: media payloads ride as opaque `binary` columns with
  * typed metadata; decode / feature-extract run per partition in batches.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — the Spark-side plumbing (schema,
  * binary column handling, partition-batched extraction shape, output
  * schema) is real and tested. At scale the binary column is read from
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

  /** STUB decoder: a real deployment would decode image/audio here (e.g.
    * javax.imageio / ffmpeg behind the same signature). Deterministic fake:
    * dimensions derived from payload length, checksum from bytes.
    */
  def decodeStub(content: Array[Byte]): (Int, Int, Long) = {
    var sum = 0L
    var i = 0
    while (i < content.length) { sum = sum * 31 + (content(i) & 0xff); i += 1 }
    (640 + (content.length % 640), 360 + (content.length % 360), sum)
  }

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
            val (w, h, sum) = decodeStub(content)
            Row(r.getLong(0), r.getString(1), content.length.toLong, w, h, sum)
          }
        }
      }(enc)
  }

  /** STUB resize: a real deployment decodes, scales, re-encodes (javax.
    * imageio / libvips behind the same signature). Deterministic fake: the
    * payload is resampled by striding so output size tracks the target
    * dimensions; null-safe like decodeStub.
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
            resizeStub(content, targetW, targetH))
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
