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
    }
  )
}
