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
}
