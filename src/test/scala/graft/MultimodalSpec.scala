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
}
