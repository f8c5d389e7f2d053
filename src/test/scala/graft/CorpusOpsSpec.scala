package graft

import graft.operators.CorpusOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral tests for the corpus-export operators (mixture resampling,
  * sharding, sequence packing, PII scrubbing) on constructed corpora with
  * known ground truth.
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("mixtureResample hits exact per-stratum quotas from the binding stratum") {
    // en:60, de:20, zh:20 with targets 50/25/25 → T = min(120, 80, 80) = 80
    // → quotas en=40, de=20, zh=20
    val docs = ((0L until 60L).map(i => (i, "en")) ++
      (100L until 120L).map(i => (i, "de")) ++
      (200L until 220L).map(i => (i, "zh")))
      .toDF("doc_id", "lang")
    val out = CorpusOps.mixtureResample(docs, "lang",
      Seq("en" -> 50, "de" -> 25, "zh" -> 25))
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang == Map("en" -> 40L, "de" -> 20L, "zh" -> 20L),
      s"quotas off: $byLang")
    // reprocessing-stable: the same call keeps the same documents
    val again = CorpusOps.mixtureResample(docs, "lang",
      Seq("en" -> 50, "de" -> 25, "zh" -> 25))
    assert(out.select("doc_id").as[Long].collect().sorted.toSeq ==
      again.select("doc_id").as[Long].collect().sorted.toSeq)
  }

  test("mixtureResample drops unweighted strata and validates weights") {
    val docs = Seq((0L, "en"), (1L, "en"), (2L, "xx"))
      .toDF("doc_id", "lang")
    val out = CorpusOps.mixtureResample(docs, "lang", Seq("en" -> 100))
    assert(out.filter(col("lang") === "xx").count() == 0,
      "stratum with no weight must be dropped")
    intercept[IllegalArgumentException] {
      CorpusOps.mixtureResample(docs, "lang", Seq("en" -> 50, "xx" -> 40))
    }
  }

  test("mixtureEpochs: fractional epochs emit floor or ceil copies, hash-deterministically") {
    val docs = (0L until 1000L).map(i => (i, "a")).toDF("doc_id", "lang")
    val out = CorpusOps.mixtureEpochs(docs, "lang", Seq("a" -> 2500))
      .as[(Long, String, Long)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    assert(byDoc.size == 1000, "every doc must appear")
    // 2.5 epochs: 2 or 3 dense-ordinal copies, extra copy iff hash < 500
    byDoc.foreach { case (id, copies) =>
      val expected = 2L + (if ((id % 1000003L) * 48271L % 1000L < 500L) 1L else 0L)
      assert(copies == (0L until expected),
        s"doc $id: copies $copies != dense 0..${expected - 1}")
    }
    // ~half the docs earn the third copy (exact count is hash-determined)
    val thirds = byDoc.values.count(_.size == 3)
    assert(thirds > 400 && thirds < 600, s"fractional share off: $thirds/1000")
    // sub-epoch strata downsample; zero-epoch strata are rejected
    val half = CorpusOps.mixtureEpochs(docs, "lang", Seq("a" -> 500))
    assert(half.count() == thirds,
      "0.5 epochs must keep exactly the docs whose hash clears the fraction")
    intercept[IllegalArgumentException] {
      CorpusOps.mixtureEpochs(docs, "lang", Seq("a" -> 0))
    }
  }

  test("shardAssignment covers every doc once; positions are dense per shard") {
    val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = CorpusOps.shardAssignment(docs, numShards = 4)
    assert(a.count() == 100 && a.select("doc_id").distinct().count() == 100)
    val perShard = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"))
      .as[(Long, Long, Long, Long)].collect()
    assert(perShard.forall { case (_, n, mx, mn) => mn == 1 && mx == n },
      s"positions must be dense 1..n per shard: ${perShard.toSeq}")
  }

  test("exportShards is deterministic and preserves within-shard order in the files") {
    val docs = (0L until 64L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out1 = java.nio.file.Files.createTempDirectory("shards1").toString
    val out2 = java.nio.file.Files.createTempDirectory("shards2").toString
    CorpusOps.exportShards(docs, out1, numShards = 4)
    CorpusOps.exportShards(docs, out2, numShards = 4)
    def readOrdered(p: String): Map[Long, Seq[Long]] =
      spark.read.parquet(p)
        .select(col("shard"), col("pos"), col("doc_id"))
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (s, rs) =>
          s -> rs.sortBy(_._2).map(_._3).toSeq
        }
    val r1 = readOrdered(out1)
    val r2 = readOrdered(out2)
    assert(r1 == r2, "re-export must produce identical shard contents")
    assert(r1.keySet == (0L until 4L).toSet && r1.values.map(_.size).sum == 64)
    // file order == pos order: each shard is one task's sorted output, so
    // reading a shard directory yields rows already in pos order
    val expected = CorpusOps.shardAssignment(docs, 4)
      .filter(col("shard") === 0).orderBy(col("pos"))
      .select("doc_id").as[Long].collect().toSeq
    val inFile = spark.read.parquet(s"$out1/shard=0")
      .select("doc_id").as[Long].collect().toSeq
    assert(inFile == expected, "physical row order must match pos order")
  }

  test("packSequences: contiguous offsets, straddling docs span windows, empties dropped") {
    val docs = Seq(
      (0L, Seq.fill(300)("w").mkString(" ")), // 300 tokens
      (1L, Seq.fill(300)("w").mkString(" ")),
      (2L, Seq.fill(300)("w").mkString(" ")),
      (3L, ""), // empty: must be dropped
      (4L, "   ") // whitespace-only: must be dropped
    ).toDF("doc_id", "text")
    val p = CorpusOps.packSequences(docs, budget = 512, numShards = 1)
      .orderBy(col("off"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(p.length == 3, s"empty docs must be dropped: ${p.toSeq}")
    // offsets tile the stream with no gaps or overlaps
    assert(p.head._4 == 0)
    assert(p.sliding(2).forall { case Array(a, b) => b._4 == a._4 + a._3 },
      s"offsets must be contiguous: ${p.toSeq}")
    // 300-token docs at budget 512: doc at off 300 straddles window 0→1,
    // doc at off 600 sits inside window 1
    val spans = p.map(r => r._4 -> (r._5, r._6)).toMap
    assert(spans(0L) == (0L, 0L) && spans(300L) == (0L, 1L) &&
      spans(600L) == (1L, 1L), s"window spans wrong: $spans")
  }

  test("portable ln tracks math.log within 1e-7 across the integer range") {
    val xs = Seq(1L, 2L, 3L, 7L, 100L, 12345L, 1000003L, 1234567890L,
      (1L << 40) + 17L)
    val out = xs.toDF("x")
      .withColumn("e", length(expr("bin(x)")) - 1)
      .withColumn("m", col("x").cast("double") /
        expr("CAST(shiftleft(CAST(1 AS BIGINT), e) AS DOUBLE)"))
      .withColumn("z", (col("m") - 1.0) / (col("m") + 1.0))
      .withColumn("pln",
        expr(s"e * ${CorpusOps.Ln2} + ${CorpusOps.lnPoly("z")}"))
      .select("x", "pln").as[(Long, Double)].collect()
    out.foreach { case (x, pln) =>
      assert(math.abs(pln - math.log(x.toDouble)) < 1e-7,
        s"portable ln($x) = $pln drifted from ${math.log(x.toDouble)}")
    }
  }

  test("bigramCrossEntropy: rare-token gibberish scores high, formulaic text low") {
    val formulaic = (0L until 20L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again"))
    val gibberish = Seq((99L, "zxqv wmbk prtl ngfd osje ukyh catb lirw"))
    val tiny = Seq((100L, "one")) // < 2 tokens: no bigrams, excluded
    val out = CorpusOps.bigramCrossEntropy(
      (formulaic ++ gibberish ++ tiny).toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(!out.contains(100L), "sub-bigram docs must be excluded")
    assert(out(0L)._1 == 11L, s"12 tokens → 11 bigrams, got ${out(0L)._1}")
    val xFormulaic = out(0L)._2
    val xGibberish = out(99L)._2
    assert(xGibberish > xFormulaic,
      s"unique gibberish ($xGibberish) must out-score formulaic text ($xFormulaic)")
    // every copy of the same text gets the identical score
    assert((0L until 20L).forall(i => out(i)._2 == xFormulaic))
  }

  test("piiScrub redacts planted emails, phones, and IPs; clean text is untouched") {
    val docs = Seq(
      (0L, "reach me at alice.smith+work@sub.example.co.uk or +1-555-0001 from 192.168.1.77"),
      (1L, "no pii here, just text about 42 things and version 3.5"),
      (2L, "two mails: a@b.io and c.d@e.org at 8.8.8.8")
    ).toDF("doc_id", "text")
    val out = CorpusOps.piiScrub(docs)
      .select("doc_id", "text", "n_email", "n_phone", "n_ip")
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(0L)._2 == "reach me at <EMAIL> or <PHONE> from <IP>",
      s"scrub failed: ${out(0L)._2}")
    assert((out(0L)._3, out(0L)._4, out(0L)._5) == (1L, 1L, 1L))
    assert(out(1L)._2 == "no pii here, just text about 42 things and version 3.5",
      "clean text must pass through unchanged")
    assert((out(1L)._3, out(1L)._4, out(1L)._5) == (0L, 0L, 0L))
    assert(out(2L)._2 == "two mails: <EMAIL> and <EMAIL> at <IP>")
    assert(out(2L)._3 == 2L)
  }
}
