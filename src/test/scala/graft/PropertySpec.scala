package graft

import graft.functions.OhlcAggregator
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5.2): dedup idempotence, OHLCV resample
  * associativity (5×1-min → 5-min equals direct 5-min), and watermark
  * filter ∘ append idempotence, over ScalaCheck-generated inputs (manual
  * deterministic sampling — the scalatest/scalacheck bridge isn't in the
  * offline dependency cache).
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forAll[A](g: Gen[A], n: Int = 10)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val tickGen: Gen[(String, Long, Double)] = for {
    ticker <- Gen.oneOf("A", "B", "C")
    t <- Gen.chooseNum(0L, 30 * 60 * 1000L) // 30 minutes of event time
    p <- Gen.chooseNum(1, 10000).map(_ / 100.0)
  } yield (ticker, t, p)

  private val ticksGen = Gen.nonEmptyListOf(tickGen)

  test("two-phase globalRank/runningMax equal their single-partition window twins") {
    // the helpers replace Window.orderBy (serial) in the day-grid operators;
    // lock them to the naive definition over random unique keys, including
    // single-row and fewer-rows-than-partitions shapes
    val keysGen = Gen.nonEmptyListOf(Gen.chooseNum(-100000L, 100000L))
    forAll(keysGen, n = 8) { raw =>
      val rows = raw.distinct.map(k => (k, k * 31 % 997)) // unique keys, values
      val df = rows.toDF("k", "v")
      val w = org.apache.spark.sql.expressions.Window.orderBy(col("k"))
      val expectRank = df.withColumn("r", row_number().over(w))
        .select("k", "r").as[(Long, Int)].collect().toMap
      val gotRank = graft.operators.MarketOps.globalRank(df, "k", "r")
        .select("k", "r").as[(Long, Int)].collect().toMap
      assert(gotRank == expectRank, s"rank diverged on ${rows.take(5)}...")

      val expectMax = df.withColumn("m", max(col("v")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
        .select("k", "m").as[(Long, Long)].collect().toMap
      val gotMax = graft.operators.MarketOps.runningMax(df, "k", "v", "m")
        .select("k", "m").as[(Long, Long)].collect().toMap
      assert(gotMax == expectMax, s"running max diverged on ${rows.take(5)}...")

      // the combined form (one stats pass carrying rank AND running sum —
      // riskStats' shape) must equal both window twins at once
      val expectSum = df.withColumn("s", sum(col("v")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
        .select("k", "s").as[(Long, Long)].collect().toMap
      val both = graft.operators.MarketOps.prefixStats(df, "k", Seq(
          graft.operators.MarketOps.RankCarry("r"),
          graft.operators.MarketOps.SumCarry("v", "s")))
        .select("k", "r", "s").as[(Long, Int, Long)].collect()
      assert(both.map(t => t._1 -> t._2).toMap == expectRank,
        "combined carry diverged from the rank twin")
      assert(both.map(t => t._1 -> t._3).toMap == expectSum,
        "combined carry diverged from the running-sum twin")
    }
    graft.core.GraftCaches.releaseAll(spark)
  }

  test("bucketed store lifecycle equals an in-memory model under random op sequences") {
    import graft.core.Sinks
    // ops: keyed append (idempotent — first writer of a key wins), keyed
    // delete, compaction. The MODEL is a Map[Long, Long]; the store must
    // match it row-for-row after every op, read through BOTH the bucketed
    // scan and the plain parquet files (except the legitimate fileless
    // empty state, where only the catalog path knows the schema).
    sealed trait Op
    case class Append(rows: List[(Long, Long)]) extends Op
    case class Delete(keys: List[Long]) extends Op
    case object Compact extends Op
    val opGen: Gen[Op] = Gen.frequency(
      5 -> Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0L, 40L),
        Gen.chooseNum(0L, 1000L))).map(Append.apply),
      3 -> Gen.nonEmptyListOf(Gen.chooseNum(0L, 40L)).map(Delete.apply),
      1 -> Gen.const(Compact))
    forAll(Gen.listOfN(8, opGen), n = 5) { ops =>
      val dir = java.nio.file.Files.createTempDirectory("bkt-prop").toString + "/t"
      var model = Map.empty[Long, Long]
      ops.foreach { op =>
        op match {
          case Append(rows) =>
            val distinctRows = rows.distinct
            Sinks.bucketedIdempotentAppend(distinctRows.toDF("k", "v"),
              dir, keys = Seq("k"), bucketKeys = Seq("k"), buckets = 4)
            // model: existing keys win; within the batch the engine keeps
            // SOME row per key — mirror by folding batch keys first-seen
            val batchByKey = distinctRows.groupBy(_._1)
            model = model ++ batchByKey.collect {
              case (k, vs) if !model.contains(k) && vs.size == 1 => k -> vs.head._2
            }
            // conflicting same-key rows within one batch are a caller bug
            // (both land under idempotent-append semantics) — regenerate
            // the model from the table for those keys to stay aligned
            val conflicted = batchByKey.filter(_._2.size > 1).keySet -- model.keySet
            if (conflicted.nonEmpty) {
              val landed = Sinks.readBucketedPath(spark, dir)
                .filter(col("k").isin(conflicted.toSeq: _*))
                .as[(Long, Long)].collect()
              model = model ++ landed.groupBy(_._1).map { case (k, vs) => k -> vs.head._2 }
            }
          case Delete(keys) =>
            if (Sinks.pathExists(spark, dir)) {
              Sinks.deleteBucketedByKey(spark, dir, keys.toDF("k"), Seq("k"))
              model = model -- keys
            }
          case Compact =>
            if (Sinks.pathExists(spark, dir))
              Sinks.compactBucketedIfFragmented(spark, dir, factor = 1)
        }
        if (Sinks.pathExists(spark, dir)) {
          val got = Sinks.readBucketedPath(spark, dir)
            .as[(Long, Long)].collect().toSet
          val wantKeys = model.keySet
          assert(got.map(_._1) == wantKeys,
            s"store keys diverged from model after $op: got=${got.map(_._1)} want=$wantKeys")
          // plain-parquet view agrees whenever files exist (back-compat contract)
          if (Sinks.dataFileCount(spark, dir) > 0) {
            val plain = spark.read.parquet(dir).as[(Long, Long)].collect().toSet
            assert(plain == got, s"plain read diverged from bucketed scan after $op")
          }
        }
      }
    }
  }

  test("bucketed store refuses schema and type drift with a pointed diff") {
    import graft.core.Sinks
    val dir = java.nio.file.Files.createTempDirectory("bkt-drift").toString + "/t"
    Sinks.bucketedIdempotentAppend(Seq((1L, "a")).toDF("k", "s"),
      dir, keys = Seq("k"), bucketKeys = Seq("k"), buckets = 2)
    val e1 = intercept[IllegalArgumentException] {
      Sinks.bucketedIdempotentAppend(Seq((2L, "b", 1)).toDF("k", "s", "extra"),
        dir, keys = Seq("k"), bucketKeys = Seq("k"), buckets = 2)
    }
    assert(e1.getMessage.contains("extra"), s"undiagnosed drift: ${e1.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      Sinks.bucketedIdempotentAppend(Seq((2L, 9L)).toDF("k", "s"),
        dir, keys = Seq("k"), bucketKeys = Seq("k"), buckets = 2)
    }
    assert(e2.getMessage.contains("s") && e2.getMessage.contains("bigint"),
      s"undiagnosed retype: ${e2.getMessage}")
  }

  test("prefixStats fails fast on null carry values with a pointed message") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.MarketOps.runningMax(df, "k", "v", "m").collect()
    }
    assert(e.getMessage.contains("null"), s"unpointed failure: ${e.getMessage}")
    graft.core.GraftCaches.releaseAll(spark)
  }

  test("dedup is idempotent and keeps exactly one row per key") {
    forAll(ticksGen) { ticks =>
      val df = ticks.toDF("ticker", "t", "p")
      val once = df.dropDuplicates("ticker", "t")
      val twice = once.dropDuplicates("ticker", "t")
      assert(once.count() == twice.count())
      assert(once.count() ==
        ticks.map(x => (x._1, x._2)).distinct.size)
    }
  }

  test("OHLC resample associativity: 1-min bars folded to 5-min == direct 5-min") {
    import OhlcAggregator._
    forAll(ticksGen) { ticks =>
      // dedup (ticker,t) first — open/close are undefined under same-t ties
      val base = ticks.map { case (k, t, p) => (k, t, p) }
        .groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
      val ds = base.toDF("ticker", "t", "p")
        .select(col("ticker"), col("t"), col("p"))
        .as[(String, Long, Double)]
        .map { case (k, t, p) => (k, t, In(t, p, p, p, p, 1.0, p, 1)) }

      val direct = ds.groupByKey(x => (x._1, x._2 / 300000L)).mapValues(_._3)
        .agg(OhlcAggregator.agg.toColumn).collect().toMap
      val oneMin = ds.groupByKey(x => (x._1, x._2 / 60000L)).mapValues(_._3)
        .agg(OhlcAggregator.agg.toColumn)
        .map { (kv: ((String, Long), Ohlc)) =>
          val ((k, m), bar) = kv
          // re-enter the fold at 5-min granularity: bar as one input whose
          // open/close times are the minute bucket start order
          ((k, m / 5), In(m, bar.o, bar.h, bar.l, bar.c, bar.v, bar.vw, bar.n))
        }
        .groupByKey(_._1).mapValues(_._2)
        .agg(OhlcAggregator.agg.toColumn).collect().toMap

      direct.foreach { case (key, want) =>
        val got = oneMin(key)
        assert(got.h == want.h && got.l == want.l && got.n == want.n,
          s"h/l/n mismatch at $key: $got vs $want")
        assert(got.o == want.o && got.c == want.c,
          s"open/close mismatch at $key: $got vs $want")
        assert(math.abs(got.v - want.v) < 1e-9)
      }
    }
  }

  test("bucketed near-dup has precision 1 vs exact pairs on random embeddings") {
    val vecGen: Gen[Seq[Array[Float]]] = for {
      n <- Gen.chooseNum(20, 60)
      seed <- Gen.chooseNum(0, 1000)
    } yield {
      val rng = new scala.util.Random(seed)
      // half independent, half noisy copies → both qualifying and
      // non-qualifying pairs exist
      val bases = Seq.fill(n)(Array.fill(16)(rng.nextGaussian().toFloat))
      bases ++ bases.take(n / 2).map(b =>
        b.map(x => x + rng.nextGaussian().toFloat * 0.1f))
    }
    forAll(vecGen, n = 5) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val exact = graft.operators.SimilarityOps.cosinePairs(df, 0.8)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      val bucketed = graft.operators.SimilarityOps
        .cosinePairsLsh(df, 0.8, rowsPerBand = 4, bands = 16, dims = 16)
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      assert(bucketed.subsetOf(exact),
        s"precision must be 1 (exact verify); extras: ${bucketed -- exact}")
    }
  }

  test("incremental embedding dedup equals full-restricted under random corpora and splits") {
    val caseGen: Gen[(Seq[Array[Float]], Long)] = for {
      n <- Gen.chooseNum(20, 50)
      seed <- Gen.chooseNum(0, 1000)
      m <- Gen.chooseNum(2L, 5L) // split modulus — varies store/drop ratio
    } yield {
      val rng = new scala.util.Random(seed)
      val bases = Seq.fill(n)(Array.fill(16)(rng.nextGaussian().toFloat))
      (bases ++ bases.take(n / 2).map(b =>
        b.map(x => x + rng.nextGaussian().toFloat * 0.1f)), m)
    }
    forAll(caseGen, n = 5) { case (vecs, m) =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("vec_id", "embedding")
      val isNew = col("vec_id") % m === 0
      def pairsOf(d: org.apache.spark.sql.DataFrame) = d
        .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
      val full = pairsOf(graft.operators.SimilarityOps
        .cosinePairsLsh(df, 0.8, rowsPerBand = 4, bands = 16, dims = 16))
      val wantNewSide = full.filter(p => p._1 % m == 0 || p._2 % m == 0)
      val got = pairsOf(graft.operators.SimilarityOps.cosinePairsLshIncremental(
        graft.operators.SimilarityOps.embBandTable(df.filter(!isNew),
          rowsPerBand = 4, bands = 16, dims = 16),
        graft.operators.SimilarityOps.embVecTable(df.filter(!isNew)),
        df.filter(isNew), threshold = 0.8,
        rowsPerBand = 4, bands = 16, dims = 16))
      assert(got == wantNewSide,
        s"m=$m extra=${got -- wantNewSide} missing=${wantNewSide -- got}")
      graft.core.GraftCaches.releaseAll(spark)
    }
  }

  test("incremental minhash dedup equals full-restricted under random corpora and splits") {
    val caseGen: Gen[(Seq[(Long, String)], Long)] = for {
      n <- Gen.chooseNum(10, 25)
      seed <- Gen.chooseNum(0, 1000)
      m <- Gen.chooseNum(2L, 5L)
    } yield {
      val rng = new scala.util.Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
      val bases = (0 until n).map(i =>
        i.toLong -> Seq.fill(8 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size)))
          .mkString(" "))
      (bases ++ bases.take(3).map { case (id, t) => (id + 1000, t) }, m)
    }
    forAll(caseGen, n = 5) { case (docs, m) =>
      val df = docs.toDF("doc_id", "text")
      val isNew = col("doc_id") % m === 0
      def pairsOf(d: org.apache.spark.sql.DataFrame) = d
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val full = pairsOf(graft.operators.DedupOps.minhashLsh(df, 0.5))
      val wantNewSide = full.filter(p => p._1 % m == 0 || p._2 % m == 0)
      val oldSh = graft.operators.DedupOps.shingleTable(df.filter(!isNew))
      val got = pairsOf(graft.operators.DedupOps.minhashLshIncremental(
        graft.operators.DedupOps.minhashBandTable(oldSh), oldSh,
        df.filter(isNew), threshold = 0.5))
      assert(got == wantNewSide,
        s"m=$m extra=${got -- wantNewSide} missing=${wantNewSide -- got}")
      // the SALTED skew-guard form must be invisible in the result: with
      // an adversarial cap (1) most buckets route through the salted
      // branch, and the pair set still equals the uncapped probe's
      val bands = graft.core.GraftCaches.acquire(
        graft.operators.DedupOps.minhashBandTable(oldSh))
      val gotSalted = pairsOf(graft.operators.DedupOps.minhashLshIncremental(
        bands, oldSh, df.filter(isNew), threshold = 0.5,
        excludeBuckets =
          Some(graft.operators.DedupOps.overflowingBuckets(bands, cap = 1)),
        saltHotBuckets = 3))
      assert(gotSalted == wantNewSide,
        s"salted m=$m extra=${gotSalted -- wantNewSide} " +
          s"missing=${wantNewSide -- gotSalted}")
      graft.core.GraftCaches.releaseAll(spark)
    }
  }

  test("saltedSkewJoin equals the plain equi-join under random skewed frames and salt counts") {
    val caseGen: Gen[(Int, Int, Int, Int)] = for {
      n <- Gen.chooseNum(5, 40)
      m <- Gen.chooseNum(5, 40)
      salts <- Gen.chooseNum(1, 6)
      seed <- Gen.chooseNum(0, 1000)
    } yield (n, m, salts, seed)
    forAll(caseGen, n = 6) { case (n, m, salts, seed) =>
      val rng = new scala.util.Random(seed)
      // deliberately skewed: key 0 holds about half of each side
      def rows(c: Int, off: Long) = (0 until c).map(i =>
        (if (rng.nextBoolean()) 0L else rng.nextInt(5).toLong, off + i))
      val l = rows(n, 0L).toDF("k", "lid")
      val r = rows(m, 1000L).toDF("k", "rid")
      val cond = col("a.lid") + 1000L =!= col("b.rid")
      val plain = l.as("a").join(r.as("b"),
          col("a.k") === col("b.k") && cond)
        .select(col("a.lid"), col("b.rid"))
        .as[(Long, Long)].collect().sorted.toSeq
      val salted = graft.operators.Salting.saltedSkewJoin(
          l, r, Seq("k"), col("rid"), salts, cond)
        .select(col("a.lid"), col("b.rid"))
        .as[(Long, Long)].collect().sorted.toSeq
      assert(salted == plain,
        s"salts=$salts plain=${plain.size} salted=${salted.size}")
    }
  }

  test("minhash-verified pairs are a subset of exact jaccard pairs at the same threshold") {
    val docGen: Gen[Seq[(Long, String)]] = for {
      n <- Gen.chooseNum(10, 25)
      seed <- Gen.chooseNum(0, 1000)
    } yield {
      val rng = new scala.util.Random(seed)
      val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
      val bases = (0 until n).map(i =>
        i.toLong -> Seq.fill(8 + rng.nextInt(8))(vocab(rng.nextInt(vocab.size)))
          .mkString(" "))
      // append exact copies of a few docs to guarantee qualifying pairs
      bases ++ bases.take(3).map { case (id, t) => (id + 1000, t) }
    }
    forAll(docGen, n = 5) { docs =>
      val df = docs.toDF("doc_id", "text")
      // exact pairs via the complete shared-shingle join at threshold 0.5
      val ex = graft.operators.DedupOps.minhashLsh(df, threshold = 0.5)
        .select("doc_a", "doc_b", "jac")
        .as[(Long, Long, Double)].collect()
      // every emitted pair must actually satisfy the threshold (exact
      // verification), and the planted exact copies must be found
      assert(ex.forall(_._3 >= 0.5), s"unverified pair leaked: ${ex.toSeq}")
      val found = ex.map(p => (p._1, p._2)).toSet
      docs.filter(_._1 >= 1000).foreach { case (cid, _) =>
        assert(found.contains((cid - 1000, cid)),
          s"planted exact copy ($cid) not found; got $found")
      }
    }
  }

  test("watermark filter ∘ append is idempotent under any replay") {
    forAll(Gen.zip(ticksGen, ticksGen)) { case (stored0, incoming0) =>
      val stored = stored0.toDF("ticker", "t", "p").dropDuplicates("ticker", "t")
      val wm = stored.groupBy(col("ticker")).agg(max(col("t")).as("max_t"))
      val incoming = (incoming0 ++ stored0).toDF("ticker", "t", "p")
        .dropDuplicates("ticker", "t")
      val fresh = incoming.join(wm, Seq("ticker"), "left")
        .filter(col("max_t").isNull || col("t") > col("max_t"))
        .drop("max_t")
      val merged = stored.unionByName(fresh)
      // appending must never create a key collision with stored rows
      assert(merged.count() == merged.dropDuplicates("ticker", "t").count())
      // replaying the SAME batch against the advanced watermark adds nothing
      val wm2 = merged.groupBy(col("ticker")).agg(max(col("t")).as("max_t"))
      val replay = incoming.join(wm2, Seq("ticker"), "left")
        .filter(col("max_t").isNull || col("t") > col("max_t"))
      assert(replay.count() == 0)
    }
  }

  test("frontier discovery finds the exact chain end with O(log) probes and 1 probe when idle") {
    forAll(Gen.zip(Gen.chooseNum(0, 400), Gen.chooseNum(0, 50)), n = 60) {
      case (chainLen, fromRaw) =>
        val from = math.min(fromRaw, chainLen) // checkpoint never past the end
        var probes = 0
        val exists = (i: Int) => { probes += 1; i < chainLen }
        val end = graft.sources.Frontier.discover(from, None, exists)
        assert(end == chainLen, s"chainLen=$chainLen from=$from got $end")
        val backlog = chainLen - from
        val bound = if (backlog == 0) 1 else 2 * (32 - Integer.numberOfLeadingZeros(backlog)) + 2
        assert(probes <= bound,
          s"chainLen=$chainLen from=$from: $probes probes > O(log) bound $bound")
        // admission cap: never probes past it, answer clamps to it
        probes = 0
        val cap = from + 3
        val capped = graft.sources.Frontier.discover(from, Some(cap), exists)
        assert(capped == math.min(chainLen, cap))
        assert(probes <= 5)
    }
  }

  test("mixture quotas: per-stratum counts hit floor(pct*T/100) exactly, T from the binding stratum") {
    val corpusGen = for {
      na <- Gen.chooseNum(1, 120)
      nb <- Gen.chooseNum(1, 120)
      nc <- Gen.chooseNum(1, 120)
    } yield (na, nb, nc)
    forAll(corpusGen, n = 8) { case (na, nb, nc) =>
      val weights = Seq("a" -> 50, "b" -> 30, "c" -> 20)
      val docs = ((0 until na).map(i => (i.toLong, "a")) ++
        (1000 until 1000 + nb).map(i => (i.toLong, "b")) ++
        (2000 until 2000 + nc).map(i => (i.toLong, "c")))
        .toDF("doc_id", "lang")
      val got = graft.operators.CorpusOps
        .mixtureResample(docs, "lang", weights)
        .groupBy("lang").count().as[(String, Long)].collect().toMap
      val t = Seq(na * 100L / 50, nb * 100L / 30, nc * 100L / 20).min
      val want = weights.map { case (l, p) => l -> p * t / 100 }
        .filter(_._2 > 0).toMap
      assert(got == want, s"corpus=($na,$nb,$nc) T=$t")
    }
  }

  test("sequence packing tiles each shard's token stream exactly (no gaps, no overlaps)") {
    val docGen = Gen.nonEmptyListOf(for {
      id <- Gen.chooseNum(0L, 500L)
      toks <- Gen.chooseNum(0, 40)
    } yield (id, Seq.fill(toks)("w").mkString(" ")))
    forAll(docGen, n = 6) { raw =>
      val docs = raw.distinctBy(_._1).toDF("doc_id", "text")
      val placed = graft.operators.CorpusOps
        .packSequences(docs, budget = 64, numShards = 4)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      placed.groupBy(_._2).foreach { case (shard, rows) =>
        val sorted = rows.sortBy(_._4)
        assert(sorted.head._4 == 0L, s"shard $shard starts at offset 0")
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(b._4 == a._4 + a._3,
              s"shard $shard: gap/overlap at ${b._1}")
          case _ =>
        }
        sorted.foreach { case (_, _, n, off, first, last) =>
          assert(first == off / 64 && last == (off + n - 1) / 64)
        }
      }
    }
  }

  test("connected components equal union-find on arbitrary generated graphs") {
    val edgesGen = Gen.nonEmptyListOf(for {
      a <- Gen.chooseNum(0L, 40L)
      b <- Gen.chooseNum(0L, 40L)
    } yield (a, b))
    forAll(edgesGen, n = 6) { raw =>
      val edges = raw.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val got = graft.operators.Components
          .connectedComponents(edges.toDF("u", "v"))
          .as[(Long, Long)].collect().toMap
        // driver-side union-find ground truth, normalized to min labels
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val want = nodes.groupBy(find).values
          .flatMap(c => c.map(_ -> c.min)).toMap
        assert(got == want, s"edges=$edges")
      }
    }
  }

  test("geometric snap holds its 1/64 relative-error bound on arbitrary longs") {
    // the txt_quantiles_approx sketch replaces each value with its octave-
    // bucket midpoint (carried x64); the claimed bound |u - 64v| <= 2^e is
    // a hard arithmetic property, not a statistical one — lock it over
    // random positive/zero/negative longs through the SHARED expression
    val vGen = Gen.oneOf(
      Gen.chooseNum(1L, 1000L),
      Gen.chooseNum(1L, Long.MaxValue >> 8),
      Gen.chooseNum(-1000L, 0L))
    forAll(Gen.nonEmptyListOf(vGen), n = 6) { vs =>
      val rows = vs.toDF("n_chars")
        .withColumn("e", (length(bin(col("n_chars"))) - 1).cast("int"))
        .withColumn("u", expr(graft.operators.TextOps.geoSnapSql("n_chars")))
        .select("n_chars", "u").as[(Long, Long)].collect()
      rows.foreach { case (v, u) =>
        if (v <= 0) assert(u == v * 64, s"non-positive $v must pass exactly")
        else {
          val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
          assert(math.abs(u - 64L * v) <= (1L << e),
            s"v=$v e=$e u=$u: |u-64v|=${math.abs(u - 64L * v)} > 2^e")
          // midpoints are monotone in the bucket index: u stays in octave
          assert(u / 64 >= (1L << e) && u / 64 <= (2L << e), s"v=$v u=$u")
        }
      }
    }
  }

  test("KMV estimate: exact under k, deterministic, and near the true count") {
    // q19's k-minimum-values estimator over the portable hash family,
    // replayed on generated key sets: below k distinct hashes the rule IS
    // the exact count; above, the estimate (k-1)*M // h_k must land near
    // the true cardinality (k=256 -> ~6% stderr; the fixed hash makes this
    // a deterministic check, not a flaky statistical one)
    val k = 256
    val M = 2147483647L
    def hash(x: Long): Long = x * 1009 % M * 69069 % M
    def est(keys: Seq[Long]): Long = {
      val hs = keys.map(hash).distinct.sorted
      if (hs.size < k) hs.size.toLong else (k - 1L) * M / hs(k - 1)
    }
    // under k: every cardinality up to k-1 reports exactly (hash collisions
    // aside — the generator range makes them essentially impossible)
    val smallGen = Gen.chooseNum(1, k - 1)
      .flatMap(n => Gen.listOfN(n, Gen.chooseNum(1L, 200000L)))
    forAll(smallGen, n = 6) { keys =>
      val distinct = keys.map(hash).distinct.size
      assert(est(keys) == distinct.toLong)
      assert(est(keys ++ keys) == est(keys), "duplicates must not move KMV")
    }
    // over k: spot the relative error at deterministic cardinalities,
    // including one past the old mod-1000003 domain cap that biased the
    // estimate low (the 2^31 domain keeps 1M distinct within KMV stderr)
    Seq(2000, 20000, 100000, 1000000).foreach { n =>
      val keys = (1L to n.toLong).map(_ * 7919L)
      val e = est(keys)
      assert(math.abs(e - n).toDouble / n < 0.35,
        s"KMV at n=$n estimated $e (err ${math.abs(e - n).toDouble / n})")
    }
  }
}
