package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral tests for the histogram-based exact quantiles and the ordered
  * funnel: the quantile path is cross-checked against Spark's own
  * `percentile` aggregate (the buffer-everything implementation we avoid at
  * scale — small data makes it a free ground truth), the funnel against
  * hand-ordered event sequences.
  */
class QuantileFunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exactQuantiles matches Spark's percentile aggregate on skewed groups") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(500) { i =>
      val g = if (i % 10 == 0) "rare" else "common"
      (g, (rnd.nextInt(40) + (if (g == "rare") 1000 else 0)).toLong)
    } ++ Seq(("single", 42L)) // n = 1 group: every quantile is the value
    val df = rows.toDF("lang", "n_chars")
    val ps = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

    val got = TextOps.exactQuantiles(df, "n_chars", "lang", ps)
      .as[(String, Double, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap

    val want = df.groupBy("lang")
      .agg(expr(s"percentile(n_chars, array(${ps.mkString(",")}))").as("qs"))
      .select(col("lang"), posexplode(col("qs")).as(Seq("i", "q")))
      .as[(String, Int, Double)].collect()
      .map(t => (t._1, ps(t._2)) -> math.rint(t._3 * 1e6) / 1e6).toMap

    assert(got == want, s"got $got\nwant $want")
    assert(got((("single"), 0.99)) == 42.0)
  }

  /** The fixture events.parquet stores ts as int64 NANOSECONDS (TESTDATA.md;
    * Tables.events re-derives the timestamp) — test fixtures must match.
    */
  private def writeEventsFixture(df: org.apache.spark.sql.DataFrame,
                                 dir: String): Unit =
    df.withColumn("ts", expr("unix_micros(ts) * 1000"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("exactQuantiles ignores null values like percentile_cont") {
    val df = Seq[(String, java.lang.Long)](("a", 1L), ("a", null), ("a", 3L))
      .toDF("lang", "n_chars")
    val got = TextOps.exactQuantiles(df, "n_chars", "lang", Seq(0.5))
      .as[(String, Double, Double)].collect().toSeq
    assert(got == Seq(("a", 0.5, 2.0)), s"got $got")
  }

  test("stratified split holds exact per-stratum proportions, even for tiny strata") {
    val docs = (0L until 100L).map(i => (i, "big")) ++
      (100L until 110L).map(i => (i, "small")) ++
      Seq((110L, "singleton"))
    val out = TextOps.stratifiedSplit(docs.toDF("doc_id", "lang"), "lang")
      .as[(Long, String, String)].collect()
    def dist(lang: String) = out.filter(_._2 == lang).groupBy(_._3)
      .view.mapValues(_.length).toMap
    assert(dist("big") == Map("train" -> 80, "val" -> 10, "test" -> 10))
    assert(dist("small") == Map("train" -> 8, "val" -> 1, "test" -> 1),
      s"small stratum drifted: ${dist("small")}")
    // n = 1: rk*10 = 10 > 8 and > 9 → the lone doc lands in test
    assert(dist("singleton") == Map("test" -> 1))
    // reprocessing-stable: a second run reproduces the same assignment
    val again = TextOps.stratifiedSplit(docs.toDF("doc_id", "lang"), "lang")
      .as[(Long, String, String)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("funnel generalizes to arbitrary stage chains") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val events = Seq(
      (1L, "a", ts(0)), (1L, "b", ts(1)), (1L, "c", ts(2)), (1L, "d", ts(3)),
      (2L, "a", ts(0)), (2L, "c", ts(1)), (2L, "b", ts(2)) // c before b: stage 3+ null
    ).toDF("user_id", "event_type", "ts")
    val out = graft.operators.EventOps
      .funnel(events, stages = Seq("a", "b", "c", "d"))
      .collect().map(r => r.getLong(0) -> (3 to 4).map(i => Option(r.get(i)))).toMap
    assert(out(1L).forall(_.isDefined), "user 1 completed all four stages")
    assert(out(2L).forall(_.isEmpty),
      "user 2's out-of-order c must not satisfy stages 3-4")
  }

  test("funnel honors strict stage ordering, not mere presence") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(t0.getTime + m * 60000L)
    val events = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(9)),
      // user 2: purchase BEFORE the first post-view click — stage 3 null
      (2L, "view", ts(0)), (2L, "purchase", ts(1)), (2L, "click", ts(2)),
      // user 3: click only before the first view — stage 2 null
      (3L, "click", ts(0)), (3L, "view", ts(1)),
      // user 4: never viewed — absent from the funnel entirely
      (4L, "click", ts(0)), (4L, "purchase", ts(1))
    ).toDF("user_id", "event_type", "ts")

    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    writeEventsFixture(events, dir)
    val out = SparkEntry.queries("q23_funnel")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap

    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L)._1.isDefined && out(1L)._2.isDefined && out(1L)._3.isDefined)
    assert(out(2L)._2.isDefined && out(2L)._3.isEmpty,
      "purchase before the qualifying click must not count")
    assert(out(3L)._2.isEmpty && out(3L)._3.isEmpty,
      "click before the first view must not count")
  }

  test("retention cohorts: a late-joining user lands in a later cohort") {
    val events = Seq(
      (1L, "view", java.sql.Timestamp.valueOf("2024-01-01 10:00:00")),
      (1L, "view", java.sql.Timestamp.valueOf("2024-01-08 10:00:00")),
      (2L, "view", java.sql.Timestamp.valueOf("2024-01-08 11:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val dir = java.nio.file.Files.createTempDirectory("retention").toString
    writeEventsFixture(events, dir)
    val out = SparkEntry.queries("q24_retention")(spark, dir)
      .as[(java.sql.Timestamp, Long, Long)].collect().toSet
    val w1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val w2 = java.sql.Timestamp.valueOf("2024-01-08 00:00:00")
    assert(out == Set((w1, 0L, 1L), (w1, 1L, 1L), (w2, 0L, 1L)), s"got $out")
  }

  test("tfidfTopTerms: ubiquitous terms score exactly zero, salient rare terms rank first") {
    val docs = Seq(
      (1L, "the quark the the lattice"),
      (2L, "the gauge gauge boson"),
      (3L, "the boson")
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfTopTerms(docs, k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getDouble(4)))
      .toMap
    // "the" appears in every doc: idf = pln(3) − pln(3) = exactly 0 —
    // tf=3 cannot rescue it, so doc 1's top terms are its unique words
    assert(Set("quark", "lattice").contains(out((1L, 1L))._1), s"got $out")
    assert(out.values.filter(_._1 == "the").forall(_._2 == 0.0),
      "a term in every document must have exactly zero idf")
    // doc 2: "gauge" (tf=2, df=1) must outrank "boson" (tf=1, df=2)
    assert(out((2L, 1L))._1 == "gauge", s"got $out")
    // determinism under repartitioning
    val again = TextOps.tfidfTopTerms(docs.repartition(3), k = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getString(2), r.getDouble(4)))
      .toMap
    assert(again == out)
  }

  test("invertedIndex: over-cap terms keep exact stats but no posting list") {
    // "stop" is in all 5 docs (df*5 > n*4) → stats survive, postings NULL;
    // "rare" is in two → sorted posting string
    val docs = Seq(
      (1L, "stop rare alpha"), (2L, "stop beta"), (3L, "stop rare stop"),
      (4L, "stop gamma"), (5L, "stop delta")
    ).toDF("doc_id", "text")
    val out = TextOps.invertedIndex(docs, capNum = 4, capDen = 5).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        Option(r.getString(3)))).toMap
    assert(out("stop") == ((5L, 6L, None)),
      s"ubiquitous term must keep df/cf but drop postings, got ${out("stop")}")
    assert(out("rare") == ((2L, 2L, Some("1,3"))), s"got ${out("rare")}")
    // determinism under repartitioning (collect_list order is sorted away)
    val again = TextOps.invertedIndex(docs.repartition(4), capNum = 4, capDen = 5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        Option(r.getString(3)))).toMap
    assert(again == out)
  }

  test("qualityGate drops exactly the bottom quartile per language") {
    // 8 'en' docs with strictly increasing quality (longer docs score
    // higher via the length term), plus a singleton 'xx' stratum that a
    // GLOBAL cut would annihilate but a per-language cut must keep
    val docs = ((1 to 8).map { i =>
      (i.toLong, ("the " * i) + "alpha beta", "en")
    } :+ ((99L, "zz", "xx"))).toDF("doc_id", "text", "lang")
    val kept = graft.operators.TextOps.qualityGate(docs, 25, 100)
      .select("doc_id", "lang", "q_rank", "n_lang")
      .as[(Long, String, Long, Long)].collect()
    val en = kept.filter(_._2 == "en")
    // 8 docs, cut rank*100 <= 8*25 → ranks 1..2 dropped, 6 survive
    assert(en.length == 6, s"en survivors: ${en.toSeq}")
    assert(en.map(_._1).sorted.toSeq == (3L to 8L),
      s"lowest-quality docs must go: ${en.toSeq}")
    assert(kept.exists(r => r._1 == 99L && r._3 == 1L && r._4 == 1L),
      "a singleton stratum survives its own gate")
  }

  test("threshold quality gate brackets the rank gate exactly at the boundary") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val rankKept = graft.operators.TextOps.qualityGate(docs, 25, 100)
      .select("doc_id").as[Long].collect().toSet
    val strict = graft.operators.TextOps
      .qualityGateByThreshold(docs, 25, 100, keepThresholdValue = false)
      .select("doc_id").as[Long].collect().toSet
    val incl = graft.operators.TextOps
      .qualityGateByThreshold(docs, 25, 100, keepThresholdValue = true)
      .select("doc_id").as[Long].collect().toSet
    assert(strict.nonEmpty && rankKept.nonEmpty)
    assert(strict.subsetOf(rankKept),
      s"strict threshold kept a doc the rank gate dropped: ${strict -- rankKept}")
    assert(rankKept.subsetOf(incl),
      s"rank gate kept a doc the inclusive threshold dropped: ${rankKept -- incl}")
    // the two threshold policies differ only at the threshold value itself:
    // within each language every differing doc carries the SAME q6
    val meta = graft.operators.TextOps.qualityProjection(docs)
      .select(col("doc_id"),
        floor(col("quality_score") * 1e6).cast("long").as("q6"))
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._3, r._2)).toMap
    (incl -- strict).groupBy(d => meta(d)._1).foreach { case (lang, ds) =>
      assert(ds.map(d => meta(d)._2).size == 1,
        s"lang $lang boundary docs span multiple q6 values")
    }
  }

  test("boilerplateSpans flags recurring chunks, keeps unique content tokens") {
    // "all rights reserved" tiles as chunks ("all rights", "reserved") at
    // the TAIL of every doc (even token offset), so both chunks recur in
    // all 4 docs; the 3-token unique head keeps chunk alignment stable
    val docs = Seq(
      (1L, "alpha beta gamma x all rights reserved"),
      (2L, "delta epsilon zeta y all rights reserved"),
      (3L, "eta theta iota z all rights reserved"),
      (4L, "kappa lambda mu w all rights reserved")
    ).toDF("doc_id", "text")
    val out = TextOps.boilerplateSpans(docs, chunkLen = 2, minDf = 4L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // 7 tokens → 4 chunks; tail chunks ("all rights", "reserved") recur in
    // all docs → 2 flagged, 4 unique head tokens survive (2 full chunks)
    out.foreach { case (id, (nc, fl, kept)) =>
      assert(nc == 4L, s"doc $id chunks: $nc")
      assert(fl == 2L, s"doc $id flagged: $fl")
      assert(kept == 4L, s"doc $id kept: $kept")
    }
    // below the df floor nothing flags
    val loose = TextOps.boilerplateSpans(docs, chunkLen = 2, minDf = 5L)
      .collect().map(r => r.getLong(2)).sum
    assert(loose == 0L, "df floor above corpus size must flag nothing")
    graft.core.GraftCaches.releaseAll(spark)
  }

  test("spikeDetect: spike flagged against a baseline that excludes itself") {
    def t(i: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$i%02d:00")
    // key 1: flat 1.00 tape with a 10.00 spike at row 25 (warm) and a
    // 10.00 value at row 5 (inside warmup — must NOT be flagged)
    val rows = (0 until 30).map { i =>
      val v = if (i == 25 || i == 5) 10.0 else 1.0
      (i.toLong, 1L, t(i), v)
    }
    val out = graft.operators.EventOps.spikeDetect(
        rows.toDF("event_id", "user_id", "ts", "value"),
        lookback = 20, minTrail = 10, mulNum = 3, mulDen = 1)
      .select("event_id", "trail_n", "trail_sum_cents")
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(25L),
      s"exactly the warm spike flags: ${out.toSeq}")
    // row 25's trailing window is rows 5..24: one early spike + 19 flat
    assert(out.head._2 == 20L && out.head._3 == 19 * 100L + 1000L,
      s"baseline must exclude the flagged row itself: ${out.head}")
    // the row AFTER the spike sees it in-baseline and must stay quiet —
    // implied by the flagged set above; determinism under repartitioning
    val again = graft.operators.EventOps.spikeDetect(
        rows.toDF("event_id", "user_id", "ts", "value").repartition(4),
        lookback = 20, minTrail = 10, mulNum = 3, mulDen = 1)
      .select("event_id").as[Long].collect().toSeq
    assert(again == Seq(25L))
  }

  test("dqReport counts each planted violation exactly; clean data passes all") {
    val bad = Seq(
      (1L, "good text here", "en", 14L),
      (1L, "dup id",         "en", 6L),   // duplicate doc_id
      (2L, "",               "en", 0L),   // empty text
      (3L, "wrong count",    "en", 99L),  // n_chars != length(text)
      (4L, "bad lang",       "xx", 8L))   // outside the domain
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = TextOps.dqReport(bad, minRows = 3L)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._4)).toMap
    assert(got("row_count_min") == ((5L, true)))
    assert(got("no_empty_text") == ((1L, false)))
    assert(got("unique_doc_id") == ((1L, false)))
    assert(got("lang_in_domain") == ((1L, false)))
    assert(got("n_chars_matches_text") == ((1L, false)),
      s"full report: $got")

    val clean = Tables.documents(spark, TestSpark.Sf0001)
    val rep = TextOps.dqReport(clean)
      .as[(String, Long, Long, Boolean)].collect()
    assert(rep.length == 5 && rep.forall(_._4), s"fixture must be clean: ${rep.toSeq}")
  }

  test("scd2Intervals collapses repeat states; intervals tile the timeline") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(d: Int) = new java.sql.Timestamp(t0.getTime + d * 86400000L)
    val events = Seq(
      (1L, ts(0), 7L, "signup"),
      (2L, ts(1), 7L, "signup"),   // repeat state — must collapse into v1
      (3L, ts(2), 7L, "purchase"),
      (4L, ts(3), 7L, "signup"),   // state REVISITED — a new version, not v1
      (5L, ts(0), 8L, "error"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.EventOps.scd2Intervals(events)
      .as[(Long, String, java.sql.Timestamp, Option[java.sql.Timestamp], Long, Boolean)]
      .collect().toSeq

    val u7 = out.filter(_._1 == 7L)
    assert(u7.map(r => (r._5, r._2)) == Seq((1L, "signup"), (2L, "purchase"),
      (3L, "signup")), s"collapse/versioning drifted: $u7")
    // half-open tiling: each valid_to is the next version's valid_from
    assert(u7(0)._4.contains(u7(1)._3) && u7(1)._4.contains(u7(2)._3))
    assert(u7(2)._4.isEmpty && u7(2)._6, "last version must be current")
    // the collapsed repeat does NOT advance v1's interval start
    assert(u7(0)._3 == ts(0))
    val u8 = out.filter(_._1 == 8L)
    assert(u8.map(r => (r._5, r._6)) == Seq((1L, true)))
    // point-in-time: day 1.5 falls inside v1's [from, to) — state "signup"
    val probe = new java.sql.Timestamp(t0.getTime + 129600000L)
    val at = u7.filter(r => !r._3.after(probe) && r._4.forall(_.after(probe)))
    assert(at.map(_._2) == Seq("signup"))
  }

  test("heavyHitters matches the exact full-vocab computation on the fixture") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val got = TextOps.heavyHitters(docs, k = 30)
      .as[(String, Long)].collect().toSeq

    val toks = docs.select(explode(TextOps.words(col("text"))).as("word"))
    val total = toks.count()
    val want = toks.groupBy("word").count()
      .filter(col("count") * 30 > total)
      .orderBy(col("count").desc, col("word"))
      .as[(String, Long)].collect().toSeq

    assert(got.nonEmpty && got == want,
      s"heavy hitters drifted from exact: got ${got.take(5)} want ${want.take(5)}")
  }

  test("heavyHitters survives constant Misra-Gries eviction (superset guarantee)") {
    // One heavy word drowned in a stream of unique one-off tokens: with
    // k = 10 the 9-counter summary is evicted on nearly every token, the
    // adversarial regime for the sketch. The guarantee under test: a word
    // with freq > n/k CANNOT be evicted for good (its counter absorbs more
    // increments than decrement-alls can remove), so the exact recount
    // sees it. "mid" sits exactly AT the threshold (count*k == n) and must
    // be excluded by the strict inequality.
    val uniques = Seq.tabulate(75)(i => s"u$i")
    val text = (Seq.fill(15)("hh") ++ Seq.fill(10)("mid") ++ uniques)
    val rnd = new scala.util.Random(11)
    val shuffled = rnd.shuffle(text).mkString(" ") // n = 100 tokens
    val docs = Seq((1L, shuffled)).toDF("doc_id", "text").coalesce(1)

    val got = TextOps.heavyHitters(docs, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("hh", 15L)), s"got $got")

    // candidate-set bound: at most (k-1) survivors + 1 total row per
    // partition ever leave the scan
    val scan = TextOps.heavyHitterScan(
      docs.select(explode(TextOps.words(col("text"))).as("word")), k = 10)
      .collect()
    assert(scan.count(_.get(0) != null) <= 9, s"summary overflow: ${scan.length}")
    assert(scan.filter(_.get(0) == null).map(_.getLong(1)).sum == 100L)
  }
}
