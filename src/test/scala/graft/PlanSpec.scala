package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the physical-plan properties that make these queries survive a
  * 100× scale-up: parquet filter pushdown, column pruning, broadcast joins
  * for small dims, no cartesian products anywhere. A regression here is a
  * performance bug even when results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString

  test("q01: predicate pushed to parquet scan, columns pruned") {
    val p = plan("q01_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)]"),
      s"filter not pushed:\n$p")
    assert(p.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>"),
      s"columns not pruned:\n$p")
  }

  test("q05/q09: dimension joins broadcast, no sort-merge on small dims") {
    Seq("q05_join_revenue", "q09_topk").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: no broadcast join:\n$p")
      assert(!p.contains("CartesianProduct"), s"$q: cartesian product!")
    }
  }

  test("q07 range join: equi-key hash join with range residual, not BNLJ") {
    val p = plan("q07_range_join")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"range join fell off the hash path:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"q07 degenerated to a nested loop:\n$p")
  }

  test("mkt_asof_enrich: as-of join is union+window, no nested loop") {
    val p = plan("mkt_asof_enrich")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"as-of degenerated:\n$p")
    assert(p.contains("Window"), s"expected window-based as-of:\n$p")
  }

  test("mkt_source_dim_join: dim broadcast, series pruned to minute partitions, market pushed") {
    val df = SparkEntry.queries("mkt_source_dim_join")(spark, TestSpark.Sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"tickers dim not broadcast:\n$p")
    // granularity + adjusted pushdown must reach the polygon scan: the
    // hour--1 series in the fixture tree must not be scanned
    assert(p.contains("PushedFilters=[") && p.contains("timespan"),
      s"series pushdown not visible:\n$p")
    // market=stocks is handled inside the dim scan (the API's query param),
    // not re-checked post-scan
    assert(p.contains("PolygonDimScan") && p.contains("market"),
      s"dim market pushdown not visible:\n$p")
  }

  test("mkt_source_topk: single-series ORDER BY t DESC LIMIT k fully pushes — no Sort above the scan") {
    import org.apache.spark.sql.functions.col
    val fix = graft.sources.PolygonFixtures.ensure(spark, TestSpark.Sf0001)
    val one = spark.read.format("polygon").option("path", fix).load()
      .filter(col("ticker") === "T0000" && col("timespan") === "minute" &&
        col("multiplier") === 1 && col("adjusted") === true)
      .orderBy(col("t").desc).limit(5)
    val p1 = one.queryExecution.executedPlan.toString
    assert(p1.contains("PushedTopN=[t DESC, 5]"), s"TopN not pushed:\n$p1")
    assert(!p1.contains("Sort") && !p1.contains("TakeOrdered"),
      s"fully-pushed TopN must leave no Sort above the scan:\n$p1")
    // the declared query: each union branch fully pushed; the only Sort is
    // the presentation ORDER BY over the 2k result rows
    val p = plan("mkt_source_topk")
    assert(p.contains("PushedTopN=[t DESC, 5]"), s"TopN not pushed in declared query:\n$p")
    // multi-series partial push: Spark keeps the top-k merge, scan still tails
    val many = spark.read.format("polygon").option("path", fix).load()
      .filter(col("timespan") === "minute").orderBy(col("t").desc).limit(7)
    val pMany = many.queryExecution.executedPlan.toString
    assert(pMany.contains("TakeOrderedAndProject") && pMany.contains("PushedTopN=[t DESC, 7]"),
      s"partial TopN push must keep the merge and tail the scan:\n$pMany")
  }

  test("dedup_embedding_lsh: candidate generation is a hash join on (band, code), not all-pairs") {
    val p = SparkEntry.queries("dedup_embedding_lsh")(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketed near-dup degenerated to all-pairs:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"expected an equi join on the band buckets:\n$p")
  }

  test("ivf: centroid selection is constant-k TakeOrdered feeding a broadcast") {
    // the 100 TB contract for IVF: the assignment side must be a fixed-k
    // sample (TakeOrderedAndProject — never grows with the corpus) and the
    // assignment join must broadcast it
    Seq("ann_ivf_topk", "dedup_embedding_ivf").foreach { q =>
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q: centroid selection is not a constant-k TakeOrdered:\n$p")
      assert(p.contains("BroadcastExchange"),
        s"$q: centroids not broadcast for assignment:\n$p")
    }
  }

  test("dedup_ngram_jaccard: df-cap is a broadcast anti-join blacklist, never a window") {
    // a Window.partitionBy(s) df count would materialize every occurrence
    // of a frequent shingle in one task — the exact skew the cap exists to
    // kill. The cap must stay a groupBy-derived blacklist (map-side partial
    // agg) anti-joined via broadcast.
    val p = plan("dedup_ngram_jaccard")
    assert(!p.contains("Window"), s"df-cap regressed to a window plan:\n$p")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"over-cap blacklist must broadcast into a map-side anti join:\n$p")
  }

  test("mkt_backtest_sma: one shuffle by key feeds every window pass") {
    // the whole backtest is window arithmetic over one (user_id) hash
    // partitioning; a second hashpartitioning would mean a window lost the
    // co-partitioning and re-shuffled the tape
    val p = plan("mkt_backtest_sma")
    assert("hashpartitioning".r.findAllIn(p).length == 1,
      s"backtest re-shuffled between window passes:\n$p")
  }

  test("day-grid operators plan no single-partition windows") {
    // the correlation/backtest family ranks and prefix-maxes over the shared
    // day grid with two-phase helpers; a bare Window.orderBy would serialize
    // the grid through one task at any scale
    var windowsSeen = 0
    for (q <- Seq("mkt_corr_screen", "mkt_backtest_portfolio", "mkt_risk_stats")) {
      // AdaptiveSparkPlanExec is a leaf — unwrap it or collect() sees nothing
      val exec = SparkEntry.queries(q)(spark, TestSpark.Sf0001)
        .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val wins = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      windowsSeen += wins.size
      val serial = wins.filter(_.partitionSpec.isEmpty)
      assert(serial.isEmpty,
        s"$q still plans ${serial.size} unpartitioned window(s):\n${serial.headOption}")
    }
    assert(windowsSeen > 0,
      "traversal is vacuous — expected partitioned windows in the backtest family")
  }

  test("q23_funnel: stage predicates reach the parquet scans") {
    val p = plan("q23_funnel")
    assert(p.contains("isnotnull(event_type"),
      s"stage filter not pushed into the event scans:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("txt_top_docs: per-group rank filter compiles to WindowGroupLimit") {
    // without the group-limit rewrite every language's documents sort in
    // full inside one window partition — the per-group state must be the
    // k-row heap, not the group
    val p = plan("txt_top_docs")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k did not compile to WindowGroupLimit:\n$p")
  }

  test("q19: KMV rn<=k filter compiles to WindowGroupLimit") {
    // the k-minimum-values sketch keeps the k smallest hashes per group —
    // the rank filter must compile to the k-row heap, not a full sort of
    // every group's distinct hash set
    val p = plan("q19_approx_distinct")
    assert(p.contains("WindowGroupLimit"),
      s"rn<=k did not compile to WindowGroupLimit:\n$p")
  }

  test("txt_tfidf: per-doc top-k is WindowGroupLimit, ln(N) scalar broadcast") {
    // the per-doc rank must keep a k-row heap, not sort each document's
    // whole vocabulary; the single-row ln(N) frame must ride a broadcast,
    // never force a real cartesian
    val p = plan("txt_tfidf")
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k did not compile to WindowGroupLimit:\n$p")
    assert(!p.contains("CartesianProduct"), s"ln(N) scalar must broadcast:\n$p")
  }

  test("dedup_contamination: eval shingles broadcast, no corpus-sized shuffle join") {
    val p = plan("dedup_contamination")
    assert(p.contains("BroadcastHashJoin"),
      s"eval shingle set must broadcast (it is tiny next to the corpus):\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"contamination flagging must not shuffle the corpus shingles:\n$p")
  }

  test("txt_vocab_topk: partial-then-final aggregate under a TakeOrdered top-k") {
    val p = plan("txt_vocab_topk")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered (k rows per partition), not a global sort:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"word counting must map-side combine (partial + final aggregate):\n$p")
  }

  test("corpus export: quota broadcast, per-shard windows, scrub stays a projection") {
    // mixture: the per-stratum quota must arrive by broadcast (it is
    // bounded by stratum cardinality), and every window must be
    // stratum-partitioned — a single-partition exchange would serialize
    // the corpus through one task
    val mix = plan("txt_mixture_resample")
    assert(mix.contains("BroadcastHashJoin"), s"quota join not broadcast:\n$mix")
    // the rank window must carry a stratum partition spec (the scalar
    // min(T) aggregate's SinglePartition exchange is fine — it reduces
    // stratum-cardinality rows); an UNpartitioned rank would serialize
    // the corpus through one task
    assert(mix.contains("windowspecdefinition(lang"),
      s"mixture rank window lost its stratum partitioning:\n$mix")
    // sharding + packing: all windows partition by shard
    Seq("txt_shard_export", "txt_pack_sequences").foreach { q =>
      val p = plan(q)
      assert(p.contains("windowspecdefinition(shard") ||
        p.contains("windowspecdefinition((("),
        s"$q: window lost its shard partitioning:\n$p")
      assert(!p.contains("Exchange SinglePartition"),
        s"$q: a single-partition exchange appeared:\n$p")
    }
    // PII scrub is a pure per-row projection: no window, no hash shuffle —
    // the only exchange is the declared ORDER BY's range partitioning
    val scrub = plan("txt_pii_scrub")
    assert(!scrub.contains("Window") && !scrub.contains("hashpartitioning"),
      s"piiScrub must stay a narrow projection:\n$scrub")
  }

  test("no query plans a cartesian product (cross joins are broadcast by design)") {
    SparkEntry.allDefs.foreach { q =>
      val p = q.build(spark, TestSpark.Sf0001).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"${q.name} plans CartesianProduct")
    }
  }

  test("scans read only required columns (spot-check heavy fact queries)") {
    val p4 = plan("q04_pricing_summary")
    assert(!p4.contains("l_orderkey"), s"q04 reads unneeded columns:\n$p4")
    val p14 = plan("q14_ohlc_bars")
    assert(!p14.contains("props"), s"q14 reads unneeded props column:\n$p14")
  }

  test("txt_heavy_hitters: recount joins the broadcast candidate set, never the vocab") {
    val p = plan("txt_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate recount must broadcast the bounded candidate set:\n$p")
    // the corpus-sized PROBE side (printed first, up to the sibling
    // BroadcastExchange) must reach the join straight off the scan — no
    // exchange; shuffles of the BOUNDED candidate/total frames inside the
    // broadcast build side are fine and expected
    val joinIdx = p.indexOf("BroadcastHashJoin")
    val buildIdx = p.indexOf("BroadcastExchange", joinIdx)
    assert(joinIdx >= 0 && buildIdx > joinIdx &&
      !p.substring(joinIdx, buildIdx).contains("Exchange"),
      s"the corpus token frame is shuffled before the candidate join:\n$p")
  }

  test("q27_scd2: change filter and both windows share one entity exchange") {
    val p = plan("q27_scd2")
    val exchanges = "hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(exchanges == 1,
      s"SCD2 must shuffle by entity exactly once, found $exchanges:\n$p")
  }

  test("txt_dq_report: one aggregation pass, constant-size explode, no join") {
    val p = plan("txt_dq_report")
    assert(!p.contains("Join"), s"the DQ report must not join:\n$p")
    assert(p.contains("Generate"), s"expected the in-plan rule explode:\n$p")
  }
}
