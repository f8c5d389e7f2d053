package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * clustering stage of a dedup pipeline. Near-dup detection emits PAIRS
  * (MinHash/LSH, SimHash, exact-Jaccard); keeping one survivor per duplicate
  * GROUP requires the transitive closure of those pairs (a~b, b~c → drop two
  * of {a,b,c}, not one of each pair). The reference's pipeline stops at
  * drop_duplicates on exact keys (polygon-etl-container/src/
  * reference_endpoints_etl.py:56); this is the graph generalization a
  * crawl-scale corpus needs.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the standard
  * shared-nothing formulation, O(log² n) rounds on any graph and 2–4 rounds
  * in practice on near-dup graphs (components are near-cliques, so minima
  * propagate in one hop). Each half-round is one groupBy-min (map-side
  * partial aggregation — a node's degree collapses per input partition
  * before the shuffle) plus one hash join on node id. Unlike naive label
  * propagation there is no per-round neighborhood broadcast that a
  * high-degree boilerplate cluster could skew: large-star re-points only
  * strictly-larger neighbors at the local min, small-star only the smaller
  * ones, so emitted degree never exceeds input degree.
  *
  * The round loop is driver-side CONTROL FLOW only (same pattern as
  * GraphX/GraphFrames): edge data stays on the cluster; each round cuts
  * the edge set's lineage (graft.core.Checkpoints.cut) — lineage would
  * otherwise double per iteration. With `spark.graft.checkpointDir` set
  * the cuts are RELIABLE checkpoints, so an executor loss mid-contraction
  * re-reads the last round from durable storage instead of failing the
  * job; unset, they are executor-local (the test/interactive default).
  */
object Components {

  /** Edges at convergence form stars: (node, componentMin) for every
    * non-root node. Input: DataFrame with two numeric columns — first = one
    * endpoint, second = the other. Self-loops dropped, direction ignored.
    * Returns (node: long, component: long) for EVERY node that appears in
    * an edge; component = min node id of its connected component (roots
    * map to themselves). Nodes with no edges are absent by construction —
    * callers treat them as singleton clusters.
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    val Seq(cu, cv) = edges.columns.toSeq.take(2).map(col)
    var e = graft.core.Checkpoints.cut(edges
      .select(cu.cast("long").as("u"), cv.cast("long").as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .select(greatest(col("u"), col("v")).as("u"),
              least(col("u"), col("v")).as("v"))
      .distinct())

    // Per-round convergence probe: one aggregate job (count + hash sum)
    // against the previous round's scalars. Counts alone cannot detect
    // progress here — on a FOREST every contraction round preserves
    // |E| = |V| - #components exactly — and an every-round set-equality
    // anti-join is a full extra pass. The hash sum changes whenever the
    // edge set changes (up to a 2^-64-scale collision), so the
    // DETERMINISTIC anti-join runs only on the round that looks stable:
    // convergence is still proven by set algebra, the hash only schedules
    // the proof.
    def probe(d: DataFrame): (Long, java.math.BigDecimal) = {
      val r = d.agg(count(lit(1)), sum(xxhash64(col("u"), col("v"))
        .cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }
    var sig = probe(e)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val next = graft.core.Checkpoints.cut(smallStar(largeStar(e)))
      val nextSig = probe(next)
      // mutual anti-join: SET equality independent of row multiplicities
      // (the rounds carry multisets; the set-level dynamics are the
      // paper's, since min-aggregates and per-row emits are dup-blind)
      converged = nextSig == sig &&
        next.join(e, Seq("u", "v"), "left_anti").isEmpty &&
        e.join(next, Seq("u", "v"), "left_anti").isEmpty
      e = next
      sig = nextSig
      rounds += 1
    }
    require(converged,
      s"connectedComponents did not converge within $maxRounds rounds " +
        "(theoretical bound is O(log^2 n) — raise maxRounds for adversarial graphs)")

    // rounds-to-convergence rides the component column's metadata — the
    // observability hook an operator embedded in a larger plan can expose
    // without widening its schema (Alias propagates it downstream)
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.cc.rounds", rounds.toLong).build()
    e.select(col("u").as("node"), col("v").as("component", md))
      .union(e.select(col("v").as("node"), col("v").as("component", md)))
      .distinct()
  }

  /** INCREMENTAL component maintenance: fold a drop's new edges into an
    * existing (node, component) labeling WITHOUT re-running the
    * contraction over the full graph. The observation: new edges can only
    * change components they TOUCH — every other component keeps its label
    * set verbatim. So the work is (1) find the components the new edges'
    * endpoints belong to, (2) re-run the star contraction over just the
    * NEW edges plus the star edges (node, component) of those touched
    * components' members — star edges are an equivalent connectivity
    * witness for the old labeling, so the sub-result equals the full
    * recompute restricted to the touched region — and (3) return the
    * re-labeled rows (touched members ∪ new endpoints) for the caller to
    * version-append over the old rows.
    *
    * Cost: bounded by the new edges plus the touched components' member
    * counts — never the cumulative pair graph. This is what turns the
    * survivors view from a per-read full-graph CC job into a label-store
    * scan at 100 TB (CorpusIngest maintains the store per drop).
    *
    * `currentLabels`: (node, component) — the CURRENT view of the label
    * store (one row per node). `newEdges`: two numeric columns. Returns
    * (node, component) for exactly the rows whose label may have changed.
    * Deterministic (min-id labels), so a crash-retry replaying the same
    * merge appends identical values — version-append semantics make that
    * harmless.
    */
  def mergeLabels(currentLabels: DataFrame, newEdges: DataFrame): DataFrame = {
    val Seq(cu, cv) = newEdges.columns.toSeq.take(2).map(col)
    val e = newEdges.select(cu.cast("long").as("u"), cv.cast("long").as("v"))
    val touched = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node"))).distinct()
    val labels = currentLabels.select(col("node").cast("long").as("node"),
      col("component").cast("long").as("component"))
    val touchedComps = labels.join(touched, Seq("node"), "left_semi")
      .select(col("component")).distinct()
    // all members of the touched components, as star edges — an exact
    // connectivity witness of the old labeling on that region
    val memberStars = labels.join(touchedComps, Seq("component"), "left_semi")
      .select(col("node").as("u"), col("component").as("v"))
    connectedComponents(e.select(col("u"), col("v")).unionByName(memberStars))
  }

  /** Large-star: every node re-points its strictly-LARGER neighbors at the
    * minimum of its closed neighborhood. Operates on the symmetric closure;
    * output is canonical (u > v) and self-loop-free because
    * m ≤ u < v for every emitted (v, m). NOT deduplicated: each undirected
    * edge emits exactly one row (from its smaller endpoint), so the output
    * is ≤ |E| rows and smallStar's aggregates absorb any (v, m) collisions
    * — a distinct here would be a pure extra shuffle.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val m = sym.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  /** Small-star: every node links its smaller-or-equal neighborhood (and
    * itself) to that neighborhood's minimum. Input and output both
    * canonical (u > v): emitted neighbor edges are (v, m) with v ≥ m from
    * the same min-group (v ≠ m filtered), plus the (u, m) self link.
    *
    * Also not deduplicated: each round emits at most one row per input row
    * plus one per group, so duplicate rows PERSIST but never MULTIPLY —
    * the working multiset stays O(|E| + |V|) across all rounds (the entry
    * distinct bounds input dups; the label projection dedups at the end).
    * Dropping the per-round distinct removes a full-width shuffle from
    * every round; the aggregates in both stars are dup-insensitive (min).
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("u").agg(min("v").as("m"))
    val nbrs = e.join(m, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val self = m.select(col("u"), col("m").as("v"))
    nbrs.union(self)
  }
}
