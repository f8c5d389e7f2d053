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
  * GraphX/GraphFrames): edge data stays on the cluster; each round
  * localCheckpoints the edge set to truncate lineage that would otherwise
  * double per iteration.
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
    var e = edges
      .select(cu.cast("long").as("u"), cv.cast("long").as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .select(greatest(col("u"), col("v")).as("u"),
              least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()

    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      // Set equality of two distinct canonical edge sets: equal counts plus
      // one empty anti-join (next ⊆ e ∧ |next| = |e| → next = e). Two small
      // cluster aggregates per round — no data to the driver beyond scalars.
      converged = next.count() == e.count() &&
        next.join(e, Seq("u", "v"), "left_anti").isEmpty
      e = next
      rounds += 1
    }
    require(converged,
      s"connectedComponents did not converge within $maxRounds rounds " +
        "(theoretical bound is O(log^2 n) — raise maxRounds for adversarial graphs)")

    e.select(col("u").as("node"), col("v").as("component"))
      .union(e.select(col("v").as("node"), col("v").as("component")))
      .distinct()
  }

  /** Large-star: every node re-points its strictly-LARGER neighbors at the
    * minimum of its closed neighborhood. Operates on the symmetric closure;
    * output is canonical (u > v) and self-loop-free because
    * m ≤ u < v for every emitted (v, m).
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val m = sym.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    sym.join(m, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .distinct()
  }

  /** Small-star: every node links its smaller-or-equal neighborhood (and
    * itself) to that neighborhood's minimum. Input and output both
    * canonical (u > v): emitted neighbor edges are (v, m) with v ≥ m from
    * the same min-group (v ≠ m filtered), plus the (u, m) self link.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val m = e.groupBy("u").agg(min("v").as("m"))
    val nbrs = e.join(m, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val self = m.select(col("u"), col("m").as("v"))
    nbrs.union(self).distinct()
  }
}
