package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY.md "Spill-aware / skewed keys →
  * salting or AQE skew-join"): two-phase salted aggregation and a salted
  * broadcast join.
  *
  * When one key holds a disproportionate share of rows (one ticker = half
  * the tape is the classic market-data case), a plain groupBy sends the
  * whole hot key to one reducer. Salting splits each key into `buckets`
  * sub-keys for a partial aggregate, then combines partials — the hot key's
  * work spreads over `buckets` tasks and the second phase only sees
  * `buckets` rows per key. AQE's skew handling covers sort-merge JOINS;
  * aggregation skew still needs this.
  */
object Salting {

  /** Two-phase salted sum/count-style aggregation.
    *
    * @param aggs  partial aggregates as (alias → agg builder); each must be
    *              re-combinable by the same function (sum, count→sum, min,
    *              max — not avg: derive it from sum/count afterwards)
    * @param discriminator  extra salt input for inputs that can contain
    *              byte-identical duplicate rows: the content hash sends all
    *              copies of an identical row to ONE sub-key, so a hot key
    *              made of repeated identical ticks (common in market tapes)
    *              would get no spread. Pass any caller-stable column that
    *              varies across copies (a file/row offset from
    *              `_metadata.file_path`/`row_index`, a bronze page id, …).
    *              Must be deterministic under task retry — partition-id or
    *              monotonically_increasing_id are NOT (recomputed rows would
    *              re-salt differently than copies already consumed by
    *              surviving reducers, double-counting under recovery).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                aggs: Map[String, Column => Column],
                valueCols: Map[String, Column],
                discriminator: Option[Column] = None): DataFrame = {
    // deterministic per row content: task retries re-derive the same salt
    // (partition-id / monotonic-id salts break under partial recomputation —
    // recomputed rows would land in different sub-keys than copies already
    // consumed by surviving reducers)
    val saltInputs = df.columns.map(col).toSeq ++ discriminator.toSeq
    val salted = df.withColumn("_salt",
      pmod(xxhash64(saltInputs: _*), lit(buckets)))
    val partialAggs = aggs.map { case (alias, fn) =>
      fn(valueCols(alias)).as(alias)
    }.toSeq
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = aggs.map { case (alias, fn) => fn(col(alias)).as(alias) }.toSeq
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Convenience: salted grouped sum of one column. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                buckets: Int = 16): DataFrame =
    saltedAgg(df, keys, buckets,
      aggs = Map(s"sum_$valueCol" -> (c => sum(c))),
      valueCols = Map(s"sum_$valueCol" -> col(valueCol)))

  /** Salted skewed EQUI-JOIN: the join twin of saltedAgg, for probes whose
    * key groups are hot on the RIGHT side (the incremental dedup paths'
    * hot signature buckets). The right side splits each key group into
    * `salts` deterministic sub-keys — pmod(xxhash64(saltKey), salts), so
    * task retries re-derive the same salt — and the left side replicates
    * across ALL sub-keys; joining on keys :+ salt yields exactly the
    * plain join's rows while any single key group's per-task fan-in drops
    * to ~1/salts of its right-side membership. The cost is shuffling
    * `salts` copies of the left side — pay it only for rows already
    * screened hot (AQE's skew splitting covers joins whose both sides
    * shuffle; a side that must stay on its bucketed scan, or a hash join
    * AQE won't re-plan, still needs this).
    *
    * Returns the join of `left.as("a")` × `right.as("b")` under the equi
    * keys, the salt match, and the caller's residual `extra` condition
    * (written against the "a"/"b" aliases); the salt columns are dropped
    * from the output. Neither input may already carry a `_salt` column.
    */
  def saltedSkewJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                     saltKey: Column, salts: Int, extra: Column): DataFrame = {
    require(salts >= 1, "saltedSkewJoin needs at least one salt")
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "saltedSkewJoin reserves the _salt column")
    val rep = left.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    val sal = right.withColumn("_salt",
      pmod(xxhash64(saltKey), lit(salts)).cast("int"))
    val cond = (keys.map(k => col(s"a.$k") === col(s"b.$k")) :+
      (col("a._salt") === col("b._salt")) :+ extra).reduce(_ && _)
    rep.as("a").join(sal.as("b"), cond).drop("_salt")
  }
}
