package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CorpusLifecycle, Relational, Relational2, SourceQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory entries (SURVEY.md §2) to DataFrame
  * builders over a scale-factor fixture dir; `oracleSql` carries the DuckDB
  * SQL the driver hash-compares against (omitted → rows-only check).
  */
object SparkEntry {

  /** All declared query suites, in coverage order. */
  def allDefs: Seq[QueryDef] =
    Relational.defs ++
      Relational2.defs ++
      SourceQueries.defs ++
      operators.TextOps.defs ++
      operators.CorpusOps.defs ++
      operators.DedupOps.defs ++
      operators.SimilarityOps.defs ++
      operators.MarketOps.defs ++
      operators.Multimodal.defs ++
      CorpusLifecycle.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H-Q1-shaped grouped multi-aggregate (O-A7 analogue).
    */
  def entry(spark: SparkSession): DataFrame =
    allDefs.find(_.name == "q04_pricing_summary").get
      .build(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
