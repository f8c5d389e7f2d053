package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query: the Spark build and (when SQL-expressible) the DuckDB
  * oracle SQL the driver runs over the same parquet tables. Column names and
  * value semantics must match exactly between the two (driver hash-compares
  * after sorting columns by name).
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sqlBacked(name: String, sql: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(sql))

  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
