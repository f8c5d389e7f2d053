package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver fixture tables (TESTDATA.md).
  *
  * Each table is one parquet file under the scale-factor directory. At 100 TB
  * these would be partitioned datasets (e.g. partitionBy(ticker/date)); the
  * loader keeps the call-site identical so only the path changes. Reads are
  * schema-on-file (parquet footer) — Catalyst prunes columns and pushes
  * predicates into the scan, so callers should NOT .cache() these eagerly.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir) // ns-timestamp normalization
    else spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")

  /** `events.ts` is parquet timestamp[ns], which Spark 4 rejects by default
    * (PARQUET_TYPE_ILLEGAL). Read it as a nanos long and truncate to a
    * microsecond TimestampType — the same truncation DuckDB applies on
    * CAST(ts AS TIMESTAMP), so oracle comparisons line up. Integer `div`
    * (not `/`): ns-since-epoch ≈ 1.7e18 exceeds a double's 2^53 mantissa.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$d/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
