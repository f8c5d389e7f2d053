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

  /** `events.ts` has shipped in two physical parquet encodings across fixture
    * generations: timestamp[ns] (which Spark 4 rejects by default —
    * PARQUET_TYPE_ILLEGAL — so we read it as a nanos long via
    * `nanosAsLong` and truncate to micros) and plain timestamp[us] (which
    * Spark reads directly, as TIMESTAMP or TIMESTAMP_NTZ depending on the
    * footer's isAdjustedToUTC flag). Branch on the *read* schema so both
    * load to an identical microsecond TimestampType column; session timezone
    * is pinned to UTC at every entry point, so the NTZ→LTZ cast is
    * value-identity. DuckDB's oracle-side CAST(ts AS TIMESTAMP) applies the
    * same micro truncation, so comparisons line up for either encoding.
    * Integer `div` (not `/`) on the ns path: ns-since-epoch ≈ 1.7e18 exceeds
    * a double's 2^53 mantissa.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$d/events.parquet")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => // legacy timestamp[ns] fixture read as nanos-long
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // timestamp[us], isAdjustedToUTC=false
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df // already TimestampType micros
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
