package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance semantics of the reference (SURVEY.md §1.2), columnar:
  *
  * - current view: fixed-key overwrite (O-SNK1 —
  *   polygon-etl-container/src/reference_endpoints_etl.py:57-60)
  * - snapshot history: timestamped append (O-SNK2 — :25-26,61-62), here a
  *   snapshot_ts partition so "what was known when" (README.md:8) is a
  *   partition-pruned read, not a key-listing scan
  * - facts: idempotent keyed append (O-SNK5 + O-J2 anti-join —
  *   old_source/old_source_op.py:170-176), exactly-once visible under
  *   at-least-once upstream
  */
object Sinks {

  /** O-SNK1: overwrite the current view at a fixed path. */
  def writeCurrent(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** O-SNK2: append one timestamped snapshot partition. */
  def writeSnapshot(df: DataFrame, path: String, runTs: java.sql.Timestamp): Unit =
    df.withColumn("snapshot_ts", lit(runTs))
      .write.mode(SaveMode.Append).partitionBy("snapshot_ts").parquet(path)

  /** Latest snapshot view (partition-pruned: the max-partition filter prunes
    * at planning, no full history scan).
    */
  def latestSnapshot(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    val maxTs = df.select(max(col("snapshot_ts"))).collect()(0).getTimestamp(0)
    df.filter(col("snapshot_ts") === lit(maxTs))
  }

  /** Idempotent keyed append: anti-join strips rows whose key already exists,
    * then appends partitioned by the partition columns. Replaying the same
    * batch is a no-op.
    */
  def idempotentAppend(df: DataFrame, path: String, keys: Seq[String],
                       partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val fresh =
      if (!new java.io.File(path).exists()) df
      else {
        val existing = spark.read.parquet(path).select(keys.map(col): _*)
        df.join(existing, keys, "left_anti")
      }
    val writer = fresh.write.mode(SaveMode.Append)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(path)
  }
}
