package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The batch half of the incremental protocol (SURVEY.md §3-E3, §4): an
  * explicit `_watermarks` table — (ticker, adjusted) → max ingested event
  * time — replacing the reference's sink-scraping watermark discovery
  * (airflow-dags/dag_aggregates_etl.py:128-150 re-downloads the latest S3
  * object and maxes over its rows on every run).
  *
  * Protocol per batch: read watermarks → fetch/scan with from = watermark
  * (at-least-once, the source refetches the boundary) → keep rows strictly
  * past the watermark → append → advance watermarks. Idempotent under
  * replay; FIXTURES.md §_watermarks is this table's schema.
  */
object Watermarks {

  def path(warehouse: String): String = s"$warehouse/_watermarks"

  def read(spark: SparkSession, warehouse: String): DataFrame = {
    val p = path(warehouse)
    // crash recovery: if a swap died between rename(main, bak) and
    // rename(tmp, main), the previous table survives at _bak
    val src =
      if (Sinks.pathExists(spark, p)) Some(p)
      else if (Sinks.pathExists(spark, p + "_bak")) Some(p + "_bak")
      else None
    src.map(spark.read.parquet(_)).getOrElse(
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "ticker STRING, adjusted BOOLEAN, max_t BIGINT, updated_at TIMESTAMP")))
  }

  /** Series-identity columns present in a frame: a multi-granularity
    * pipeline watermarks each (ticker, timespan, multiplier, adjusted)
    * series independently (a 1-minute watermark must never filter a 1-hour
    * series of the same ticker); frames carrying only the legacy
    * (ticker, adjusted) pair keep the legacy key. A warehouse sticks to one
    * key shape — it is derived from the first advanced batch.
    */
  private def keyCols(df: DataFrame): Seq[String] =
    Seq("ticker", "timespan", "multiplier", "adjusted")
      .filter(df.columns.contains)

  /** New-rows-only filter for an incoming batch: strict t > watermark per
    * series; series without a watermark pass whole. The incoming frame must
    * carry the table's full series key — silently narrowing the join to the
    * shared columns would match one incoming row against several watermark
    * rows and DUPLICATE it (advance fails loudly on the same mismatch).
    */
  def filterNew(incoming: DataFrame, wm: DataFrame): DataFrame = {
    // cold start: an EMPTY watermark table (fresh warehouse — read() falls
    // back to the legacy-schema empty frame) constrains nothing, so every
    // row passes and no key-shape can mismatch; the shape is pinned by the
    // first advance()
    if (wm.isEmpty) return incoming
    val keys = keyCols(wm)
    requireSameKeyShape(keyCols(incoming), keys)
    incoming.join(broadcast(wm.select((keys :+ "max_t").map(col): _*)),
        keys, "left")
      .filter(col("max_t").isNull || col("t") > col("max_t"))
      .drop("max_t")
  }

  /** Key shapes must match EXACTLY in both directions: a full
    * (ticker,timespan,multiplier,adjusted) batch against a legacy
    * (ticker,adjusted) table would silently group on the narrow key and
    * collapse per-granularity watermarks to the max across series — rows of
    * slower-ingesting granularities would then be dropped as "already seen".
    * The opposite mismatch (narrow batch, full table) already failed loudly;
    * this makes both directions loud.
    */
  private def requireSameKeyShape(batchKeys: Seq[String], tableKeys: Seq[String]): Unit =
    require(batchKeys == tableKeys,
      s"batch series-key columns (${batchKeys.mkString(", ")}) must exactly match " +
        s"the watermark table's key (${tableKeys.mkString(", ")}); a narrower batch " +
        "would duplicate rows, a wider one would collapse per-granularity watermarks")

  /** Advance watermarks with the batch's per-series max t (full-outer merge,
    * monotone: never moves backward).
    */
  def advance(spark: SparkSession, warehouse: String, batch: DataFrame): Unit = {
    val hasTable = Sinks.pathExists(spark, path(warehouse)) ||
      Sinks.pathExists(spark, path(warehouse) + "_bak")
    val existing = read(spark, warehouse)
    // key shape is pinned by the existing table; a fresh warehouse takes it
    // from the first advanced batch
    val keys = if (hasTable) keyCols(existing) else keyCols(batch)
    if (hasTable) requireSameKeyShape(keyCols(batch), keys)
    val newWm = batch.groupBy(keys.map(col): _*)
      .agg(max(col("t")).as("batch_max"))
    val merged =
      if (!hasTable)
        newWm.select(keys.map(col) ++ Seq(
          col("batch_max").as("max_t"),
          current_timestamp().as("updated_at")): _*)
      else existing.as("old")
        .join(newWm.as("new"), keys, "full_outer")
        .select(keys.map(col) ++ Seq(
          greatest(coalesce(col("old.max_t"), lit(Long.MinValue)),
                   coalesce(col("new.batch_max"), lit(Long.MinValue))).as("max_t"),
          current_timestamp().as("updated_at")): _*)
    // tiny dim table: rewrite whole via write-tmp + rename swap. Hadoop
    // FileSystem (not java.io.File) so the same code works on hdfs/s3a, and
    // rename (not read-back + overwrite) so a crash window never leaves the
    // table half-written: at every instant the full merged data exists in
    // at least one of _tmp/_bak/main. If a crash strands a _bak, the next
    // advance clears it; the merge is monotone so replay is idempotent.
    val tmp = new org.apache.hadoop.fs.Path(path(warehouse) + "_tmp")
    val main = new org.apache.hadoop.fs.Path(path(warehouse))
    val bak = new org.apache.hadoop.fs.Path(path(warehouse) + "_bak")
    val fs = main.getFileSystem(spark.sparkContext.hadoopConfiguration)
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // a readable copy (main or _bak) must exist until the instant tmp is
    // promoted: _bak is only displaced when main is present to displace it,
    // and only deleted after the promotion — so a crash recovering FROM a
    // stranded _bak (main absent) cannot drop the last readable copy
    // Hadoop FileSystem.rename signals failure by RETURNING FALSE (common on
    // object stores) — every step checks the result and aborts loudly, so a
    // failed promotion can never reach the _bak cleanup and destroy the last
    // readable copy (read() would then see an empty table and filterNew would
    // re-admit already-ingested rows).
    if (fs.exists(main)) {
      if (fs.exists(bak) && !fs.delete(bak, true))
        throw new java.io.IOException(s"watermark swap: failed to clear stale $bak")
      if (!fs.rename(main, bak))
        throw new java.io.IOException(s"watermark swap: rename($main, $bak) returned false")
    }
    if (!fs.rename(tmp, main))
      throw new java.io.IOException(
        s"watermark swap: rename($tmp, $main) returned false; previous table intact at $bak")
    // only drop _bak once the promoted main is verifiably in place
    if (fs.exists(main) && fs.exists(bak) && !fs.delete(bak, true))
      throw new java.io.IOException(s"watermark swap: failed to delete $bak after promotion")
  }
}
