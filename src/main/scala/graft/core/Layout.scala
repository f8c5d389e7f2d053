package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Data-SKIPPING layout: multi-column scan locality for predicates on
  * non-partition columns — the third leg of the warehouse tripod next to
  * partition pruning (time) and bucketing (join keys).
  *
  * Partition pruning only helps the partition column, and a single-column
  * sort gives min/max locality on that one column while every other
  * column's range spans the whole table in every file. Interleaving the
  * quantized bits of SEVERAL columns into one sort key (a Z-order /
  * Morton curve — the layout Delta Lake's OPTIMIZE ZORDER BY popularized)
  * makes every file a compact box in the multi-column space, so a
  * per-file min/max index prunes on ANY of the interleaved columns.
  *
  * The reference has no analogue (its tables are small enough to scan);
  * at 100 TB a point-ish query that cannot prune reads the full table.
  *
  * Pieces:
  * - `interleave` — the Morton code as a pure builtin shift/mask
  *   expression chain (codegen'd, no UDF);
  * - `writeZOrdered` — stats-normalized quantization (in-plan broadcast
  *   of the min/max frame, no driver collect), range-partitioned and
  *   sorted by the z-value so both files AND row groups are boxes;
  * - `writeFileStatsIndex` — the per-file min/max table, persisted
  *   (production appends it at write time; deriving it here costs one
  *   columnar scan of only the indexed columns);
  * - `prunedRead` — intersect a box predicate with the index, read ONLY
  *   the surviving files (a driver-side file-LIST decision — metadata,
  *   bounded by file count — never row data), re-apply the exact
  *   predicate so the result equals the full-scan filter row-for-row.
  */
object Layout {

  /** Morton code: interleave the low `bits` bits of the given quantized
    * non-negative long columns round-robin — result bit (j·n + i) is bit j
    * of column i. A static chain of shift/mask/or builtins: whole-stage
    * codegen keeps it in the generated loop, nothing interpreted.
    */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits >= 1 && bits * cols.size <= 63,
      s"interleave needs 1..63 total bits, got ${bits * cols.size}")
    val n = cols.size
    val terms = for {
      j <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Quantize `c` to [0, 2^bits) given its min/max columns: rank-free
    * linear scaling — cheap, and monotone per column, which is all the
    * curve needs. A constant column (max == min) maps to 0.
    */
  private def quantize(c: Column, cmin: Column, cmax: Column,
                       bits: Int): Column = {
    val span = cmax.cast("double") - cmin.cast("double")
    val scaled = when(span <= 0d, lit(0L)).otherwise(
      least(
        floor((c.cast("double") - cmin.cast("double")) / span *
          ((1L << bits) - 1) + 0.5).cast("long"),
        lit((1L << bits) - 1)))
    greatest(scaled, lit(0L))
  }

  /** Write `df` Z-ordered on `zCols` (numeric/timestamp-castable) into
    * `path` as `numFiles` range-partitioned, z-sorted parquet files. The
    * min/max normalization frame rides the plan as a broadcast (one tiny
    * aggregate — no driver collect), so the write is stats pass + one
    * range shuffle. Layout only: content and schema are untouched.
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    numFiles: Int, bits: Int = 16): Unit = {
    require(zCols.nonEmpty && numFiles >= 1, "z-order spec must be non-trivial")
    val aggs = zCols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"${c}__min"),
      max(col(c).cast("double")).as(s"${c}__max")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val q = zCols.map(c =>
      quantize(col(c), col(s"${c}__min"), col(s"${c}__max"), bits))
    df.crossJoin(broadcast(stats))
      .withColumn("__z", interleave(q, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop((zCols.map(c => s"${c}__min") ++ zCols.map(c => s"${c}__max") :+
        "__z"): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Persist the per-file min/max index over `cols` at `indexPath`: one
    * row per data file. Costs one scan of ONLY the indexed columns (column
    * pruning reaches the parquet reader); production writes it alongside
    * each table write / compaction instead of re-deriving.
    */
  def writeFileStatsIndex(spark: SparkSession, tablePath: String,
                          indexPath: String, cols: Seq[String]): Unit = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max")))
    spark.read.parquet(tablePath)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .write.mode(SaveMode.Overwrite).parquet(indexPath)
  }

  /** INCREMENTAL maintenance of the per-file min/max index: compute stats
    * only for data files not yet indexed, drop rows whose file vanished
    * (compaction / governance rewrites replace the file set), and carry
    * every surviving row forward untouched. The full rebuild above scans
    * the whole table per maintenance run — at warehouse scale that
    * re-reads 100 TB to index a [watermark, now) append slice; this
    * update scans ONLY the new files, so index upkeep costs O(increment),
    * and a full rewrite (every file replaced) degenerates to exactly the
    * rebuild. The file-set diff is a driver-side metadata decision (one
    * recursive listing + one index read, one row per file — the same
    * class as the planner's own partition listing); file identity is the
    * URI path component, so the Hadoop listing ("file:/…") and the
    * scan's `_metadata.file_path` ("file:///…") rendering of one file
    * agree. An index built over a DIFFERENT column set is rebuilt from
    * scratch (schema drift has no incremental meaning). The rewrite goes
    * through the crash-recoverable swap (the new index derives from the
    * live one, so an in-place overwrite would read its own output).
    */
  def updateFileStatsIndex(spark: SparkSession, tablePath: String,
                           indexPath: String, cols: Seq[String]): Unit = {
    val idxPath = new org.apache.hadoop.fs.Path(indexPath)
    val fs = idxPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Sinks.recoverSwap(spark, indexPath)
    val expectedCols = ("file" +: cols.flatMap(c =>
      Seq(s"${c}__min", s"${c}__max"))).toSet
    if (!fs.exists(idxPath) ||
        spark.read.parquet(indexPath).columns.toSet != expectedCols) {
      writeFileStatsIndex(spark, tablePath, indexPath, cols)
      return
    }
    def norm(s: String) = new org.apache.hadoop.fs.Path(s).toUri.getPath
    // current data file set, as the filesystem lists it (same .parquet
    // rule as Sinks.dataFileCount — readers gate index freshness on it)
    val listed = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(tablePath), true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val f = it.next().getPath.toString
        if (f.endsWith(".parquet")) b += f
      }
      b.result()
    }
    val currentKeys = listed.map(norm).toSet
    val old = spark.read.parquet(indexPath)
    val oldFiles = old.select(col("file")).collect().map(_.getString(0))
    val oldKeys = oldFiles.map(norm).toSet
    val keepOrig = oldFiles.filter(f => currentKeys.contains(norm(f)))
    val newPaths = listed.filterNot(f => oldKeys.contains(norm(f)))
    if (newPaths.isEmpty && keepOrig.length == oldFiles.length) return // in sync
    import spark.implicits._
    val kept = old.join(keepOrig.toSeq.toDF("file"), Seq("file"), "left_semi")
    val refreshed =
      if (newPaths.isEmpty) kept
      else {
        val aggs = cols.flatMap(c =>
          Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max")))
        kept.unionByName(
          spark.read.option("basePath", tablePath).parquet(newPaths: _*)
            .groupBy(col("_metadata.file_path").as("file"))
            .agg(aggs.head, aggs.tail: _*))
      }
    Sinks.swapInto(spark, indexPath, refreshed, Nil, targetFiles = Some(1))
  }

  /** Read `tablePath` pruned by the file-stats index: keep files whose
    * [min, max] box INTERSECTS every requested [lo, hi] range, read only
    * those, and re-apply the exact range predicate — so the result equals
    * the full-scan filter row-for-row while the scan touches only the
    * surviving files. The index collect is a driver-side FILE-LIST
    * decision (metadata, one row per file — the same class as the
    * planner's own partition listing), never row data.
    */
  def prunedRead(spark: SparkSession, tablePath: String, indexPath: String,
                 ranges: Map[String, (Any, Any)]): DataFrame = {
    require(ranges.nonEmpty, "prunedRead needs at least one column range")
    val overlap = ranges.map { case (c, (lo, hi)) =>
      !(col(s"${c}__max") < lit(lo) || col(s"${c}__min") > lit(hi))
    }.reduce(_ && _)
    val files = spark.read.parquet(indexPath)
      .filter(overlap).select(col("file"))
      .collect().map(_.getString(0))
    val exact = ranges.map { case (c, (lo, hi)) =>
      col(c).between(lit(lo), lit(hi))
    }.reduce(_ && _)
    val base = spark.read.parquet(tablePath)
    if (files.isEmpty) base.filter(lit(false))
    else spark.read.option("basePath", tablePath).parquet(files.toSeq: _*)
      .filter(exact)
  }

  /** Fraction-free pruning report for specs/observability: (files kept,
    * files total) for a box against the index.
    */
  def pruneStats(spark: SparkSession, indexPath: String,
                 ranges: Map[String, (Any, Any)]): (Long, Long) = {
    val idx = spark.read.parquet(indexPath)
    val overlap = ranges.map { case (c, (lo, hi)) =>
      !(col(s"${c}__max") < lit(lo) || col(s"${c}__min") > lit(hi))
    }.reduce(_ && _)
    (idx.filter(overlap).count(), idx.count())
  }
}
