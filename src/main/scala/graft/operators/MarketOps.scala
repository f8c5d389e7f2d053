package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import scala.jdk.CollectionConverters._

/** Market-data operators re-expressing the reference's domain semantics over
  * the `events` fixture (user_id ≈ ticker, value ≈ price, signup events ≈
  * splits): as-of enrichment, EMA/VWAP indicators, the OHLCV resample
  * ladder, split-adjustment cumulative factors, and the incremental
  * watermark-append protocol (SURVEY.md §3-E3).
  */
object MarketOps {

  private[graft] val D18 = DecimalType(18, 2)

  /** Tumbling OHLC bars at any granularity of the reference's ladder
    * (1/5/15/30 min, 1 h, 24 h — old_source/old_source_op.py:18). `vol`
    * stays DECIMAL so further resample levels sum exactly; bars compose:
    * resample(resample(e, 5m), 1h) == resample(e, 1h) (MarketSpec,
    * PropertySpec).
    */
  def resampleBars(events: DataFrame, granularity: String,
                   timeCol: String = "ts", keyCol: String = "user_id",
                   priceCol: String = "value"): DataFrame =
    events.groupBy(col(keyCol), window(col(timeCol), granularity))
      .agg(
        min_by(col(priceCol), col(timeCol)).as("o"),
        max(col(priceCol)).as("h"),
        min(col(priceCol)).as("l"),
        max_by(col(priceCol), col(timeCol)).as("c"),
        count(lit(1)).as("n"),
        sum(col(priceCol).cast(D18)).as("vol_dec"))
      .select(col(keyCol), col("window.start").as("bucket"),
        col("o"), col("h"), col("l"), col("c"), col("n"), col("vol_dec"))

  /** 5-minute bars (the DAG's granularity, airflow-dags/dag_aggregates_etl.py:219). */
  def bars5m(events: DataFrame): DataFrame =
    resampleBars(events, "5 minutes").withColumnRenamed("bucket", "b5")

  /** Re-aggregate finer OHLC bars into coarser buckets — the shared second
    * level of every resample ladder (batch gold, 5m→1h, etc.): open/close
    * follow the sub-bar time, extrema fold, sum columns pass through.
    */
  def refoldBars(bars: DataFrame, granularity: String, keys: Seq[String],
                 timeCol: String, sumCols: Seq[String]): DataFrame = {
    val aggs = Seq(
      min_by(col("o"), col(timeCol)).as("o"),
      max(col("h")).as("h"),
      min(col("l")).as("l"),
      max_by(col("c"), col(timeCol)).as("c")) ++
      sumCols.map(c => sum(col(c)).as(c))
    bars.groupBy((keys.map(col) :+ window(col(timeCol), granularity)): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((keys.map(col) :+ col("window.start").as("bucket") :+
        col("o") :+ col("h") :+ col("l") :+ col("c")) ++ sumCols.map(col): _*)
  }

  /** The mkt_* declared-query suite — moved to
    * [[graft.queries.MarketQueries]] when this file crossed 1,700 lines;
    * forwarded so every caller keeps one entry point.
    */
  def defs: Seq[QueryDef] = graft.queries.MarketQueries.defs

  def gapScan(ticks: DataFrame, maxGapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxGapSeconds > 0, "gap tolerance must be positive")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ticks
      .withColumn("gap_end", lead(col("ts"), 1).over(w))
      .withColumn("gap_seconds",
        col("gap_end").cast("long") - col("ts").cast("long"))
      .filter(col("gap_end").isNotNull &&
        col("gap_seconds") > maxGapSeconds)
      .select(col("user_id"), col("ts").as("gap_start"), col("gap_end"),
        col("gap_seconds"))
      .orderBy(col("user_id"), col("gap_start"), col("gap_end"))
  }

  /** Point-in-time panel — see the mkt_panel_ffill QueryDef. Returns one
    * row per (key, grid day): the forward-filled daily close and whether
    * the cell was directly observed. NULL before a key's first
    * observation (ffill never invents history).
    */
  def panelFfill(ticks: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ticks
      .withColumn("day", date_trunc("day", col("ts")))
      .withColumn("rk", row_number().over(Window
        .partitionBy(col("user_id"), col("day"))
        .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("day"), col("value"))
    val grid = daily.select(col("day")).distinct()
    val users = daily.select(col("user_id")).distinct()
    val cells = users.crossJoin(broadcast(grid))
      .join(daily, Seq("user_id", "day"), "left")
      .withColumn("is_observed", col("value").isNotNull)
    cells
      .withColumn("close", last(col("value"), ignoreNulls = true).over(Window
        .partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("day"), col("close"), col("is_observed"))
      .orderBy(col("user_id"), col("day"))
  }

  /** SMA-crossover backtest over a (user_id, ts, event_id, value) tape —
    * see the mkt_backtest_sma QueryDef for the exactness design (integer
    * cents end to end). `fast`/`slow` are SMA lengths in bars; the
    * crossover compares sums cross-multiplied so no division (and no
    * rounding policy) exists anywhere in the pipeline.
    */
  def backtestSmaCross(events: DataFrame, fast: Int, slow: Int): DataFrame =
    backtestFrame(events, fast, slow)
      .select(col("event_id"), col("user_id"), col("pos"), col("pnl_cents"),
        col("cum_pnl_cents"),
        (col("peak") - col("cum_pnl_cents")).as("drawdown_cents"))
      .orderBy(col("event_id"))

  /** Pairwise Pearson correlation of per-bucket price changes — see the
    * mkt_pairwise_corr QueryDef for the exactness and scale design. One
    * compaction to (key, bucket, change), one bucket-equi self-join, one
    * partial-aggregated groupBy of six integer sums per pair.
    */
  /** Per-ticker daily-change vectors on the shared day grid — the input
    * that routes a FULL-UNIVERSE correlation screen to the ANN operators
    * (the escape hatch mkt_pairwise_corr documents: the watchlist
    * self-join is O(k²·T) by nature, so at universe scale bucket first,
    * verify candidates exactly). Entries are centered per ticker
    * (change − mean change over the ticker's PRESENT days) and absent days
    * hold 0 ("at the mean"), so cosine(a, b) equals Pearson correlation
    * whenever both tickers cover the grid and approximates it under
    * partial coverage. Vectors are NOT length-normalized — the ANN
    * verifier divides by the norms itself. Zero-variance tickers (no
    * usable signal, and a NaN cosine that DuckDB and Spark order
    * differently) are dropped in both engines.
    *
    * Output: (vec_id = ticker id, embedding: array<double>, length = grid
    * days). The grid is bounded by the CALENDAR (a decade of dailies is
    * ~2.5k entries), not row count — the single-partition ranking window
    * over it is the same constant-size exemption as kmeansAssign's k-row
    * init; the vector length rides the embedding column's metadata
    * ("graft.rv.dims") for the ANN caller's plane matrix.
    */
  /** TWO-PHASE global rank over a column with UNIQUE values: range-partition
    * on the key (order-preserving across partition ids), rank locally within
    * each partition, then add each partition's start offset (the count of
    * rows in earlier partitions — a partitions-sized driver list, same
    * driver-edge-scalar convention as returnVectors' dims). Replaces the
    * single-partition `Window.orderBy(key)` pattern: identical 1-based dense
    * ranks, but the sort runs on every core instead of serializing the
    * whole frame through one task. The partitioned input is persisted via
    * GraftCaches (released by Verify/Bench with every other operator-level
    * persist — a localCheckpoint would leak blocks invisible to
    * clearCache) so the offset collect and the final plan share one
    * computation of the (calendar-bounded) upstream frame.
    */
  private[graft] def globalRank(df0: DataFrame, keyCol: String,
                                out: String): DataFrame =
    prefixStats(df0, keyCol, Seq(RankCarry(out)))

  /** TWO-PHASE running max over rows keyed by a UNIQUE ordering column: the
    * same shape as globalRank, but the per-partition carry is the MAX of
    * every earlier partition (exclusive prefix max) instead of a row count.
    * out(row) = max(local running max, prefix max) — identical to
    * `max(val).over(Window.orderBy(key).rowsBetween(unboundedPreceding,
    * currentRow))` without the single-partition exchange. `valCol` must be
    * a BIGINT column with NO null values (the integer-cents convention of
    * every caller) — the type is enforced at plan build, the null freedom
    * inside the same stats pass the carry rides (a null would otherwise
    * poison the partition max and surface as a driver NPE far from the
    * cause).
    */
  private[graft] def runningMax(df0: DataFrame, keyCol: String, valCol: String,
                                out: String): DataFrame =
    prefixStats(df0, keyCol, Seq(MaxCarry(valCol, out)))

  /** A per-partition carry for `prefixStats`: what flows from earlier range
    * partitions into each row's output column.
    */
  private[graft] sealed trait Carry { def out: String }
  /** 1-based global rank by the key (carry = count of earlier rows). */
  private[graft] case class RankCarry(out: String) extends Carry
  /** Running max of a BIGINT column (carry = max over earlier partitions). */
  private[graft] case class MaxCarry(valCol: String, out: String) extends Carry
  /** Running sum of a BIGINT column (carry = sum over earlier partitions). */
  private[graft] case class SumCarry(valCol: String, out: String) extends Carry

  /** TWO-PHASE prefix aggregation over rows keyed by a UNIQUE ordering
    * column — the generalization behind globalRank/runningMax: range-
    * partition on the key (order-preserving across partition ids), compute
    * every requested running aggregate locally per partition, and add each
    * partition's carry-in from the earlier partitions. ALL carries ride ONE
    * stats job (a single partitions-sized aggregate collect: row counts,
    * value maxes/sums, and a null census per value column in one pass) and
    * ONE window pass over a shared (partitionBy _pid, orderBy key) spec —
    * a query needing a rank AND a running sum pays one exchange and one
    * driver action, not one per aggregate. Value columns must be BIGINT
    * (the integer-cents convention) and null-free; both are enforced here —
    * the type at plan build, the nulls inside the same stats pass — so the
    * contract fails fast with a pointed message instead of a task cast
    * error or a driver NPE. The partitioned input is persisted via
    * GraftCaches (released by Verify/Bench with every other operator-level
    * persist) so the stats collect and the final plan share one computation
    * of the (calendar-bounded) upstream frame.
    */
  private[graft] def prefixStats(df0: DataFrame, keyCol: String,
                                 carries: Seq[Carry]): DataFrame = {
    require(carries.nonEmpty, "prefixStats needs at least one carry")
    val valCols = carries.collect {
      case MaxCarry(v, _) => v
      case SumCarry(v, _) => v
    }.distinct
    valCols.foreach { v =>
      require(df0.schema(v).dataType ==
          org.apache.spark.sql.types.LongType,
        s"prefixStats expects a BIGINT $v, got " +
          df0.schema(v).dataType.catalogString)
    }
    val parts = graft.core.GraftCaches.acquire(
      df0.repartitionByRange(col(keyCol))
        .withColumn("_pid", spark_partition_id()),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one aggregate pass per drop of the frame: count for rank offsets,
    // max/sum per value column, and the null census enforcing the contract
    val aggCols: Seq[Column] = count(lit(1)).as("_c") +: valCols.flatMap(v =>
      Seq(max(col(v)).as(s"_max_$v"), sum(col(v)).as(s"_sum_$v"),
        count(when(col(v).isNull, 1)).as(s"_nulls_$v")))
    val stats = parts.groupBy(col("_pid"))
      .agg(aggCols.head, aggCols.tail: _*)
      .collect().map(r => r.getInt(0) -> r).sortBy(_._1)
    valCols.foreach { v =>
      val nulls = stats.map(_._2.getAs[Long](s"_nulls_$v")).sum
      require(nulls == 0,
        s"prefixStats: $v carries $nulls null value(s) — running max/sum " +
          "over nulls has no defined carry; fill or filter them upstream")
    }
    // exclusive prefix per present partition id (range partitions can be
    // empty on tiny frames; offsets accumulate over the PRESENT ones).
    // Prefix maxes are nullable (the first partition has no predecessor) —
    // NULL rides through greatest(), which ignores null operands, instead
    // of a Long.MinValue sentinel colliding with a legitimate value.
    case class Pref(off: Long, maxes: Map[String, Option[Long]],
                    sums: Map[String, Long])
    val zero = Pref(0L, valCols.map(_ -> Option.empty[Long]).toMap,
      valCols.map(_ -> 0L).toMap)
    val prefixes = stats.scanLeft(zero) { case (acc, (_, r)) =>
      Pref(acc.off + r.getAs[Long]("_c"),
        valCols.map { v =>
          val m = r.getAs[Long](s"_max_$v")
          v -> Some(acc.maxes(v).fold(m)(math.max(_, m)))
        }.toMap,
        valCols.map(v => v -> (acc.sums(v) + r.getAs[Long](s"_sum_$v"))).toMap)
    }.init
    val prefSchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("_pid",
        org.apache.spark.sql.types.IntegerType, nullable = false) +:
      org.apache.spark.sql.types.StructField("_off",
        org.apache.spark.sql.types.LongType, nullable = false) +:
      valCols.flatMap(v => Seq(
        org.apache.spark.sql.types.StructField(s"_pmax_$v",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField(s"_psum_$v",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val prefDf = df0.sparkSession.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        stats.map(_._1).zip(prefixes).map { case (pid, p) =>
          org.apache.spark.sql.Row.fromSeq(
            pid +: p.off +: valCols.flatMap(v =>
              Seq(p.maxes(v).map(Long.box).orNull, Long.box(p.sums(v)))))
        }.toSeq.asJava),
      prefSchema)
    val w = Window.partitionBy(col("_pid")).orderBy(col(keyCol))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols = carries.map {
      // int like row_number's output, so downstream arithmetic is unchanged
      case RankCarry(out) =>
        (col("_off") + row_number().over(w)).cast("int").as(out)
      case MaxCarry(v, out) =>
        greatest(max(col(v)).over(wRun), col(s"_pmax_$v")).as(out)
      case SumCarry(v, out) =>
        (col(s"_psum_$v") + sum(col(v)).over(wRun)).as(out)
    }
    parts
      .join(broadcast(prefDf), "_pid")
      .select(df0.columns.toIndexedSeq.map(col) ++ outCols: _*)
  }

  def returnVectors(events: DataFrame): DataFrame = {
    val wLast = Window.partitionBy(col("user_id"), col("b"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val w = Window.partitionBy(col("user_id")).orderBy(col("b"))
    val bars = events
      .withColumn("b", date_trunc("day", col("ts")))
      .withColumn("p", floor(col("value") * 100).cast("long"))
      .withColumn("rk", row_number().over(wLast))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("b"), col("p"))
    val rets = bars
      .withColumn("r", col("p") - lag(col("p"), 1).over(w))
      .filter(col("r").isNotNull)
      .select(col("user_id"), col("b"), col("r"))
    val grid = globalRank(rets.select(col("b")).distinct(), "b", "i")
    // calendar-bounded driver scalar, same pattern as ngramCandidates' cap
    val dims = grid.count().toInt
    val md = new org.apache.spark.sql.types.MetadataBuilder()
      .putLong("graft.rv.dims", dims.toLong).build()
    rets.join(broadcast(grid), Seq("b"))
      .groupBy(col("user_id"))
      .agg(map_from_entries(collect_list(struct(col("i"), col("r")))).as("m"),
        (sum(col("r")).cast("double") / count(lit(1))).as("mu"))
      .select(col("user_id").as("vec_id"),
        expr(s"transform(sequence(1, $dims), i -> " +
          "coalesce(cast(element_at(m, i) as double) - mu, 0.0d))")
          .as("embedding", md))
      .filter(expr("aggregate(embedding, 0.0d, (acc, x) -> acc + x * x) > 0.0d"))
  }

  /** Daily integer-cents price changes per key — (user_id, b, r): last
    * price per day, BIGINT difference vs the previous present day. The
    * shared head of the correlation family (static screen, rolling
    * window, return vectors).
    */
  private def dailyChanges(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("b"))
    val wLast = Window.partitionBy(col("user_id"), col("b"))
      .orderBy(col("ts").desc, col("event_id").desc)
    events
      .withColumn("b", date_trunc("day", col("ts")))
      .withColumn("p", floor(col("value") * 100).cast("long"))
      .withColumn("rk", row_number().over(wLast))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("b"), col("p"))
      .withColumn("r", col("p") - lag(col("p"), 1).over(w))
      .filter(col("r").isNotNull)
      .select(col("user_id"), col("b"), col("r"))
  }

  /** Co-observed change pairs — the (user_a, user_b, b, ra, rb) frame both
    * correlation screens aggregate.
    */
  private def changePairs(rets: DataFrame): DataFrame =
    rets.as("x").join(rets.as("y"),
        col("x.b") === col("y.b") && col("x.user_id") < col("y.user_id"))
      .select(col("x.user_id").as("user_a"), col("y.user_id").as("user_b"),
        col("x.b").as("b"), col("x.r").as("ra"), col("y.r").as("rb"))

  /** The shared Pearson tail: corr from the six exact integer sums. */
  private def pearson(df: DataFrame): Column =
    round((col("n") * col("sab") - col("sa") * col("sb")).cast("double") /
      sqrt((col("n") * col("saa") - col("sa") * col("sa")).cast("double") *
           (col("n") * col("sbb") - col("sb") * col("sb")).cast("double")), 6)

  def pairwiseCorrelation(events: DataFrame, minOverlap: Int): DataFrame = {
    val j = changePairs(dailyChanges(events))
    val s = j.groupBy(col("user_a"), col("user_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("ra")).as("sa"), sum(col("rb")).as("sb"),
        sum(col("ra") * col("ra")).as("saa"),
        sum(col("rb") * col("rb")).as("sbb"),
        sum(col("ra") * col("rb")).as("sab"))
    val va = s("n") * s("saa") - s("sa") * s("sa")
    val vb = s("n") * s("sbb") - s("sb") * s("sb")
    s.filter(s("n") >= minOverlap && va > 0 && vb > 0)
      .withColumn("corr", pearson(s))
      .select(col("user_a"), col("user_b"), col("n"), col("corr"))
      .orderBy(col("user_a"), col("user_b"))
  }

  /** ROLLING pairwise correlation — the time-varying risk monitor: Pearson
    * over the trailing `window` co-observations per pair, one row per
    * (pair, day) once the window is full. The six sums are BIGINT window
    * aggregates over the same co-observed change frame as the static
    * screen (identical exactness argument: no float until the final
    * expression), ordered by day — ROWS framing over co-observations, so
    * a pair that skips a day rolls over its last `window` SHARED days.
    * Scale: one shuffle by pair, single sorted window pass per pair —
    * watchlist-bounded like the static screen; full-universe monitoring
    * routes to the ANN screen per day.
    */
  def rollingCorrelation(events: DataFrame, window: Int): DataFrame = {
    val win = Window.partitionBy(col("user_a"), col("user_b"))
      .orderBy(col("b")).rowsBetween(-(window - 1), Window.currentRow)
    val s = changePairs(dailyChanges(events))
      .withColumn("n", count(lit(1)).over(win))
      .withColumn("sa", sum(col("ra")).over(win))
      .withColumn("sb", sum(col("rb")).over(win))
      .withColumn("saa", sum(col("ra") * col("ra")).over(win))
      .withColumn("sbb", sum(col("rb") * col("rb")).over(win))
      .withColumn("sab", sum(col("ra") * col("rb")).over(win))
    s.filter(col("n") === window &&
        col("n") * col("saa") - col("sa") * col("sa") > 0 &&
        col("n") * col("sbb") - col("sb") * col("sb") > 0)
      .withColumn("corr", pearson(s))
      .select(col("user_a"), col("user_b"), col("b").as("day"), col("corr"))
      .orderBy(col("user_a"), col("user_b"), col("day"))
  }

  /** Per-key backtest report card — total PnL, worst drawdown, exposure
    * (bars long), win/loss bar counts, entry count. Integer-exact like the
    * per-bar output; rates are left to the consumer so no division enters
    * the contract.
    */
  def backtestSummary(events: DataFrame, fast: Int, slow: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    backtestFrame(events, fast, slow)
      .withColumn("prev_pos", coalesce(lag(col("pos"), 1).over(w), lit(0L)))
      .groupBy(col("user_id"))
      .agg(
        sum(col("pnl_cents")).as("total_pnl_cents"),
        max(col("peak") - col("cum_pnl_cents")).as("max_drawdown_cents"),
        sum(col("pos")).as("bars_long"),
        count(when(col("pos") === 1L && col("pnl_cents") > 0L, 1)).as("win_bars"),
        count(when(col("pos") === 1L && col("pnl_cents") < 0L, 1)).as("loss_bars"),
        count(when(col("pos") === 1L && col("prev_pos") === 0L, 1)).as("n_entries"))
      .orderBy(col("user_id"))
  }

  /** Portfolio-level equity and drawdown: per-key equity marked to the
    * shared day grid (last bar per day, forward-filled, 0 before a key's
    * first bar), summed across keys, with the running-peak drawdown of the
    * aggregate. See the mkt_backtest_portfolio QueryDef for the exactness
    * and scale design.
    */
  def backtestPortfolio(events: DataFrame, fast: Int, slow: Int): DataFrame =
    // the presentation sort is for the standalone query surface; riskStats
    // immediately re-range-partitions, so it consumes the unordered body
    backtestPortfolioUnordered(events, fast, slow).orderBy(col("day"))

  private def backtestPortfolioUnordered(events: DataFrame, fast: Int,
                                         slow: Int): DataFrame = {
    val d = backtestFrame(events, fast, slow)
      .withColumn("day", date_trunc("day", col("ts")))
    val wLast = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("rn").desc)
    val lastPerDay = d
      .withColumn("rk", row_number().over(wLast))
      .filter(col("rk") === 1)
      .select(col("user_id"), col("day"), col("cum_pnl_cents"))
    val grid = d.select(col("day")).distinct()
    val users = d.select(col("user_id")).distinct()
    val cells = users.crossJoin(broadcast(grid))
      .join(lastPerDay, Seq("user_id", "day"), "left")
    val wFf = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ff = cells.withColumn("eqv",
      coalesce(last(col("cum_pnl_cents"), ignoreNulls = true).over(wFf),
        lit(0L)))
    val port = ff.groupBy(col("day"))
      .agg(sum(col("eqv")).as("equity_cents"))
    // running peak via the two-phase prefix max — the day grid is
    // calendar-bounded, but there is no reason to serialize even that
    // through a single-partition window
    runningMax(port, "day", "equity_cents", "_peak")
      .withColumn("drawdown_cents", col("_peak") - col("equity_cents"))
      .drop("_peak")
  }

  /** One-row risk report over the portfolio equity curve — see the
    * mkt_risk_stats QueryDef for the exactness design (BIGINT cents end
    * to end; the underwater-streak islands are derived from two
    * row_numbers over the unique day key, so both engines walk identical
    * integers). All windows are calendar-bounded (the portfolio curve's
    * day grid); the two single-row aggregates cross-join as scalars.
    */
  def riskStats(events: DataFrame, fast: Int, slow: Int): DataFrame = {
    // ONE two-phase pass carries both prefix aggregates: the global day
    // rank AND the running count of underwater days — the rank of an
    // underwater day among underwater days (the old second globalRank over
    // the filtered subset) IS that running sum evaluated at an uw row, so
    // the streak-island key rn - cuw needs no second exchange, no second
    // stats job, and no second cached frame
    val m = prefixStats(
      backtestPortfolioUnordered(events, fast, slow)
        .withColumn("uw", when(col("drawdown_cents") > 0L, 1L).otherwise(0L)),
      "day", Seq(RankCarry("rn"), SumCarry("uw", "cuw")))
    val longest = m.filter(col("uw") === 1L)
      .withColumn("grp", col("rn") - col("cuw"))
      .groupBy(col("grp")).agg(count(lit(1)).as("len"))
      .agg(coalesce(max(col("len")), lit(0L)).as("longest_underwater_days"))
    m.agg(
        count(lit(1)).as("n_days"),
        max_by(col("equity_cents"), col("day")).as("final_equity_cents"),
        max(col("equity_cents")).as("peak_equity_cents"),
        max(col("drawdown_cents")).as("max_drawdown_cents"),
        sum(col("uw")).as("n_underwater_days"))
      .crossJoin(longest)
  }

  /** The full backtest frame (see mkt_backtest_sma for the exactness
    * design): per event — integerized price, position, per-bar PnL,
    * cumulative equity, running peak. Shared by the per-bar and summary
    * surfaces; still carries ts/event_id for downstream windows.
    */
  private def backtestFrame(events: DataFrame, fast: Int, slow: Int): DataFrame = {
    require(fast < slow, s"fast SMA ($fast) must be shorter than slow ($slow)")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val t = events
      .withColumn("p", floor(col("value") * 100).cast("long"))
      .withColumn("rn", row_number().over(w))
      .withColumn("sf", sum(col("p")).over(w.rowsBetween(-(fast - 1), Window.currentRow)))
      .withColumn("ss", sum(col("p")).over(w.rowsBetween(-(slow - 1), Window.currentRow)))
      .withColumn("signal",
        when(col("rn") >= slow && col("sf") * slow > col("ss") * fast, 1L)
          .otherwise(0L))
      .withColumn("pos", coalesce(lag(col("signal"), 1).over(w), lit(0L)))
      .withColumn("dp", coalesce(col("p") - lag(col("p"), 1).over(w), lit(0L)))
      .withColumn("pnl_cents", col("pos") * col("dp"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.withColumn("cum_pnl_cents", sum(col("pnl_cents")).over(wCum))
      .withColumn("peak", max(col("cum_pnl_cents")).over(wCum))
  }

  /** Wilder RSI per key: recursive avg gain/loss, each seeded by the first
    * price change then folded as (acc·(n-1) + x)/n — the same per-key
    * ordered-state shape as emaExact (one shuffle, streaming iteration).
    */
  def rsiWilder(s: SparkSession, events: DataFrame, n: Int): DataFrame = {
    import s.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"ts", $"event_id") { case (_, rows) =>
        var prev = Double.NaN
        var g = Double.NaN
        var l = Double.NaN
        rows.map { case (uid, _, eid, x) =>
          val rsi: Option[Double] =
            if (prev.isNaN) None
            else {
              val change = x - prev
              val gain = if (change > 0) change else 0.0
              val loss = if (change < 0) -change else 0.0
              if (g.isNaN) { g = gain; l = loss }
              else {
                g = (g * (n - 1) + gain) / n
                l = (l * (n - 1) + loss) / n
              }
              Some(if (l == 0) 100.0 else 100.0 - 100.0 / (1.0 + g / l))
            }
          prev = x
          (eid, uid, rsi)
        }
      }
      .toDF("event_id", "user_id", "rsi_wilder")
      .orderBy(col("event_id"))
  }

  /** True recursive EMA per key: ema_0 = x_0; ema_t = α·x_t + (1-α)·ema_{t-1}.
    * flatMapSortedGroups gives each group's rows in (ts, event_id) order with
    * per-key partitioning — the scalable home for any sequential indicator
    * (one shuffle, streaming iteration, no per-row window state).
    */
  /** Wilder-smoothed average true range over |close-to-close change| — the
    * same per-key sorted-group fold as rsiWilder (one shuffle per key,
    * sequential state inside each group: the only correct shape for a
    * recursive indicator). Seeded by the first TR, then
    * atr = (atr*(n-1) + tr)/n, matching DuckDB list_reduce bit-for-bit.
    */
  def atrWilder(s: SparkSession, events: DataFrame, n: Int): DataFrame = {
    import s.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"ts", $"event_id") { case (_, rows) =>
        var prev = Double.NaN
        var atr = Double.NaN
        rows.map { case (uid, _, eid, x) =>
          val out: Option[Double] =
            if (prev.isNaN) None
            else {
              val tr = math.abs(x - prev)
              atr = if (atr.isNaN) tr else (atr * (n - 1) + tr) / n
              Some(atr)
            }
          prev = x
          (eid, uid, out)
        }
      }
      .toDF("event_id", "user_id", "atr_wilder")
      .orderBy(col("event_id"))
  }

  /** Per-ticker OLS trend over daily closes — see the mkt_trend
    * QueryDef. Note the intercept reuses the slope's exact double
    * expression verbatim so both engines run the identical IEEE ops.
    */
  def trendLine(events: DataFrame, minDays: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wLast = Window.partitionBy(col("user_id"), col("b"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val daily = events
      .withColumn("b", date_trunc("day", col("ts")))
      .withColumn("p", floor(col("value") * 100).cast("long"))
      .withColumn("rk", row_number().over(wLast))
      .filter(col("rk") === 1)
      .withColumn("x", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("b"))).cast("long"))
    val s = daily.groupBy(col("user_id")).agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("p")).as("sy"),
      sum(col("x") * col("p")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    s.filter(col("n") >= minDays)
      .select(col("user_id"), col("n"),
        round(slope, 6).as("slope_cents_per_day"),
        round((col("sy").cast("double") - slope * col("sx").cast("double")) /
          col("n").cast("double"), 6).as("intercept_cents"))
      .orderBy(col("user_id"))
  }

  /** Per-ticker market beta — see the mkt_beta QueryDef. The market
    * frame is calendar-bounded (one row per day) so it broadcasts; the
    * moment sums run with map-side partials.
    */
  def marketBeta(events: DataFrame, minOverlap: Int): DataFrame = {
    val rets = dailyChanges(events)
    val market = rets.groupBy(col("b")).agg(sum(col("r")).as("m"))
    rets.join(broadcast(market), Seq("b"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("r")).as("sr"),
        sum(col("m")).as("sm"), sum(col("r") * col("m")).as("srm"),
        sum(col("m") * col("m")).as("smm"))
      .filter(col("n") >= minOverlap &&
        (col("n") * col("smm") - col("sm") * col("sm")) > 0)
      .select(col("user_id"), col("n"),
        round((col("n") * col("srm") - col("sr") * col("sm")).cast("double") /
          (col("n") * col("smm") - col("sm") * col("sm")).cast("double"), 6)
          .as("beta"))
      .orderBy(col("user_id"))
  }

  /** Time-weighted average price per key — see the mkt_twap QueryDef. */
  def twap(ticks: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    ticks
      .withColumn("p", floor(col("value") * 100).cast("long"))
      .withColumn("dt",
        lead(col("ts"), 1).over(w).cast("long") - col("ts").cast("long"))
      .filter(col("dt").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        (sum(col("p") * col("dt")).cast("double") /
          sum(col("dt")).cast("double") / 100).as("twap"),
        sum(col("dt")).as("total_seconds"))
      .orderBy(col("user_id"))
  }

  /** CUSUM changepoint trace — see the mkt_cusum QueryDef. Emits the
    * post-restart (s_pos, s_neg) state and alarm code per tick. The
    * production shape: the O(n) per-key sorted fold (flatMapSortedGroups),
    * two longs of state, one shuffle — the oracle's O(n²) prefix refold
    * exists only to make the recursion SQL-expressible.
    */
  def cusum(s: SparkSession, events: DataFrame, slackCents: Long,
            thresholdCents: Long): DataFrame = {
    import s.implicits._
    require(slackCents >= 0 && thresholdCents > 0, "CUSUM needs k >= 0 < h")
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100).cast("long").as("p_cents"))
      .as[(Long, java.sql.Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"ts", $"event_id") { case (_, rows) =>
        var prev = Long.MinValue
        var sp = 0L
        var sn = 0L
        rows.map { case (uid, _, eid, p) =>
          if (prev == Long.MinValue) { prev = p; (eid, uid, 0L, 0L, 0) }
          else {
            val d = p - prev
            prev = p
            val pp = math.max(0L, sp + d - slackCents)
            val nn = math.max(0L, sn - d - slackCents)
            val alarm =
              if (pp > thresholdCents) 1 else if (nn > thresholdCents) 2 else 0
            if (alarm != 0) { sp = 0L; sn = 0L } else { sp = pp; sn = nn }
            (eid, uid, sp, sn, alarm)
          }
        }
      }
      .toDF("event_id", "user_id", "s_pos", "s_neg", "alarm")
      .orderBy(col("event_id"))
  }

  def emaExact(s: SparkSession, events: DataFrame, alpha: Double): DataFrame = {
    import s.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)]
      .groupByKey(_._1)
      .flatMapSortedGroups($"ts", $"event_id") { case (_, rows) =>
        var ema = Double.NaN
        rows.map { case (uid, _, eid, x) =>
          ema = if (ema.isNaN) x else alpha * x + (1 - alpha) * ema
          (eid, uid, ema)
        }
      }
      .toDF("event_id", "user_id", "ema")
      .orderBy(col("event_id"))
  }
}
