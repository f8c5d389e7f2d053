package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Split/dividend adjustment of raw bars (O-J4/O-W2, SURVEY.md §2.3/§2.5):
  * the computation the reference outsources to Polygon by fetching both
  * adjusted=true and adjusted=false series (aggregates_stocks_etl.py:33-41)
  * while refreshing splits/dividends daily (main.py:31-32).
  *
  * Semantics: a bar is adjusted by the product of (split_from / split_to)
  * over all splits whose execution_date is STRICTLY AFTER the bar's date —
  * prices before a 2:1 split are halved. Implemented as a reverse running
  * product per ticker over the union of bars and splits (one shuffle per
  * key, no non-equi join): exact sequential multiplication, not
  * exp(sum(log)) — float-assoc noise and log(0) edge cases stay out.
  *
  * Scale: splits are tiny (<20 MB dims, README.md:20) but the union trick
  * costs the same one shuffle the bar table needs for any per-ticker window
  * anyway; with bars bucketed by ticker it's shuffle-free.
  */
object Adjust {

  /** @param bars   silver bars with (ticker, datetime, o, h, l, c, v, vw)
    * @param splits (ticker, execution_date, split_from, split_to)
    * @return bars plus adj_factor and adjusted o/h/l/c (volume scaled up by
    *         the inverse, as exchanges report)
    */
  def adjustBars(bars: DataFrame, splits: DataFrame): DataFrame = {
    val barCols = bars.columns.toSeq
    val splitFactors = splits.select(col("ticker"),
      col("execution_date"),
      (col("split_from") / col("split_to")).as("split_factor"))
    applyFactors(bars, splitFactors, "execution_date", "split_factor",
        "adj_factor")
      .select(barCols.map(col) ++ Seq(
        col("adj_factor"),
        (col("o") * col("adj_factor")).as("adj_o"),
        (col("h") * col("adj_factor")).as("adj_h"),
        (col("l") * col("adj_factor")).as("adj_l"),
        (col("c") * col("adj_factor")).as("adj_c"),
        (col("v") / col("adj_factor")).as("adj_v")) ++
        // vw is a price: same scale as o/h/l/c (if present)
        (if (barCols.contains("vw"))
           Seq((col("vw") * col("adj_factor")).as("adj_vw"))
         else Nil): _*)
  }

  /** Cash-dividend adjustment factors: for each dividend, the standard
    * CRSP-style multiplier 1 - cash / prev_close, where prev_close is the
    * last close at-or-before the day preceding the ex-date (an as-of join
    * of dividends onto the bar series). Bars before the ex-date are scaled
    * down by the compound product of later dividend factors — composable
    * with split factors by multiplying the two adjustment columns.
    *
    * Returns (ticker, ex_date, div_factor); feed to `applyFactors`.
    */
  def dividendFactors(bars: DataFrame, dividends: DataFrame): DataFrame = {
    val closes = bars.select(col("ticker"),
      to_date(col("datetime")).cast(DateType).as("close_date"),
      col("datetime"), col("c"))
    val divs = dividends.select(col("ticker"),
      col("ex_dividend_date").as("ex_date"), col("cash_amount"))
      // as-of anchor: the last bar strictly before the ex-date
      .withColumn("anchor_ts",
        to_timestamp(col("ex_date")) - expr("INTERVAL 1 MICROSECOND"))
    val withClose = AsOf.asofJoin(
      divs, closes.withColumnRenamed("datetime", "bar_ts"),
      keys = Seq("ticker"), leftTime = "anchor_ts", rightTime = "bar_ts",
      rightVals = Seq("c"))
    withClose
      .withColumn("div_factor",
        when(col("c").isNull || col("c") <= col("cash_amount"), lit(1.0))
          .otherwise(lit(1.0) - col("cash_amount") / col("c")))
      .select(col("ticker"), col("ex_date"), col("div_factor"))
  }

  /** Apply a (ticker, effective_date, factor) table to bars with the same
    * strictly-later compounding rule as adjustBars.
    */
  def applyFactors(bars: DataFrame, factors: DataFrame,
                   dateCol: String, factorCol: String,
                   outCol: String): DataFrame = {
    val barCols = bars.columns.toSeq
    val b = bars
      .withColumn("_d", to_date(col("datetime")))
      .withColumn("_side", lit(0))
      .withColumn("_factor", lit(null).cast("double"))
    val f = factors
      .select(col("ticker"), col(dateCol).as("_d"), col(factorCol).as("_factor"))
      .withColumn("_side", lit(1))
    val unioned = b.select(
      (Seq(col("ticker"), col("_d"), col("_side"), col("_factor")) ++
        barCols.filterNot(_ == "ticker").map(col)): _*)
      .unionByName(f, allowMissingColumns = true)
    val w = Window.partitionBy(col("ticker"))
      .orderBy(col("_d").desc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    unioned
      .withColumn(outCol, coalesce(product(col("_factor")).over(w), lit(1.0)))
      .filter(col("_side") === 0)
      .select(barCols.map(col) :+ col(outCol): _*)
  }
}
