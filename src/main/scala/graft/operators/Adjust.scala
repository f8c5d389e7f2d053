package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    val b = bars
      .withColumn("_d", to_date(col("datetime")))
      .withColumn("_side", lit(0))
      .withColumn("_factor", lit(null).cast("double"))
    val s = splits
      .select(col("ticker"), col("execution_date").as("_d"),
        (col("split_from") / col("split_to")).as("_factor"))
      .withColumn("_side", lit(1))
    val unioned = b.select(
      (Seq(col("ticker"), col("_d"), col("_side"), col("_factor")) ++
        barCols.filterNot(_ == "ticker").map(col)): _*)
      .unionByName(s, allowMissingColumns = true)
    // descending by date; at equal dates the bar sorts first so a same-day
    // split does NOT adjust that day's bar (strictly-later rule)
    val w = Window.partitionBy(col("ticker"))
      .orderBy(col("_d").desc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val factors = unioned.withColumn("adj_factor",
      coalesce(product(col("_factor")).over(w), lit(1.0)))
    factors.filter(col("_side") === 0)
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
}
