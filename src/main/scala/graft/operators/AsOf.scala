package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (O-J4 / SURVEY.md §2.3): for each left row, the most
  * recent right row with right.time <= left.time, per key.
  *
  * Implementation is the scalable union+window technique, NOT a non-equi
  * join: tag both sides, union, sort per key by (time, side) with right rows
  * first at equal timestamps, and carry the last non-null right payload
  * forward with last(ignoreNulls) over an unbounded-preceding running frame.
  * One shuffle on the key, no broadcast-nested-loop — the plan that survives
  * a 100× scale-up (a naive l.ts >= r.ts range join degenerates to BNLJ).
  *
  * Reference semantics source: the adjusted/raw bar dual + daily splits
  * refresh (polygon-etl-container/src/aggregates_stocks_etl.py:33-41,
  * polygon-etl-container/src/main.py:31-32) — split/dividend adjustment is
  * an as-of lookup of the factor effective at bar time.
  */
object AsOf {

  /** @param left      fact rows
    * @param right     lookup rows (small-or-large both fine: same shuffle)
    * @param keys      equi-key column names present on both sides
    * @param leftTime  event-time column on left
    * @param rightTime event-time column on right
    * @param rightVals right payload columns to carry (renamed as-is onto left)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1))
      .select((keys.map(col) :+ col("_t") :+ col("_side")) ++
        leftCols.filterNot(keys.contains).map(col) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn("_t", col(rightTime))
      .withColumn("_side", lit(0))
      .select((keys.map(col) :+ col("_t") :+ col("_side")) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1).drop("_t", "_side")
  }
}
