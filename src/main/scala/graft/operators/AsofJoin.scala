package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: enrich each left row with the most recent right row at or
  * before its timestamp, per key — the canonical stream-to-dimension-history
  * operator (rates, device state, config versions).
  *
  * Spark has no native ASOF JOIN; the scalable composition (SURVEY.md §2
  * custom-operator preference (a): compose existing ops) is the union +
  * running-last trick: interleave both sides ordered by (key, ts), carry the
  * last seen right value forward with a per-key window. One shuffle on the
  * key, per-key local sort — no range-join explosion, no driver state; skew
  * behaves exactly like any keyed window.
  */
object AsofJoin {

  /** `left` enriched with `right(valueCol)` as `outCol`: for each left row,
    * the latest right row with rightTs <= leftTs and equal `key`. Left rows
    * with no prior right row get NULL. `valueCol` must be non-null on right
    * rows (it doubles as the carry marker). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, valueCol: String,
               outCol: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(0))
    val r = right.select(
      col(key), col(rightTs).as("__t"),
      col(valueCol).as("__carry")).withColumn("__side", lit(1))
    // at equal ts the right row sorts first → "at-or-before" is inclusive
    val w = Window.partitionBy(key)
      .orderBy(col("__t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(outCol, last("__carry", ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
      .select((leftCols.map(col) :+ col(outCol)): _*)
  }
}
