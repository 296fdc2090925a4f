package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — match each left row to the right row with the greatest
  * timestamp ≤ the left row's timestamp, per key (the canonical event/
  * dimension-history alignment operator; Spark has no native ASOF JOIN).
  *
  * Spark-first composition (preference (a) over a custom SparkPlan): tag
  * both sides, union, and carry the latest right values forward with a
  * `last(_, ignoreNulls)` running window. Cost is one shuffle on the key +
  * a per-partition sort — identical shape to the sort-merge join Spark
  * would plan for an equi join, with none of the range-condition blowup a
  * naive `l.ts >= r.ts` theta-join would cause (that plan is a per-key
  * cross product — disqualifying at scale).
  *
  * Semantics match DuckDB's `ASOF JOIN` (oracle-checked in q_asof_join):
  * ties (equal timestamps) match, and left rows with no prior right row
  * get nulls.
  */
object AsofJoin {

  /** @param on        equi key columns (both sides)
    * @param leftTs    left timestamp column (any orderable type)
    * @param rightTs   right timestamp column (same type)
    * @param rightVals right columns to carry onto matching left rows
    */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__asof_t", col(leftTs))
      .withColumn("__side", lit(0))
    // carry ONE struct per right row, not per-column values: a struct is
    // non-null for every right row even when carried FIELDS are null, so
    // last(_, ignoreNulls) selects the most recent right ROW — per-column
    // carries would walk past a legitimately-null current value and
    // resurrect a stale older one (diverging from native ASOF semantics)
    val r = right.select(
      (on.map(col) :+ col(rightTs).as("__asof_t")) :+
        struct(rightVals.map(c => col(c).as(c)): _*).as("__rv"): _*)
      .withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal timestamps → ties match
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__asof_t").asc, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = unioned.withColumn("__rv",
      last(col("__rv"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 0)
      .select(leftCols.map(col) ++
        rightVals.map(c => col(s"__rv.$c").as(c)): _*)
  }
}
