package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-profile aggregates (SURVEY §2.5 A1-A6): the stats the reference
  * computes to drive imputation and rebalancing decisions (notebook cells
  * 15-25, 43).
  *
  * All of these are single-pass partial+final hash aggregations — at 100 TB
  * they cost one scan with map-side combine, no wide rows ever materialize.
  */
object ColumnStats {

  private def isNullish(c: Column, dt: DataType): Column = dt match {
    case DoubleType | FloatType => c.isNull || c.isNaN
    case _ => c.isNull
  }

  /** A1 — null count per column, one row out (notebook `df.isna().sum()`). */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame = {
    val dts = df.schema.fields.map(f => f.name -> f.dataType).toMap
    df.select(cols.map(c =>
      sum(when(isNullish(col(c), dts(c)), 1L).otherwise(0L)).as(c)): _*)
  }

  /** A2 — exact distinct count per column in one pass (notebook
    * `nunique()`). Uses `count_distinct` per column; for 100 TB profiling
    * prefer [[approxDistinctCounts]] (single-pass HLL, no expand).
    */
  def distinctCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => count_distinct(col(c)).as(c)): _*)

  /** A2 at scale — HLL++ sketches, one scan, mergeable across executors. */
  def approxDistinctCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => approx_count_distinct(col(c)).as(c)): _*)

  /** A3 — most frequent value of a column, ties broken by smallest value
    * (deterministic, unlike pandas' arbitrary `.mode().iloc[0]`).
    */
  def modeOf(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).count()
      .orderBy(desc("count"), asc(c))
      .limit(1)

  /** A3 multi-column — per-column modes in one pass via Spark's builtin
    * `mode` TypedImperativeAggregate (deterministic=false on ties; use
    * [[modeOf]] where tie determinism matters).
    */
  def modes(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => mode(col(c)).as(c)): _*)

  /** A6 — value histogram (notebook `value_counts()`). */
  def histogram(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).count().orderBy(desc("count"), asc(c))

  /** A4/A5 — mean and stddev per column, exact-decimal sums so results are
    * order-independent (see QueryDef determinism contract).
    */
  def meanStd(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      val d = col(c).cast(DecimalType(18, 6))
      Seq(
        (sum(d).cast(DoubleType) / count(col(c))).as(s"${c}_mean"),
        stddev_samp(col(c)).as(s"${c}_std"))
    }
    df.select(aggs: _*)
  }
}
