package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch range join: `left ⋈ right` on equal keys with `right.time`
  * inside `[left.time - lower, left.time + upper]`.
  *
  * Spark plans a join whose only non-equi predicate is the range as a
  * broadcast-nested-loop (or cartesian) — O(|L|·|R|) per key. This
  * operator bins both sides' time axes at `bin` width and adds the bin to
  * the equi keys: the left side explodes to the fixed set of bins its
  * window can overlap (duplication factor (lower+upper)/bin + 2, chosen
  * by the caller), the right side maps to exactly one bin, and the join
  * becomes a plain shuffled/broadcast HASH join followed by the exact
  * range filter. The classic interval-bucketing trick used by
  * time-series engines, expressed entirely in declarative Spark ops —
  * Catalyst still pushes filters and picks the physical join.
  *
  * Time columns must be integral (epoch nanos/micros/ms — exact
  * comparisons, no timezone semantics).
  */
object RangeJoin {

  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, lower: Long, upper: Long,
      bin: Long): DataFrame = {
    require(bin > 0 && lower >= 0 && upper >= 0,
      "bin must be positive; lower/upper are non-negative offsets")
    // integral `div`, never `/`: double division loses ULPs at
    // epoch-nano magnitudes (~1.7e18 ≫ 2^53) and can misbin boundary
    // rows — a silent false negative the exact filter cannot recover.
    // `div` truncates toward zero (≠ floor for negatives) but is
    // monotonic and identical on both sides, which is all binning needs.
    val l = left
      .withColumn("__lo", col(leftTime).cast("long") - lower)
      .withColumn("__hi", col(leftTime).cast("long") + upper)
      .withColumn("__bin",
        explode(sequence(expr(s"__lo div ${bin}L"), expr(s"__hi div ${bin}L"))))
      .drop("__lo", "__hi")
    val r = right.withColumn("__rt", col(rightTime).cast("long"))
      .withColumn("__bin", expr(s"__rt div ${bin}L"))
      .drop("__rt")
    l.join(r, keys :+ "__bin")
      .filter(col(rightTime) >= col(leftTime) - lower &&
        col(rightTime) <= col(leftTime) + upper)
      .drop("__bin")
  }
}
