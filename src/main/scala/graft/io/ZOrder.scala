package graft.io

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-column data skipping.
  *
  * Linear sort layouts (parquetCorpus's sortCols) give tight row-group
  * min/max stats on the LEADING sort column only — a filter on the second
  * column still reads every file. Interleaving the bits of two rank
  * columns places rows so that ranges of BOTH columns map to compact
  * z-value ranges; range-partitioning + sorting by the z-value then
  * yields files whose min/max spans are narrow in every clustered
  * dimension, so single-dimension predicates prune files/row groups
  * regardless of which dimension they hit.
  *
  * The z-value is a plain codegen'd expression fold (shift/and/or) over
  * per-column uniform ranks — no UDF, no driver work; computing it at
  * 100 TB is a map-only pass fused into the write shuffle.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative long columns:
    * bit i of `a` lands at position 2i+1, bit i of `b` at 2i. Inputs
    * must already be RANKS (dense, bounded by 2^bits) — use
    * [[zOrderByRank]] for raw values.
    */
  def interleave(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      val fromA = shiftleft(shiftright(a, i).bitwiseAND(1L), 2 * i + 1)
      val fromB = shiftleft(shiftright(b, i).bitwiseAND(1L), 2 * i)
      fromA.bitwiseOR(fromB)
    }.reduce(_ bitwiseOR _)

  /** Z-value over two numeric columns via equi-width rank buckets in
    * [min, max] — the standard practical z-order (exact quantile ranks
    * would need a global sort; equi-width buckets are map-only given the
    * 2-row min/max frame, and skew only costs skipping efficiency, not
    * correctness).
    */
  def zOrderByRank(df: DataFrame, colA: String, colB: String,
      bits: Int = 16): DataFrame = {
    val stats = df.agg(
      min(col(colA).cast("double")).as("__amin"),
      max(col(colA).cast("double")).as("__amax"),
      min(col(colB).cast("double")).as("__bmin"),
      max(col(colB).cast("double")).as("__bmax"))
    val buckets = (1L << bits) - 1
    def rank(c: Column, lo: Column, hi: Column): Column =
      when(hi === lo, lit(0L)).otherwise(
        least(lit(buckets), floor(
          (c.cast("double") - lo) / ((hi - lo) / lit(buckets.toDouble)))
          .cast("long")))
    df.crossJoin(broadcast(stats))
      .withColumn("__zvalue", interleave(
        rank(col(colA), col("__amin"), col("__amax")),
        rank(col(colB), col("__bmin"), col("__bmax")), bits))
      .drop("__amin", "__amax", "__bmin", "__bmax")
  }

  /** Write `df` z-ordered by (colA, colB): range-partition on the
    * z-value (balanced output files), sort within partitions by it
    * (tight row-group stats), drop the helper column from the persisted
    * schema.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, numFiles: Int, bits: Int = 16,
      maxRecordsPerFile: Long = 5000000L): Unit =
    zOrderByRank(df, colA, colB, bits)
      .repartitionByRange(numFiles, col("__zvalue"))
      .sortWithinPartitions(col("__zvalue"))
      .drop("__zvalue")
      .write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
}
