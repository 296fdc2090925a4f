package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Exact drift statistics whose integer intermediates are DECIMAL-WIDENED
  * so the 100 TB claim is executable, not annotated (round-7 verdict #6):
  * the BIGINT forms of the Mann–Whitney 2U term (≈ na·nb, overflows Long
  * at ~3e9 rows per side), the tie term t³−t (~2e6 tied rows per value
  * bucket), and the KS deviation ca·nb − cb·na all wrap past Long range
  * exactly at the scales the engine is designed for — and under ANSI mode
  * (the session default) a wrap is a runtime error, not a silent wrong
  * answer. All products here run in DECIMAL(38,0) (exact to 1e38 —
  * unreachable by any physical corpus), the float statistic is minted
  * once from the exact decimal, and outputs that can themselves exceed
  * Long range (2U) are emitted as DOUBLE minted once on both engines.
  *
  * ExactStatsOverflowSpec drives both builders at synthetic counts where
  * the narrow Long form provably overflows (the spec shows the Long
  * expression throwing under ANSI) and asserts the widened result equals
  * a BigInt-computed ground truth.
  */
object ExactStats {

  private def dec(c: Column): Column = c.cast(DecimalType(38, 0))

  /** Two-sample Mann–Whitney U (rank-sum) z from VALUE-GRAIN counts:
    * input one row per quantized value `v` with group counts
    * (na_v, nb_v). The ordered window runs over the bounded value grain,
    * never rows. 2U = Σ na_v·(2·cumb_below + nb_v) and
    * ΣT = Σ(t³−t) accumulate in decimal(38,0); the tie-corrected normal
    * approximation mints float once.
    *
    * @return one row: (na, nb, u2: double, mw_z: double)
    */
  def mannWhitneyZ(grain: DataFrame): DataFrame = {
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val nv = dec(col("na_v") + col("nb_v"))
    val terms = grain
      .withColumn("cumb",
        coalesce(sum(col("nb_v")).over(w), lit(0L)))
      .select(col("na_v"), col("nb_v"),
        (dec(col("na_v")) *
          (lit(2) * dec(col("cumb")) + dec(col("nb_v")))).as("t2u"),
        (nv * nv * nv - nv).as("tie"))
    val a = terms.agg(sum(col("na_v")).as("na"),
      sum(col("nb_v")).as("nb"), sum(col("t2u")).as("u2"),
      sum(col("tie")).as("tsum"))
    val naD = col("na").cast(DoubleType)
    val nbD = col("nb").cast(DoubleType)
    val nD = naD + nbD
    val sigma2 = naD * nbD / 12.0 *
      ((nD + 1.0) - col("tsum").cast(DoubleType) /
        (nD * (nD - 1.0)))
    a.select(col("na"), col("nb"),
      col("u2").cast(DoubleType).as("u2"),
      round((col("u2").cast(DoubleType) / 2.0 - naD * nbD / 2.0) /
        sqrt(sigma2), 6).as("mw_z"))
  }

  /** Exact two-sample Kolmogorov–Smirnov from VALUE-GRAIN counts: input
    * one row per value `cents` with per-era counts (da, db). Cumulative
    * counts come from the caller-agnostic two-phase PrefixSum scan; the
    * deviation ca·nb − cb·na is maximized in decimal(38,0) and divided
    * once at the end. Ties on the max deviation break to the smallest
    * value.
    *
    * @return one row: (na, nb, at_cents, ks_d: double, ks_crit: double)
    */
  def ksStat(grain: DataFrame): DataFrame = {
    val scanned = PrefixSum.runningTotals(grain, "cents",
      Seq("da", "db"), Seq("ca", "cb"))
    val tot = scanned.agg(max(col("ca")).as("na"),
      max(col("cb")).as("nb"))
    val dev = scanned.crossJoin(broadcast(tot))
      .select(col("cents"), col("na"), col("nb"),
        abs(dec(col("ca")) * dec(col("nb")) -
          dec(col("cb")) * dec(col("na"))).as("dstar"))
    val m = dev.agg(max(col("dstar")).as("md"))
    val naD = col("na").cast(DoubleType)
    val nbD = col("nb").cast(DoubleType)
    dev.crossJoin(broadcast(m))
      .filter(col("dstar") === col("md"))
      .groupBy(col("na"), col("nb"), col("md"))
      .agg(min(col("cents")).as("at_cents"))
      .select(col("na"), col("nb"), col("at_cents"),
        round(col("md").cast(DoubleType) / (naD * nbD), 6)
          .as("ks_d"),
        round(lit(1.358) *
          sqrt((col("na") + col("nb")).cast(DoubleType) /
            (naD * nbD)), 6).as("ks_crit"))
  }
}
