package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** q_m4_stratified_sample's contract: per-class fractions honored within
  * Bernoulli tolerance, minority kept whole, deterministic under seed.
  */
class StratifiedSampleSpec extends SparkSpec {

  private def labeled = Tables.load(spark, sf0001, "lineitem").select(
    when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("label"))

  test("fractions honored; minority kept whole; seeded deterministic") {
    val base = labeled.groupBy("label").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    def sampleCounts = labeled.stat
      .sampleBy("label", Map(0.0 -> 0.1, 1.0 -> 1.0), seed = 42L)
      .groupBy("label").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    val s1 = sampleCounts
    assert(s1(1.0) === base(1.0)) // fraction 1.0 keeps every minority row
    val frac = s1(0.0).toDouble / base(0.0)
    assert(frac > 0.07 && frac < 0.13, s"majority fraction $frac")
    assert(sampleCounts === s1) // same seed, same sample
  }
}
