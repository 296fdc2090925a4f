package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** The 100 TB claim for the exact drift statistics must be EXECUTABLE,
  * not annotated (round-7 verdict #6): at ~3e9 rows per side the
  * Mann–Whitney 2U term and the KS deviation ca·nb − cb·na exceed Long
  * range, and under ANSI (the session default) the narrow BIGINT form is
  * a runtime ERROR, not a silently wrong number. This spec drives the
  * decimal-widened builders at synthetic counts past Long range and
  * asserts the results equal BigInt-computed ground truth — and shows
  * the narrow Long expression failing on the same inputs.
  */
class ExactStatsOverflowSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("v", LongType), StructField("na_v", LongType),
    StructField("nb_v", LongType)))

  // three value buckets, ~3e9 per group per bucket: n_a = n_b ≈ 9e9,
  // 2U ≈ n_a·n_b ≈ 8e19 > Long.MaxValue (9.2e18); tie term (6e9)³ ≈ 2e29
  private val rows = Seq(
    Row(1L, 3000000000L, 2000000000L),
    Row(2L, 2500000000L, 3500000000L),
    Row(3L, 3500000000L, 3500000000L))

  private def grain = spark.createDataFrame(
    new java.util.ArrayList[Row](scala.jdk.CollectionConverters
      .SeqHasAsJava(rows).asJava), schema)

  /** BigInt ground truth of the same formulas. */
  private def expected: (BigInt, BigInt, BigInt, BigInt) = {
    val s = rows.map(r => (r.getLong(1), r.getLong(2)))
    var cumb = BigInt(0); var u2 = BigInt(0); var tie = BigInt(0)
    s.foreach { case (na, nb) =>
      u2 += BigInt(na) * (2 * cumb + BigInt(nb))
      val n = BigInt(na) + BigInt(nb)
      tie += n * n * n - n
      cumb += BigInt(nb)
    }
    (s.map(x => BigInt(x._1)).sum, s.map(x => BigInt(x._2)).sum, u2, tie)
  }

  test("mannWhitneyZ is exact past Long range (decimal-widened)") {
    val r = ExactStats.mannWhitneyZ(grain).head()
    val (na, nb, u2, tie) = expected
    assert(r.getLong(0) === na.toLong)
    assert(r.getLong(1) === nb.toLong)
    // u2 ≈ 8.1e19: double-rendered exactly as BigDecimal(u2).toDouble
    assert(r.getDouble(2) === BigDecimal(u2).toDouble)
    // z recomputed from the exact BigInt terms with the same float mint
    val naD = na.toDouble; val nbD = nb.toDouble; val nD = naD + nbD
    val sigma2 = naD * nbD / 12.0 *
      ((nD + 1.0) - BigDecimal(tie).toDouble / (nD * (nD - 1.0)))
    val z = BigDecimal(
      (BigDecimal(u2).toDouble / 2.0 - naD * nbD / 2.0) / math.sqrt(sigma2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === z)
  }

  test("the narrow Long form of 2U FAILS on the same counts under ANSI " +
      "(the wrap the widening removes is an error, not a wrong number)") {
    val narrow = grain
      .select((col("na_v") * (lit(2) * col("nb_v") + col("nb_v")))
        .as("t2u"))
      .agg(sum(col("t2u")))
    val e = intercept[Exception](narrow.head())
    assert(e.getMessage.toLowerCase.contains("overflow"),
      s"expected a Long-overflow error, got: ${e.getMessage}")
  }

  test("ksStat is exact past Long range (decimal-widened)") {
    val ks = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(Seq(
          Row(10L, 4000000000L, 1000000000L),
          Row(20L, 1000000000L, 3000000000L),
          Row(30L, 3000000000L, 4000000000L))).asJava),
      StructType(Seq(StructField("cents", LongType),
        StructField("da", LongType), StructField("db", LongType))))
    val r = ExactStats.ksStat(ks).head()
    // BigInt truth: cumulative counts and max |ca·nb − cb·na|
    val cum = Seq((10L, 4000000000L, 1000000000L),
      (20L, 5000000000L, 4000000000L), (30L, 8000000000L, 8000000000L))
    val na = BigInt(8000000000L); val nb = BigInt(8000000000L)
    val devs = cum.map { case (c, ca, cb) =>
      (c, (BigInt(ca) * nb - BigInt(cb) * na).abs) }
    val md = devs.map(_._2).max
    val atCents = devs.filter(_._2 == md).map(_._1).min
    assert(r.getLong(0) === na.toLong)
    assert(r.getLong(1) === nb.toLong)
    assert(r.getLong(2) === atCents)
    val ksD = BigDecimal(BigDecimal(md).toDouble /
      (na.toDouble * nb.toDouble))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === ksD)
  }
}
