package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.SparkSpec

/** The mega-basket guard: capped pair generation must bound the per-
  * basket blow-up, leave small baskets exact, and stay deterministic
  * across partitionings (the cap keeps the cap-smallest item ids, not
  * an arrival-order sample).
  */
class CoOccurSpec extends SparkSpec {

  private def baskets(rows: Seq[(Long, Long)], parts: Int) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (b, i) => Row(b, i) }, parts),
      StructType(Seq(StructField("basket", LongType, nullable = false),
        StructField("item", LongType, nullable = false))))

  // basket 1: mega (200 items); basket 2: small (4 items); basket 3:
  // exactly at cap; duplicate memberships must count once
  private val rows: Seq[(Long, Long)] =
    (0L until 200L).map(i => (1L, i)) ++
      Seq((2L, 10L), (2L, 11L), (2L, 12L), (2L, 13L), (2L, 13L)) ++
      (0L until 20L).map(i => (3L, 100L + i))

  test("uncapped pairs are exact set-semantics co-occurrence counts") {
    val p = CoOccur.pairs(baskets(rows, 4), "basket", "item")
    assert(p.agg(sum(col("cab"))).head().getLong(0) ===
      (200L * 199 / 2) + (4L * 3 / 2) + (20L * 19 / 2))
    // (12,13) co-occur in baskets 1 and 2 -> cab=2; the duplicate
    // (2,13) membership must NOT make it 3 (set semantics per basket)
    assert(p.filter(col("pa") === 12 && col("pb") === 13)
      .head().getLong(2) === 2L)
  }

  test("cap bounds every basket at C(cap,2) pairs; small baskets exact") {
    val p = CoOccur.pairs(baskets(rows, 4), "basket", "item",
      maxBasketSize = Some(20))
    // mega basket contributes its 20 smallest items -> C(20,2); basket 3
    // sits exactly at the cap -> untouched; basket 2 exact
    assert(p.agg(sum(col("cab"))).head().getLong(0) ===
      (20L * 19 / 2) + (4L * 3 / 2) + (20L * 19 / 2))
    // the kept items of the mega basket are 0..19 (cap-smallest, not a
    // partition-order sample)
    assert(p.filter(col("pa") < 100).agg(max(col("pb"))).head().getLong(0)
      === 19L)
  }

  test("capped output is byte-identical across partitionings") {
    def run(parts: Int) =
      CoOccur.pairs(baskets(rows, parts), "basket", "item",
          maxBasketSize = Some(7))
        .orderBy(col("pa"), col("pb"))
        .collect().map(_.toString).toSeq
    assert(run(1) === run(11))
  }
}
