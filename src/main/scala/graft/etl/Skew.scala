package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join helper: salting for hot keys.
  *
  * AQE's skew-join splitting (enabled session-wide) handles most runtime
  * skew; explicit salting remains the tool when one key dominates so
  * heavily that even split partitions bottleneck, or when the small side
  * must not be broadcast. The big side gets a random-but-deterministic
  * salt in [0, buckets); the small side is exploded ×buckets so every
  * (key, salt) pair finds its match. Shuffle then distributes each hot
  * key over `buckets` reducers.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted into `buckets` partitions
    * per key. `small` grows ×buckets — keep it the dimension side.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int = 8, joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // the small side is exploded ×buckets, so join types that emit
    // UNMATCHED small-side rows (right/full outer) would duplicate each
    // such row `buckets` times — reject them rather than return a wrong
    // multiset
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "cross")(jt),
      s"saltedJoin supports inner/left/left_semi joins, not $joinType " +
        "(the exploded small side breaks right/full-outer multiplicity)")
    // deterministic salt: hash of the whole row spreads a hot key's rows
    // uniformly without an RNG (re-runs produce identical plans/results)
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(buckets))
        .cast("int"))
    val saltedSmall = small
      .withColumn("__salt",
        explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
