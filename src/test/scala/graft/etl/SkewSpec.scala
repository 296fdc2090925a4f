package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  import spark.implicits._

  test("saltedJoin matches plain join results under heavy key skew") {
    // 10k rows of one hot key + scattered tail
    val big = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong)))
      .toDF("key", "payload")
    val small = (1L to 10L).map(k => (k, s"dim_$k")).toDF("key", "attr")
    val plain = big.join(small, Seq("key")).groupBy("key")
      .agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val salted = Skew.saltedJoin(big, small, "key", buckets = 8)
      .groupBy("key").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("hotSaltedJoin matches plain join; both branches carry rows") {
    // one genuinely hot key (10k rows), a tail of cold keys — the split
    // must route key 1 through the salted branch, keys 2..8 plain, and
    // the union must be the plain join's exact multiset (including a
    // small-side key with NO big rows, which must simply vanish)
    val big = ((1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong)))
      .toDF("key", "payload")
    val small = (1L to 10L).map(k => (k, s"dim_$k")).toDF("key", "attr")
    val plain = big.join(small, Seq("key"))
    val hot = Skew.hotSaltedJoin(big, small, "key", buckets = 8,
      hotThreshold = 1000L)
    assert(plain.exceptAll(hot).count() === 0)
    assert(hot.exceptAll(plain).count() === 0)
    // threshold above every key's count degenerates to the plain join
    val allCold = Skew.hotSaltedJoin(big, small, "key", buckets = 8,
      hotThreshold = 100000L)
    assert(allCold.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(allCold).count() === 0)
  }

  test("hotSaltedJoin left join preserves unmatched big rows exactly once") {
    val big = ((1 to 5000).map(i => (1L, i.toLong)) ++
      Seq((99L, -1L), (100L, -2L))).toDF("key", "payload")
    val small = Seq((1L, "hot"), (99L, "cold")).toDF("key", "attr")
    val l = Skew.hotSaltedJoin(big, small, "key", buckets = 4,
      hotThreshold = 100L, joinType = "left")
    assert(l.count() === 5002)
    assert(l.filter(col("key") === 100L && col("attr").isNull)
      .count() === 1)
  }

  test("saltedJoin spreads the hot key over multiple salt buckets") {
    val big = (1 to 5000).map(i => (1L, i.toLong)).toDF("key", "payload")
    val small = Seq((1L, "hot")).toDF("key", "attr")
    val salts = big.withColumn("__salt",
        pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(8))
          .cast("int"))
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(salts > 1)
    assert(Skew.saltedJoin(big, small, "key", 8).count() === 5000)
  }
}
