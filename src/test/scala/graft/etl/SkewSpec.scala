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
