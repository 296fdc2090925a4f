package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class BucketingSpec extends SparkSpec {

  test("co-bucketed join runs with zero shuffle exchanges") {
    val o = Tables.load(spark, sf0001, "orders")
    val l = Tables.load(spark, sf0001, "lineitem")
    Bucketing.writeBucketed(o.select(col("o_orderkey"),
      col("o_totalprice")), "graft_orders_b", "o_orderkey", buckets = 8)
    Bucketing.writeBucketed(l.select(col("l_orderkey").as("o_orderkey"),
      col("l_quantity")), "graft_lineitem_b", "o_orderkey", buckets = 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_orders_b")
        .join(spark.table("graft_lineitem_b"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free co-bucketed join, got:\n$plan")
      // and it still computes the right thing
      assert(joined.count() ===
        l.join(o, l("l_orderkey") === o("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
    }
  }

  test("bucketedTable builds once per fingerprint and the composite-key " +
      "rejoin plans with zero exchanges below the aggregate") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val keys = Seq("l_orderkey", "l_linenumber")
    var builds = 0
    def x = Bucketing.bucketedTable(spark, "spec_x", "fp-1", keys,
        buckets = 8) {
      builds += 1
      li.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = x
      val b = x // second call: must reuse, not rebuild
      assert(builds === 1, "layout built more than once per fingerprint")
      val y = Bucketing.bucketedTable(spark, "spec_y", "fp-1", keys,
        buckets = 8)(li.select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag")))
      val joined = a.join(y, keys)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected shuffle-free composite-key bucketed join, got:\n$plan")
      // the synthetic lineitem's composite key is NOT unique (the
      // testdata generator reuses (orderkey, linenumber) pairs), so the
      // rejoin fans out — assert the exact multiset semantics:
      // sum over keys of n^2
      val expected = li.groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * col("n"))).head.getLong(0)
      assert(joined.count() === expected,
        "bucketed rejoin must match the equi-join multiset")
      // a DIFFERENT fingerprint is a different physical table: stale
      // layouts can never serve a regenerated source
      val x2 = Bucketing.bucketedTable(spark, "spec_x", "fp-2", keys,
        buckets = 8)(li.select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity")).limit(5))
      assert(builds === 1) // by-name builder untouched
      assert(x2.count() === 5)
      assert(b.count() === li.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      Seq("spec_x" -> "fp-1", "spec_y" -> "fp-1", "spec_x" -> "fp-2")
        .foreach { case (n, fp) =>
          val digest = java.security.MessageDigest.getInstance("MD5")
            .digest(fp.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(12)
          spark.sql(s"DROP TABLE IF EXISTS graft_${n}_$digest")
        }
    }
  }
}
