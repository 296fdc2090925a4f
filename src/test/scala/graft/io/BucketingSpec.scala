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
}
