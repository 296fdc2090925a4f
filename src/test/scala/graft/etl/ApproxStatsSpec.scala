package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Error bounds for the approximate-profiling scale path
  * (q_a14_approx_stats): HLL distinct within its documented relative
  * standard deviation, approx median within the quantile tolerance.
  */
class ApproxStatsSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val r = li.agg(
      approx_count_distinct(col("l_partkey")).as("a"),
      countDistinct(col("l_partkey")).as("e")).head()
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e < 0.05)
  }

  test("approx median between the exact 40th and 60th percentiles") {
    val li = Tables.load(spark, sf0001, "lineitem")
    val r = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
        .as("am"),
      expr("percentile(l_extendedprice, 0.4)").as("p40"),
      expr("percentile(l_extendedprice, 0.6)").as("p60")).head()
    assert(r.getDouble(0) >= r.getDouble(1) && r.getDouble(0) <= r.getDouble(2))
  }
}
