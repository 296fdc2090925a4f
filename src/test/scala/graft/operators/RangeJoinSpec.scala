package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class RangeJoinSpec extends SparkSpec {

  private val horizonUs = 7L * 24 * 3600 * 1000000L // 7 days

  private def sides = {
    val ev = Tables.load(spark, sf0001, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id"), col("ts").as("p_ts"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"),
        col("user_id"), col("ts").as("s_ts"))
    (p, s)
  }

  test("binned range join equals the naive range join") {
    val (p, s) = sides
    val binned = RangeJoin.rangeJoin(p, s, Seq("user_id"),
        "p_ts", "s_ts", lower = horizonUs, upper = 0L,
        bin = horizonUs / 4)
      .select("purchase_id", "signup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val naive = p.join(s.withColumnRenamed("user_id", "u2"),
        col("user_id") === col("u2") &&
          col("s_ts") >= col("p_ts") - horizonUs &&
          col("s_ts") <= col("p_ts"))
      .select("purchase_id", "signup_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(binned.nonEmpty)
    assert(binned.sameElements(naive))
  }

  test("plans as a hash join, not a nested loop") {
    val (p, s) = sides
    val plan = RangeJoin.rangeJoin(p, s, Seq("user_id"),
        "p_ts", "s_ts", lower = horizonUs, upper = 0L,
        bin = horizonUs / 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("CartesianProduct"))
    // the naive formulation really does nested-loop (the thing we avoid)
    val naivePlan = p.join(s.withColumnRenamed("user_id", "u2"),
        col("user_id") === col("u2") && col("s_ts") <= col("p_ts"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("Join")) // sanity: it is a join
  }
}
