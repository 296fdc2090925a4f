package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class PrefixSumSpec extends SparkSpec {

  import spark.implicits._

  // deterministic pseudo-random values over distinct keys (keys shuffled
  // into the frame out of order, so the operator's range-sort is doing
  // real work)
  private lazy val input = (0L until 5000L)
    .map(k => (k * 2654435761L % 10007L, (k * 48271L % 2001L) - 1000L))
    .groupBy(_._1).map { case (k, vs) => (k, vs.head._2) } // distinct keys
    .toSeq
    .toDF("k", "v")

  test("runningTotal matches the single-partition window oracle") {
    val got = PrefixSum.runningTotal(input, "k", "v", "run")
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val want = input
      .withColumn("run", sum($"v").over(Window.orderBy($"k")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(got === want)
  }

  test("runningTotal is invariant to input partitioning") {
    val a = PrefixSum.runningTotal(input.repartition(1), "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    val b = PrefixSum.runningTotal(input.repartition(17, $"v"), "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    assert(a === b)
    assert(a.length === input.count())
  }

  test("last running value equals the global sum") {
    val run = PrefixSum.runningTotal(input, "k", "v")
    val last = run.orderBy(col("k").desc).limit(1)
      .collect()(0).getLong(2)
    val total = input.agg(sum($"v")).collect()(0).getLong(0)
    assert(last === total)
  }

  test("runningMax matches the single-partition window oracle, " +
      "flag marks strict improvements") {
    val got = PrefixSum.runningMax(input, "k", "v")
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getBoolean(3))))
      .toMap
    val w = Window.orderBy($"k")
    val want = input
      .withColumn("rm", max($"v").over(w.rowsBetween(
        Window.unboundedPreceding, 0)))
      .withColumn("pm", max($"v").over(w.rowsBetween(
        Window.unboundedPreceding, -1)))
      .collect().map(r => (r.getLong(0),
        (r.getLong(2), r.isNullAt(3) || r.getLong(1) > r.getLong(3))))
      .toMap
    assert(got === want)
  }

  test("runningMax is invariant to input partitioning") {
    val a = PrefixSum.runningMax(input.repartition(1), "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
      .sorted
    val b = PrefixSum.runningMax(input.repartition(17, $"v"), "k", "v")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
      .sorted
    assert(a === b)
    assert(a.length === input.count())
  }
}
