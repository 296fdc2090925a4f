package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QueryMetricsSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf001, "documents")

  test("map-only query: scan rows counted, zero shuffles") {
    val p = QueryMetrics.profile(
      docs.select(col("doc_id"), length(col("text")).as("len")))
    assert(p.scanRows === 500L)
    assert(p.nShuffles === 0)
    assert(p.shuffleBytes === 0L)
  }

  test("aggregation query: at least one shuffle with real bytes") {
    val p = QueryMetrics.profile(
      docs.groupBy(col("lang")).agg(count(lit(1)).as("n")))
    assert(p.scanRows === 500L)
    assert(p.nShuffles >= 1)
    assert(p.shuffleBytes > 0L)
  }

  test("broadcast join shuffles nothing") {
    val dims = docs.select(col("lang")).distinct().limit(2)
    val p = QueryMetrics.profile(
      docs.join(broadcast(dims), Seq("lang")))
    // the distinct on the dim side aggregates (shuffles a few rows);
    // the fact side must not shuffle — bytes stay tiny, not fact-sized
    assert(p.scanRows >= 500L)
    assert(p.shuffleBytes < 10000L, s"fact side shuffled: $p")
  }
}
