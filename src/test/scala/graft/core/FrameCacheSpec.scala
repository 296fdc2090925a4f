package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** FrameCache contract: one materialization per (session, key), hits are
  * the same persisted frame, and consumers' plans read the in-memory
  * relation instead of re-running the build.
  */
class FrameCacheSpec extends SparkSpec {

  test("second lookup is a cache hit: same frame, builder runs once") {
    var builds = 0
    def build = {
      builds += 1
      spark.range(100).select(col("id"), (col("id") * 2).as("v"))
    }
    val key = s"framecache-spec-hit-${System.nanoTime()}"
    val a = FrameCache.cached(spark, key)(build)
    val b = FrameCache.cached(spark, key)(build)
    assert(builds == 1)
    assert(a eq b)
    assert(a.storageLevel == StorageLevel.MEMORY_AND_DISK)
    assert(b.count() == 100)
  }

  test("consumer plans scan the cached relation, not the build lineage") {
    val key = s"framecache-spec-scan-${System.nanoTime()}"
    val f = FrameCache.cached(spark, key) {
      spark.range(1000).select(col("id"),
        (col("id") % 7).as("g"))
    }
    val consumer = f.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val plan = consumer.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), plan.take(2000))
  }

  test("distinct keys build distinct frames") {
    val k1 = s"framecache-spec-a-${System.nanoTime()}"
    val k2 = s"framecache-spec-b-${System.nanoTime()}"
    val a = FrameCache.cached(spark, k1)(spark.range(10).toDF())
    val b = FrameCache.cached(spark, k2)(spark.range(20).toDF())
    assert(a.count() == 10 && b.count() == 20)
  }
}
