package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class BloomDedupSpec extends SparkSpec {

  test("bloom pre-filter + confirm equals the exact semi join") {
    val d = Tables.load(spark, sf001, "documents")
    val corpus = d.filter(col("doc_id") < 400)
    val batch = d.filter(col("doc_id") >= 400)
    val key = substring(col("text"), 1, 20)
    val got = BloomDedup.duplicates(corpus, batch, key,
        expectedItems = 1000L, numBits = 8000L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val expected = batch.withColumn("__k", key)
      .join(corpus.select(key.as("__k")), Seq("__k"), "left_semi")
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.sameElements(expected))
    assert(expected.nonEmpty) // the fixture really exercises the path
  }

  test("novel batch passes through empty") {
    val d = Tables.load(spark, sf0001, "documents")
    val corpus = d.filter(col("doc_id") < 100)
    val batch = d.filter(col("doc_id") >= 100)
    // full-text keys are unique in the fixture → no duplicates
    val got = BloomDedup.duplicates(corpus, batch, col("text"))
    assert(got.count() === 0)
  }
}
