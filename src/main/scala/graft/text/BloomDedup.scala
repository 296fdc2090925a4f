package graft.text

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain,
  Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Incremental (corpus vs new-batch) exact dedup with a Bloom-filter
  * pre-filter — the shape a continuously-ingesting training-data pipeline
  * runs: the historical corpus is huge, each incoming batch is small, and
  * almost every incoming document is novel.
  *
  * Scale design: `bloom_filter_agg` reduces the corpus keys to one
  * mergeable sketch (a single small binary, partial-aggregated — the
  * corpus is scanned but never shuffled), which is broadcast to the batch
  * side. `might_contain` then rejects the novel majority map-side; only
  * the tiny candidate set reaches the exact semi join. The Bloom filter
  * has no false negatives, so the result is exactly the semi-join result
  * — false positives only cost extra candidates, tuned by `expectedItems`
  * / `numBits`.
  */
object BloomDedup {

  /** Batch rows whose `key` already occurs in `corpus` — bloom pre-filter
    * + exact semi-join confirm. Output = `batch` rows, exactly as an
    * exact semi join would produce (oracle-checkable).
    *
    * @param expectedItems expected distinct corpus keys (sizes the sketch)
    * @param numBits       sketch size in bits (default 8× items ≈ 2% FPP)
    */
  def duplicates(corpus: DataFrame, batch: DataFrame, key: Column,
      expectedItems: Long = 1000000L, numBits: Long = 8000000L): DataFrame = {
    // BloomFilterAggregate / BloomFilterMightContain are the engine
    // expressions behind Spark's runtime bloom join filters — not exposed
    // in the SQL function registry, so they are wired via the expression
    // bridge
    val ck = corpus.select(key.as("__k"))
    val bloomAgg = GraftColumnBridge.column(
      new BloomFilterAggregate(
        XxHash64(Seq(GraftColumnBridge.expression(col("__k"))), 42L),
        Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())
    // materialize the sketch: one bounded-size binary on the driver (this
    // IS the broadcast — might_contain requires a constant filter), then
    // the pre-filter is a pure map-side predicate on the batch scan
    val sketch = ck.agg(bloomAgg.as("__bloom")).head().getAs[Array[Byte]](0)
    val mightContain = GraftColumnBridge.column(BloomFilterMightContain(
      Literal(sketch, org.apache.spark.sql.types.BinaryType),
      XxHash64(Seq(GraftColumnBridge.expression(col("__k"))), 42L)))
    // exact confirm without ever shuffling the corpus: pass 1 evaluates
    // the bloom predicate once and reduces the batch to its distinct
    // candidate KEYS (tiny); these broadcast against the corpus scan
    // (map-side semi join) to yield the confirmed key set — also tiny.
    // Pass 2 over the batch then needs only the broadcast EXACT key set,
    // no bloom re-evaluation and no sketch literal in its plan. A direct
    // candidates-semi-corpus join would build/shuffle all corpus keys.
    val candidateKeys = batch.select(key.as("__k"))
      .filter(mightContain).distinct()
    val confirmedKeys = ck
      .join(broadcast(candidateKeys), Seq("__k"), "left_semi")
      .distinct()
    batch.withColumn("__k", key)
      .join(broadcast(confirmedKeys), Seq("__k"), "left_semi")
      .drop("__k")
  }
}
