package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class AnnSpec extends SparkSpec {

  import spark.implicits._

  test("cosine column matches hand computation") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(1.0, 1.0), Array(1.0, 1.0)),
      (Array(1.0, 0.0), Array(-1.0, 0.0))).toDF("a", "b")
    val got = df.select(Ann.cosine(col("a"), col("b"))).collect()
      .map(_.getDouble(0))
    assert(math.abs(got(0) - 0.0) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("brute-force top-k ranks the most similar vectors first") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val probes = emb.orderBy(col("vec_id")).limit(3)
    val out = Ann.bruteForceTopK(emb, probes, "vec_id", "embedding", k = 5)
    val byProbe = out.collect().groupBy(_.getLong(0))
    assert(byProbe.size === 3)
    byProbe.values.foreach { rows =>
      val cosines = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cosines.length === 5)
      // ranks ordered by descending cosine
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("IVF top-k achieves reasonable recall scanning nProbe/nCells") {
    val emb = Tables.load(spark, sf0001, "embeddings").cache()
    val probes = emb.orderBy(col("vec_id")).limit(5)
    val exact = Ann.bruteForceTopK(emb, probes, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(emb, probes, "vec_id", "embedding", 10,
        nCells = 8, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.4, s"ivf recall $recall too low")
  }

  test("PQ/ADC top-k achieves reasonable recall vs brute force") {
    val emb = Tables.load(spark, sf0001, "embeddings").cache()
    val probes = emb.orderBy(col("vec_id")).limit(5)
    val exact = Ann.bruteForceTopK(emb, probes, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = Ann.pqTopK(emb, probes, "vec_id", "embedding", 10,
        nSub = 8, nCodes = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.2, s"pq recall $recall too low")
    info(s"pq recall@10 = $recall")
  }

  test("LSH top-k achieves reasonable recall vs brute force") {
    val emb = Tables.load(spark, sf0001, "embeddings").cache()
    val probes = emb.orderBy(col("vec_id")).limit(5)
    val exact = Ann.bruteForceTopK(emb, probes, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(emb, probes, "vec_id", "embedding", 10,
        bucketLength = 2.0, numHashTables = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("LSH top-k on an empty corpus returns an empty, well-typed frame") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val empty = emb.filter(col("vec_id") < 0)
    val probes = emb.orderBy(col("vec_id")).limit(2)
    val out = Ann.lshTopK(empty, probes, "vec_id", "embedding", k = 5)
    assert(out.columns.toSeq ===
      Seq("probe_id", "neighbor_id", "cosine", "rank"))
    assert(out.count() === 0)
  }

  test("LSH top-k keeps zero-norm vectors reachable (bucket 0, not null)") {
    val emb = Seq(
      (1L, Array(0.0f, 0.0f)), // zero vector: must not vanish
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(0.9f, 0.1f)),
      (4L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val probes = emb.filter(col("vec_id") === 2L)
    val out = Ann.lshTopK(emb, probes, "vec_id", "embedding", k = 4,
      bucketLength = 2.0, numHashTables = 4)
    val neighbors = out.collect().map(_.getLong(1)).toSet
    // the zero vector surfaces as a candidate (cosine NaN ranks last,
    // but it is present, not silently dropped by a null bucket)
    assert(neighbors.contains(1L), s"zero vector dropped: $neighbors")
    assert(neighbors.contains(3L))
  }

  test("IVF hash-based training sample is bounded and deterministic") {
    val emb = Tables.load(spark, sf0001, "embeddings")
    val probes = emb.orderBy(col("vec_id")).limit(3)
    def run(): Set[(Long, Long)] =
      Ann.ivfTopK(emb, probes, "vec_id", "embedding", 5,
          nCells = 4, nProbe = 2, maxTrainVectors = 100L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // capped training (500 vectors, cap 100) must still produce a valid
    // quantizer, and two runs must agree exactly (layout-independent
    // hash sampling, seeded k-means)
    val a = run()
    assert(a.nonEmpty)
    assert(a === run())
  }
}
