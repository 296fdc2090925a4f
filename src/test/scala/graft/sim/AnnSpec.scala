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
}
