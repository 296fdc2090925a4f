package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private val Scale = 1000000000000L

  test("star graph concentrates rank on the hub") {
    // full bipartite star (hub 0 <-> spokes 1..4): the hub leads at
    // every iteration; an odd iteration count sits on the high phase
    // of the bipartite oscillation, where the margin is widest
    val nodes = (0L to 4L).toDF("id")
    val edges = ((1L to 4L).map(i => (i, 0L)) ++
      (1L to 4L).map(i => (0L, i))).toDF("src", "dst")
    val r = PageRank.run(nodes, edges, "id", "src", "dst", iterations = 9)
      .orderBy(col("rank").desc, col("id")).as[(Long, Long)].collect()
    assert(r.head._1 === 0L)                  // hub ranks first
    assert(r.head._2 > r.last._2 * 3)         // and by a wide margin
  }

  test("uniform cycle stays uniform and conserves mass up to flooring") {
    val n = 6L
    val nodes = (0L until n).toDF("id")
    val edges = (0L until n).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    val r = PageRank.run(nodes, edges, "id", "src", "dst", iterations = 5)
      .as[(Long, Long)].collect().toMap
    // symmetric graph -> identical ranks everywhere
    assert(r.values.toSet.size === 1)
    // total mass = scale, minus bounded flooring loss (< 2 units/node/iter)
    val total = r.values.sum
    assert(total <= Scale && total > Scale - 2 * n * 5)
  }

  test("deterministic across partitioning") {
    val nodes = (0L until 50L).toDF("id")
    val edges = (0L until 50L).flatMap(i =>
      Seq((i, (i * 7 + 1) % 50), (i, (i * 13 + 5) % 50))).toDF("src", "dst")
    val a = PageRank.run(nodes.repartition(7), edges.repartition(3),
      "id", "src", "dst", iterations = 3)
      .orderBy(col("id")).as[(Long, Long)].collect().toSeq
    val b = PageRank.run(nodes.coalesce(1), edges.coalesce(1),
      "id", "src", "dst", iterations = 3)
      .orderBy(col("id")).as[(Long, Long)].collect().toSeq
    assert(a === b)
  }
}
