package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Connected-components correctness: multi-hop chains, triangles and
  * isolated pairs against a driver-side BFS reference.
  */
class ConnectedComponentsSpec extends SparkSpec {

  import spark.implicits._

  private def bruteComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = scala.collection.mutable.Map.empty[Long, List[Long]]
      .withDefaultValue(Nil)
    edges.foreach { case (a, b) =>
      adj(a) = b :: adj(a); adj(b) = a :: adj(b)
    }
    val seen = scala.collection.mutable.Map.empty[Long, Long]
    for (start <- adj.keys.toSeq.sorted if !seen.contains(start)) {
      var frontier = List(start); val members = scala.collection.mutable.Set(start)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(adj).filterNot(members)
        members ++= frontier
      }
      val root = members.min
      members.foreach(m => seen(m) = root)
    }
    seen.toMap
  }

  test("chain + triangle + pair all collapse to min-id components") {
    val edges: Seq[(Long, Long)] =
      (1L until 40L).map(i => (i, i + 1)) ++ // 40-node chain (multi-hop)
        Seq((100L, 101L), (101L, 102L), (102L, 100L), // triangle
          (200L, 201L)) // isolated pair
    val got = NearDup.connectedComponents(
        edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === bruteComponents(edges))
  }

  test("random graph matches BFS reference") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val got = NearDup.connectedComponents(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === bruteComponents(edges))
  }
}
