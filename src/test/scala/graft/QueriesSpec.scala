package graft

/** Contract smoke for the driver: the flagship entry returns rows, every
  * registered query executes at sf0.001, and oracle SQL exists only for
  * registered names.
  */
class QueriesSpec extends SparkSpec {

  test("entry returns rows > 0 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1))
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sf0001)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
}
