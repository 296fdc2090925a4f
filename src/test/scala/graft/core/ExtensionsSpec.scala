package graft.core

import graft.SparkSpec

class ExtensionsSpec extends SparkSpec {

  test("rolling_fingerprint callable from SQL after registration") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT rolling_fingerprint(t) AS fp1,
        |       rolling_fingerprint(t, 8) AS fp2
        |FROM VALUES ('the same document'), ('the same document'),
        |            ('something else') AS v(t)""".stripMargin)
      .collect()
    assert(rows(0).getLong(0) === rows(1).getLong(0))
    assert(rows(0).getLong(0) !== rows(2).getLong(0))
    // window size changes the fingerprint function
    assert(rows(0).getLong(0) !== rows(0).getLong(1))
  }
}
