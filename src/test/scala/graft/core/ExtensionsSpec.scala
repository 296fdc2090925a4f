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

  test("unicode_norm callable from SQL after registration") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT unicode_norm(t, 'nfc') AS nfc,
        |       unicode_norm(t, 'strip_accents') AS stripped
        |FROM VALUES ('Café') AS v(t)""".stripMargin)
      .collect()
    assert(rows(0).getString(0) === "Café") // composed
    assert(rows(0).getString(1) === "Cafe")      // marks dropped
    // bad mode fails at plan construction, not mid-job
    intercept[Exception] {
      spark.sql("SELECT unicode_norm('x', 'bogus')").collect()
    }
  }

  test("wordpiece_tokenize callable from SQL after registration") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      """SELECT wordpiece_tokenize('unwanted',
        |  array('un', '##want', '##ed')) AS toks""".stripMargin)
      .collect()
    assert(rows(0).getSeq[String](0) === Seq("un", "##want", "##ed"))
  }
}
