package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Units for the corpus-curation additions: benchmark decontamination,
  * repetition metrics, and PII scrubbing.
  */
class CurationSpec extends SparkSpec {

  import spark.implicits._

  test("decontamination flags docs containing a benchmark n-gram") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "iota kappa lambda mu nu xi omicron pi"),
      (3L, "unrelated words entirely disjoint from anything benchmarked"))
      .toDF("doc_id", "text")
    // benchmark quotes a 5-token span of doc 1 and nothing from doc 2/3
    val bench = Seq("beta gamma delta epsilon zeta").toDF("bench_text")
    val bg = Decontaminate.benchmarkNgrams(bench, "bench_text", n = 5)
    val hit = Decontaminate.contaminated(corpus, bg, "doc_id", "text",
      n = 5).collect()
    assert(hit.map(_.getLong(0)).toSet === Set(1L))
    assert(hit.head.getLong(1) === 1L) // exactly one shared 5-gram
  }

  test("benchmark n-gram set is distinct across benchmark items") {
    val bench = Seq("a b c d e", "a b c d e", "b c d e f")
      .toDF("bench_text")
    val bg = Decontaminate.benchmarkNgrams(bench, "bench_text", n = 5)
    assert(bg.count() === 2) // duplicates collapse
  }

  test("repetition metrics: degenerate text scores high, varied text low") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "eight entirely distinct tokens appear exactly once here"))
      .toDF("doc_id", "text")
    val m = df.select(col("doc_id"),
        TextStats.dupTokenFrac(col("text")).as("dup"),
        TextStats.topTokenFrac(col("text")).as("top"))
      .orderBy("doc_id").collect()
    assert(m(0).getDouble(1) === 7.0 / 8.0) // 8 tokens, 1 distinct
    assert(m(0).getDouble(2) === 1.0)
    assert(m(1).getDouble(1) === 0.0)
    assert(m(1).getDouble(2) === 1.0 / 8.0)
  }

  test("pii scrub replaces every email/phone and counts match") {
    val df = Seq(
      (1L, "reach me at jane.doe@example.org or +1-555-0199 thanks"),
      (2L, "two mails a@b.co c@d.io and no phone"),
      (3L, "nothing sensitive here"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextStats.scrubPii(col("text")).as("t"),
        TextStats.emailCount(col("text")).as("ne"),
        TextStats.phoneCount(col("text")).as("np"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) ===
      "reach me at <EMAIL> or <PHONE> thanks")
    assert(out(0).getInt(2) === 1 && out(0).getInt(3) === 1)
    assert(out(1).getString(1) === "two mails <EMAIL> <EMAIL> and no phone")
    assert(out(1).getInt(2) === 2 && out(1).getInt(3) === 0)
    assert(out(2).getString(1) === "nothing sensitive here")
  }
}
