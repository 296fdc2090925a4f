package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.text.TextStats

/** The fused one-pass TextProfile expression must be OBSERVATIONALLY
  * IDENTICAL to the declarative TextStats column trees it replaces —
  * every derived stat (token counts, stopword/quality, language ID,
  * Gopher repetition pair, regex tokens) bit-equal on the same strings,
  * including the whitespace edge shapes where Java split semantics bite
  * (leading/trailing tabs survive trim, empty text yields one empty
  * token, trailing separators keep a trailing empty token under
  * limit -1).
  */
class TextProfileSpec extends SparkSpec {

  import spark.implicits._

  // fixed-seed sampling (PropertiesSpec convention: no
  // scalatest-scalacheck bridge in the offline cache) — reproducible
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(826L + i)))

  /** Declarative vs fused, evaluated in one projection each; returns the
    * first mismatching column name, if any.
    */
  private def compare(texts: Seq[String]): Unit = {
    // repartition defeats ConvertToLocalRelation, so the fused
    // expression is exercised through its CODEGEN path, not just
    // interpreted constant folding
    val df = texts.toDF("text").repartition(2)
    val p = TextStats.profile(col("text"))
    // qualityScore divides by length(text): under ANSI (the session
    // default) BOTH the declarative and the fused form throw on empty
    // text — identical behavior, but it means quality can only be
    // value-compared on non-empty texts
    val quality = Seq[(String, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column)](
      ("quality", TextStats.qualityScore(col("text")),
        TextStats.qualityScoreFrom(p)))
    val always = Seq[(String, org.apache.spark.sql.Column,
        org.apache.spark.sql.Column)](
      ("n_tokens", TextStats.tokenCount(col("text")),
        TextStats.tokenCountFrom(p)),
      ("stop_count", TextStats.stopwordCount(col("text")),
        TextStats.stopwordCountFrom(p)),
      ("punct", TextStats.punctCount(col("text")),
        p.getField("punct_count")),
      ("n_chars", length(col("text")), p.getField("n_chars")),
      ("regex_tokens", TextStats.regexTokenCount(col("text")),
        TextStats.regexTokenCountFrom(p)),
      ("lang", TextStats.langId(col("text")),
        TextStats.langIdFrom(p)),
      ("dup_frac", TextStats.dupTokenFrac(col("text")),
        TextStats.dupTokenFracFrom(p)),
      ("top_frac", TextStats.topTokenFrac(col("text")),
        TextStats.topTokenFracFrom(p)),
      // raw-case Gopher metrics (NOT lowered — "The" is neither an
      // alpha-token hit nor a stopword here)
      ("nonws_chars", length(regexp_replace(col("text"), "\\s", "")),
        p.getField("nonws_chars")),
      ("alpha_tokens",
        size(filter(split(trim(col("text")), "\\s+"),
          t => t.rlike("[a-z]"))),
        p.getField("alpha_tokens")),
      ("raw_stop", size(filter(split(trim(col("text")), "\\s+"),
          t => t.isInCollection(TextStats.stopwords))),
        p.getField("raw_stop_count")))
    def check(frame: org.apache.spark.sql.DataFrame,
        pairs: Seq[(String, org.apache.spark.sql.Column,
          org.apache.spark.sql.Column)]): Unit = {
      val cols = pairs.flatMap { case (n, d, f) =>
        Seq(d.as(s"d_$n"), f.as(s"f_$n")) }
      frame.select(col("text") +: cols: _*).collect().foreach { r =>
        pairs.zipWithIndex.foreach { case ((n, _, _), i) =>
          val d = r.get(1 + 2 * i)
          val f = r.get(2 + 2 * i)
          assert(d == f,
            s"stat $n diverged on text=${r.getString(0).take(80).map(c =>
              if (c < ' ') f"\\u${c.toInt}%04x" else c.toString)
              .mkString}: declarative=$d fused=$f")
        }
      }
    }
    check(df, always)
    check(df.filter(length(col("text")) > 0), quality)
  }

  test("edge shapes: empty, whitespace-only, tabs, trailing separators, " +
      "uppercase, unicode, digits") {
    compare(Seq(
      "", " ", "  ", "\t", "\ta b", "a b\t", "a\tb", "a  b",
      "a b ", " a b", "\n\nx\n", "the the the", "THE The the",
      "a", "it", "der die und das", "le la de et", "el la de que",
      "the and of to in is that it",
      "héllo wörld ünïcode", "日本語 テスト", "a1b2c3", "123 456",
      "a.b,c;d", "... --- !!!", "email@example.com +1-555-1234",
      "x" * 500, ("word " * 200).trim,
      " vertical  formfeed \r carriage"))
  }

  test("property: fused profile == declarative stats on random strings") {
    val wordish = Gen.frequency(
      5 -> Gen.oneOf(TextStats.stopwords),
      5 -> Gen.oneOf(TextStats.langProfiles.values.flatten.toSeq),
      4 -> Gen.alphaNumStr.map(_.take(8)),
      2 -> Gen.oneOf("A", "Zz", "9x", ".", ",,", "é", "ab-cd", ""),
      1 -> Gen.oneOf("\t", "\n", "  "))
    val sep = Gen.oneOf(" ", " ", " ", "\t", "\n", "  ")
    val textGen: Gen[String] = for {
      n <- Gen.choose(0, 40)
      ws <- Gen.listOfN(n, wordish)
      ss <- Gen.listOfN(n, sep)
      lead <- Gen.oneOf("", " ", "\t")
      trail <- Gen.oneOf("", " ", "\t", "\n")
    } yield lead + ws.zip(ss).map { case (w, s) => w + s }
      .mkString.dropRight(1) + trail
    for (texts <- samples(Gen.listOfN(30, textGen), 12))
      compare(texts)
  }

  test("profile runs inside whole-stage codegen (no fallback)") {
    // range-derived text so ConvertToLocalRelation cannot fold the plan
    val df = spark.range(4)
      .select(concat(lit("the quick brown fox "),
        col("id").cast("string")).as("text"))
      .select(TextStats.profile(col("text")).as("p"))
    // the "*(n)" operator prefix marks whole-stage-codegen membership
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [text_profile"), plan)
    assert(df.collect().forall(_.getStruct(0).getInt(0) === 5))
  }
}
