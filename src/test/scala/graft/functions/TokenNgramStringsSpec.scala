package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.text.NearDup

/** The native token_ngram_strings expression must be byte-identical to
  * the declarative construction it replaced: array_distinct over the
  * slice of the n-1-layer zip_with fold of split(trim(lower(text))).
  * NearDup.shingles (and through it the exact-Jaccard verify path) now
  * runs on the expression, so this equivalence IS the oracle-safety
  * argument for the swap.
  */
class TokenNgramStringsSpec extends SparkSpec {

  import spark.implicits._

  /** The previous declarative form, kept verbatim as the reference. */
  private def foldShingles(text: String, n: Int): Seq[String] = {
    val df = Seq((1L, text)).toDF("id", "t")
    val toks = split(trim(lower(col("t"))), "\\s+")
    val grams = (1 until n).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), size(toks)),
        (a, b) => concat_ws(" ", a, b))
    }
    df.select(array_distinct(
        slice(grams, lit(1), greatest(size(toks) - (n - 1), lit(1))))
      .as("s")).head().getSeq[String](0)
  }

  private def exprShingles(text: String, n: Int): Seq[String] =
    NearDup.shingles(Seq((1L, text)).toDF("id", "t"), "t", n)
      .select(col("__shingles")).head().getSeq[String](0)

  test("matches the zip_with fold on hand-picked edge shapes") {
    val texts = Seq(
      "a b c d e f", "a b c", "a b", "a", "",
      "   ", "a  b   c", " leading and trailing ",
      "dup dup dup dup", "a b a b a b", // duplicate grams
      "Mixed CASE Text", "tab\tseparated\ttokens",
      "newline\nseparated", "unicode tökens ünd möre")
    for (t <- texts; n <- Seq(1, 2, 3, 5, 13)) {
      assert(exprShingles(t, n) === foldShingles(t, n),
        s"text='$t' n=$n")
    }
  }

  test("matches the zip_with fold on random corpora (property)") {
    val word = Gen.oneOf("a", "b", "ab", "xyz", "Dup", "q1", "", "ö")
    val textGen = for {
      k <- Gen.choose(0, 30)
      ws <- Gen.listOfN(k, word)
      sep <- Gen.oneOf(" ", "  ", "\t", "\n", " \t ")
    } yield ws.mkString(sep)
    // deterministic sampling (no scalatest-scalacheck bridge in the
    // offline cache) — same convention as DistributedPrimitivesPropertySpec
    val cases = (1 to 60).flatMap { i =>
      for {
        t <- textGen.apply(Gen.Parameters.default, Seed(2026L + i))
        n <- Gen.choose(1, 6).apply(Gen.Parameters.default, Seed(4052L + i))
      } yield (t, n)
    }
    assert(cases.size >= 55)
    for ((t, n) <- cases)
      assert(exprShingles(t, n) === foldShingles(t, n), s"text='$t' n=$n")
  }

  test("gram count, distinctness, and containment semantics") {
    // nTok >= n: nTok-n+1 windows (pre-distinct)
    assert(exprShingles("a b c d e", 3) ===
      Seq("a b c", "b c d", "c d e"))
    // short doc: one whole-text gram
    assert(exprShingles("a b", 13) === Seq("a b"))
    // prefix-truncation containment (the q_containment_dedup seeding
    // convention): every 3-gram of the prefix is a gram of the source
    val src = exprShingles("w1 w2 w3 w4 w5 w6 w7 w8", 3).toSet
    val pre = exprShingles("w1 w2 w3 w4 w5", 3)
    assert(pre.forall(src.contains))
  }
}
