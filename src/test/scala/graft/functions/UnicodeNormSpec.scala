package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnicodeNormSpec extends SparkSpec {

  import spark.implicits._
  import UnicodeNorm.unicode_norm

  private def run(mode: String, ss: String*): Seq[String] =
    ss.toDF("s").select(unicode_norm(col("s"), mode)).as[String].collect()
      .toSeq

  test("nfc composes combining sequences and is identity on NFC text") {
    // "Cafe" + combining acute (U+0301) must compose to the precomposed
    // form; already-composed and ASCII text pass through unchanged
    assert(run("nfc", "Café", "Café", "plain ascii") ===
      Seq("Café", "Café", "plain ascii"))
  }

  test("nfkc folds compatibility forms (ligatures, width, circled)") {
    assert(run("nfkc", "ﬁre", "ｆｕｌｌ", "①") ===
      Seq("fire", "full", "1"))
  }

  test("strip_accents drops marks, keeps non-mark letters, recomposes") {
    // ß and the ligature are letters, not marks (DuckDB parity);
    // decomposed Hangul jamo must come back COMPOSED (NFC after strip)
    assert(run("strip_accents",
      "Café NAÏVE wörld", "Straße ﬁre", "가", "été") ===
      Seq("Cafe NAIVE world", "Straße ﬁre", "가", "ete"))
  }

  test("null-safe and consistent between codegen and interpreted eval") {
    val df = Seq(Some("Café"), None).toDF("s")
    val viaCodegen = df.select(unicode_norm(col("s"), "nfc")).collect()
    assert(viaCodegen.map(r => if (r.isNullAt(0)) null else r.getString(0))
      .toSeq === Seq("Café", null))
    // interpreted path (no codegen) must agree
    val e = UnicodeNorm.normalize(
      org.apache.spark.unsafe.types.UTF8String.fromString("Café"),
      "nfc")
    assert(e.toString === "Café")
  }

  test("invalid mode is rejected at construction") {
    intercept[IllegalArgumentException] {
      unicode_norm(col("s"), "nfd-ish")
    }
  }
}
