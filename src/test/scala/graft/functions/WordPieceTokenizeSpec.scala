package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WordPieceTokenizeSpec extends SparkSpec {

  import spark.implicits._
  import WordPieceTokenize.wordpiece_tokenize

  private val vocab = Seq("un", "want", "##want", "##ed", "ed",
    "run", "##ning", "a", "b", "c")

  private def run(texts: String*): Seq[Seq[String]] =
    texts.toDF("t")
      .select(wordpiece_tokenize(col("t"), vocab))
      .as[Seq[String]].collect().toSeq

  test("greedy longest-match with ## continuation (BERT example)") {
    assert(run("unwanted running") ===
      Seq(Seq("un", "##want", "##ed", "run", "##ning")))
  }

  test("whole word becomes [UNK] when any position has no vocab match") {
    // 'x' is not in the vocab: the whole word collapses, pieces already
    // matched are discarded (reference semantics). "abc" also collapses:
    // continuations need the ## forms, which this vocab lacks.
    assert(run("unxed abc", "a b c") ===
      Seq(Seq("[UNK]", "[UNK]"), Seq("a", "b", "c")))
  }

  test("empty and whitespace-only inputs tokenize to empty arrays") {
    assert(run("", "   ") === Seq(Seq(), Seq()))
  }

  test("interpreted eval agrees with codegen") {
    val s = new java.util.HashSet[String]()
    vocab.foreach(s.add)
    val arr = WordPieceTokenize.tokenize(
      org.apache.spark.unsafe.types.UTF8String.fromString("unwanted"), s)
    assert(arr.numElements() === 3)
    assert(arr.getUTF8String(0).toString === "un")
  }
}
