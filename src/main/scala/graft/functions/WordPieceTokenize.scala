package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: WordPiece subword tokenization (greedy
  * longest-match against a fixed vocabulary, `##` continuation prefix —
  * the BERT tokenizer algorithm) for training-budget token accounting
  * and sequence packing over a real subword vocab rather than the
  * whitespace approximation.
  *
  * A real `Expression` with `doGenCode`: the vocab rides the generated
  * code as a referenced object (one HashSet per operator instance, not
  * per row), and the greedy scan runs inside whole-stage codegen with
  * no boxing. Tokenization is a pure per-row function — map-only at any
  * scale, and deterministic: same text + same vocab ⇒ same tokens on
  * every engine, partition, and rerun.
  *
  * Out-of-vocabulary handling matches the reference algorithm: if no
  * prefix of the remaining word (including single characters) is in the
  * vocab, the WHOLE word becomes `[UNK]`. A vocab containing every
  * single character therefore never produces `[UNK]`, which is what the
  * round-trip gate (q_wordpiece) exploits.
  */
case class WordPieceTokenize(child: Expression, vocab: Seq[String])
    extends UnaryExpression {

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"wordpiece_tokenize needs a string child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    WordPieceTokenize.tokenize(input.asInstanceOf[UTF8String], vocabSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val setRef = ctx.addReferenceObj("wpVocab", vocabSet,
      classOf[java.util.HashSet[String]].getName)
    val cls = WordPieceTokenize.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.tokenize($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordPieceTokenize = copy(child = newChild)

  override def prettyName: String = "wordpiece_tokenize"
}

object WordPieceTokenize {

  val Unk = "[UNK]"

  /** Greedy longest-match WordPiece over whitespace-split words. */
  def tokenize(input: UTF8String,
      vocab: java.util.HashSet[String]): ArrayData = {
    val text = input.toString
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    var w0 = 0
    val n = text.length
    while (w0 < n) {
      while (w0 < n && Character.isWhitespace(text.charAt(w0))) w0 += 1
      if (w0 < n) {
        var w1 = w0
        while (w1 < n && !Character.isWhitespace(text.charAt(w1))) w1 += 1
        tokenizeWord(text, w0, w1, vocab, out)
        w0 = w1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  private def tokenizeWord(text: String, start: Int, end: Int,
      vocab: java.util.HashSet[String],
      out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    var i = start
    val word = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    while (i < end) {
      // longest vocab entry starting at i ("##"-prefixed after the first
      // piece, per the WordPiece continuation convention)
      var j = end
      var hit: String = null
      while (j > i && hit == null) {
        val cand =
          if (i == start) text.substring(i, j)
          else "##" + text.substring(i, j)
        if (vocab.contains(cand)) hit = cand else j -= 1
      }
      if (hit == null) {
        // whole-word UNK, reference semantics
        out += UTF8String.fromString(Unk)
        return
      }
      word += UTF8String.fromString(hit)
      i = j
    }
    out ++= word
  }

  def wordpiece_tokenize(c: Column, vocab: Seq[String]): Column =
    GraftColumnBridge.column(
      WordPieceTokenize(GraftColumnBridge.expression(c), vocab))
}
