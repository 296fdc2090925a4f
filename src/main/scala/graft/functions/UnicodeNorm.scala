package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization for corpus text.
  *
  * Spark ships no normalization builtin, yet it's the first step of any
  * multilingual curation pipeline (mixed NFC/NFD sources hash-split the
  * same logical document — exact dedup, shingle hashes, and fingerprints
  * all diverge on byte-different equal text). Modes:
  *
  *   - `nfc`   — canonical composition (the storage canon form)
  *   - `nfkc`  — compatibility composition (ligatures/width folds, the
  *               usual tokenizer pre-pass)
  *   - `strip_accents` — NFD + drop combining marks (café→cafe); matches
  *               DuckDB's `strip_accents` on composed input, which is
  *               what the oracle gate checks
  *
  * A real `Expression` with `doGenCode` (not a Scala UDF): the call runs
  * inside whole-stage codegen with no boxing or Row serialization. The
  * JDK normalizer allocates only when the input actually changes —
  * `Normalizer.isNormalized` short-circuits the (overwhelmingly common
  * at 100 TB) already-normal case to a scan.
  */
case class UnicodeNorm(child: Expression, mode: String)
    extends UnaryExpression {

  require(UnicodeNorm.Modes.contains(mode),
    s"unicode_norm mode must be one of ${UnicodeNorm.Modes}, got $mode")

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"unicode_norm needs a string child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UnicodeNorm.normalize(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = UnicodeNorm.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"""$cls.normalize($c, "$mode")""")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : UnicodeNorm = copy(child = newChild)

  override def prettyName: String = "unicode_norm"
}

object UnicodeNorm {

  val Modes: Set[String] = Set("nfc", "nfkc", "strip_accents")

  /** Entry point for both interpreted eval and generated code. */
  def normalize(input: UTF8String, mode: String): UTF8String = {
    val s = input.toString
    val out = mode match {
      case "nfc" =>
        if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) return input
        Normalizer.normalize(s, Normalizer.Form.NFC)
      case "nfkc" =>
        if (Normalizer.isNormalized(s, Normalizer.Form.NFKC)) return input
        Normalizer.normalize(s, Normalizer.Form.NFKC)
      case "strip_accents" =>
        val d = Normalizer.normalize(s, Normalizer.Form.NFD)
        if (d.indexWhere(c => Character.getType(c) ==
            Character.NON_SPACING_MARK) < 0 &&
            Normalizer.isNormalized(s, Normalizer.Form.NFC)) return input
        // recompose: DuckDB strip_accents = NFC(dropMn(NFD(s))) —
        // verified at codepoint level (Hangul round-trips composed)
        Normalizer.normalize(stripMarks(d), Normalizer.Form.NFC)
      case other =>
        throw new IllegalArgumentException(s"unknown mode $other")
    }
    UTF8String.fromString(out)
  }

  /** Drop combining marks (Mn) from NFD text — DuckDB strip_accents
    * semantics (ß and ligatures survive: they are letters, not marks).
    */
  private def stripMarks(d: String): String = {
    val b = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) b.append(c)
      i += 1
    }
    b.toString
  }

  def unicode_norm(c: Column, mode: String): Column =
    GraftColumnBridge.column(
      UnicodeNorm(GraftColumnBridge.expression(c), mode))
}
