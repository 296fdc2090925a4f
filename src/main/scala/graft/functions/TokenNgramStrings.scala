package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct space-joined token n-grams from a
  * token ARRAY — the STRING twin of [[TokenNgramHashes]], for consumers
  * that need human-readable grams (exact Jaccard verification reads
  * `array_intersect` over them; reference behavior
  * big_data_lab_three-style dedup reports gram text).
  *
  * The declarative construction (an n-1-layer `zip_with` fold of the
  * token array with its own shifted suffixes) evaluates interpreted
  * lambdas per element per layer — higher-order functions never enter
  * whole-stage codegen, and at sf10 a single such pass is the hottest
  * remaining interpreted loop in the near-dup family. This expression
  * does one fused JVM loop per row (window-join tokens → first-occurrence
  * dedup) inside codegen.
  *
  * Semantics are EXACTLY `array_distinct(slice(fold, 1,
  * greatest(size(toks)-(n-1), 1)))` over the zip_with fold (property-
  * tested equivalent in TokenNgramStringsSpec):
  *  - nTok >= n   -> nTok-n+1 grams, gram i = toks(i..i+n-1) joined " ";
  *  - 1 <= nTok < n -> ONE gram of all tokens;
  *  - duplicates keep first occurrence (array_distinct order);
  *  - tokenization itself stays declarative at the call site
  *    (`split(trim(lower(text)), "\\s+")`) so Spark's regex semantics —
  *    leading-empty tokens, limit -1 trailing behavior — are inherited,
  *    not re-implemented.
  */
case class TokenNgramStrings(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if n >= 1 =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"token_ngram_strings needs an array<string> child and " +
              s"n >= 1, got $other, n=$n")
    }

  override def nullSafeEval(input: Any): Any =
    TokenNgramStrings.grams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = TokenNgramStrings.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.grams($c, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TokenNgramStrings = copy(child = newChild)

  override def prettyName: String = "token_ngram_strings"
}

object TokenNgramStrings {

  private val Space = UTF8String.fromString(" ")

  /** First-occurrence-distinct n-gram strings; called from interpreted
    * eval and generated code. Tokens may contain nulls in principle
    * (concat_ws semantics: nulls are skipped), though `split` never
    * produces them.
    */
  def grams(toks: ArrayData, n: Int): GenericArrayData = {
    val nTok = toks.numElements()
    if (nTok == 0) return new GenericArrayData(new Array[Any](0))
    val nGrams = math.max(nTok - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](nGrams * 2)
    val window = new Array[UTF8String](n)
    var g = 0
    while (g < nGrams) {
      val end = math.min(g + n, nTok)
      var j = g
      var w = 0
      while (j < end) {
        val t = toks.getUTF8String(j)
        if (t != null) { window(w) = t; w += 1 }
        j += 1
      }
      val gram =
        // clone the single-token path: a UTF8String read from
        // UnsafeArrayData aliases a row buffer that codegen reuses for
        // the next row; concatWs already allocates fresh bytes
        if (w == 1) window(0).clone()
        else UTF8String.concatWs(Space,
          java.util.Arrays.copyOfRange(window, 0, w): _*)
      seen.add(gram)
      g += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Column-level entry point: `tokens` must be array<string>. */
  def token_ngram_strings(tokens: Column, n: Int): Column =
    GraftColumnBridge.column(
      TokenNgramStrings(GraftColumnBridge.expression(tokens), n))
}
