package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField,
  StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: every per-document text statistic the
  * curation family needs, from ONE tokenize pass per row.
  *
  * Motivation (round-7 verdict #5): q_corpus_curation stacked four
  * separate TextStats column trees — langId, qualityScore, tokenCount,
  * plus the Gopher repetition pair elsewhere — and EACH re-split the
  * same text (plus interpreted higher-order `filter`/`aggregate` lambdas
  * that never enter codegen), making the text family tokenize-bound at
  * scale (sf1's slowest query at 6.3 s). This expression walks the text
  * once inside whole-stage codegen and returns all the integer
  * primitives; the public TextStats surface derives its doubles/argmax
  * from the struct with cheap arithmetic, bit-identically to the
  * declarative forms (TextProfileSpec property-tests the equivalence on
  * random strings, including whitespace/unicode/empty edge shapes).
  *
  * Struct fields (all non-null ints):
  *  - n_tokens:   size(split(trim(text), "\\s+")) — Java split semantics
  *    with limit -1: leading empty token if the trimmed text starts with
  *    non-space whitespace, trailing empty token likewise, [""] for
  *    empty text;
  *  - stop_count: tokens of trim(lower(text)) in TextStats.stopwords;
  *  - punct_count: chars of the RAW text not matching [a-z0-9\\s];
  *  - n_chars:    length(text);
  *  - n_distinct: distinct tokens of trim(lower(text));
  *  - top_count:  max multiplicity of any token of trim(lower(text));
  *  - de/en/es/fr: marker-token hits per TextStats.langProfiles;
  *  - regex_tokens: matches of [a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s] in the
  *    RAW text.
  *
  * Tokenization walks UTF-8 bytes directly: the separator class (Java
  * regex \s = ASCII [ \t\n\x0B\f\r]) is ASCII-only and multibyte UTF-8
  * units never contain ASCII bytes, so byte scanning is exact. Lowering
  * and trimming call the SAME UTF8String methods Spark's Lower/
  * StringTrim use, so case/space handling cannot diverge.
  */
case class TextProfile(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TextProfile.schema

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"text_profile needs a string child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    TextProfile.profile(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = TextProfile.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.profile($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : TextProfile = copy(child = newChild)

  override def prettyName: String = "text_profile"
}

object TextProfile {

  val schema: StructType = StructType(Seq(
    "n_tokens", "stop_count", "punct_count", "n_chars", "n_distinct",
    "top_count", "de", "en", "es", "fr", "regex_tokens",
    // raw-case metrics (the Gopher rule battery works on the UNlowered
    // text): code points not matching \s; tokens of trim(text)
    // containing >= 1 lowercase ASCII letter; tokens of trim(text) in
    // the stopword set case-SENSITIVELY
    "nonws_chars", "alpha_tokens", "raw_stop_count")
    .map(StructField(_, IntegerType, nullable = false)))

  // marker sets in langProfiles key order (de, en, es, fr) — kept in
  // sync with TextStats by TextProfileSpec
  private val langSets: Array[java.util.HashSet[String]] = {
    val m = graft.text.TextStats.langProfiles
    Array("de", "en", "es", "fr").map { l =>
      val s = new java.util.HashSet[String]()
      m(l).foreach(s.add)
      s
    }
  }

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.text.TextStats.stopwords.foreach(s.add)
    s
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' ||
      b == '\r'

  private def isWsChar(c: Int): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' ||
      c == '\r'

  /** All stats from single scans; called from interpreted eval and
    * generated code.
    */
  def profile(text: UTF8String): InternalRow = {
    // ---- raw-text scan: n_chars, punct_count, regex_tokens ----
    // per CODE POINT, exactly like length()/regexp_* (Java regex matches
    // astral chars as single code points; UTF8String counts them as one
    // char). The separator/char classes are all ASCII, so any non-ASCII
    // code point is "punct" and a standalone regex token.
    val raw = text.toString
    val rawLen = raw.length
    var nChars = 0
    var punct = 0
    var regexToks = 0
    var nonWs = 0
    var i = 0
    var prevClass = -1 // 0=alpha 1=digit 2=other (for run grouping)
    while (i < rawLen) {
      val cp = raw.codePointAt(i)
      i += Character.charCount(cp)
      nChars += 1
      val cls =
        if ((cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')) 0
        else if (cp >= '0' && cp <= '9') 1
        else if (isWsChar(cp)) 3
        else 2
      if (cls != 3) nonWs += 1
      if (cls != 3 && !(cp >= 'a' && cp <= 'z') && cls != 1) punct += 1
      // [a-zA-Z]+ and [0-9]+ count once per run; other non-space chars
      // count one each; whitespace breaks runs and counts nothing
      if (cls == 2) regexToks += 1
      else if ((cls == 0 || cls == 1) && cls != prevClass) regexToks += 1
      prevClass = cls
    }
    // ---- raw-case token scan over trim(text) (NOT lowered: token
    // boundaries match the lowered scan, but byte spans can differ —
    // some unicode lowercasings change length — so scan raw bytes
    // separately) ----
    val rawTrim = text.trim()
    val rbytes = rawTrim.getBytes
    val rlen = rbytes.length
    var alphaToks = 0
    var rawStop = 0
    def emitRaw(from: Int, until: Int): Unit = {
      var hasAlpha = false
      var p = from
      while (p < until && !hasAlpha) {
        if (rbytes(p) >= 'a' && rbytes(p) <= 'z') hasAlpha = true
        p += 1
      }
      if (hasAlpha) alphaToks += 1
      val tok = new String(rbytes, from, until - from,
        java.nio.charset.StandardCharsets.UTF_8)
      if (stopSet.contains(tok)) rawStop += 1
    }
    var rs = 0
    var rj = 0
    while (rj < rlen) {
      if (isWs(rbytes(rj))) {
        emitRaw(rs, rj)
        while (rj < rlen && isWs(rbytes(rj))) rj += 1
        rs = rj
      } else rj += 1
    }
    emitRaw(rs, rlen)
    // ---- token scan over trim(lower(text)), Java split(\s+, -1) ----
    // tokens are the substrings between separator runs, INCLUDING a
    // leading empty token when the trimmed text starts with non-space
    // whitespace and a trailing empty token when it ends with one
    // (limit -1 keeps trailing empties); empty text yields [""].
    val lowered = text.toLowerCase.trim()
    val bytes = lowered.getBytes
    val len = bytes.length
    var nTok = 0
    var stop = 0
    val lang = new Array[Int](4)
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    def emit(from: Int, until: Int): Unit = {
      val tok = new String(bytes, from, until - from,
        java.nio.charset.StandardCharsets.UTF_8)
      nTok += 1
      if (stopSet.contains(tok)) stop += 1
      var l = 0
      while (l < 4) { if (langSets(l).contains(tok)) lang(l) += 1; l += 1 }
      val c: Integer = counts.merge(tok, 1,
        (a: Integer, b: Integer) => Integer.valueOf(a + b))
      if (c > top) top = c
    }
    var start = 0
    var j = 0
    while (j < len) {
      if (isWs(bytes(j))) {
        emit(start, j)
        while (j < len && isWs(bytes(j))) j += 1
        start = j
      } else j += 1
    }
    emit(start, len) // final token; "" when text ends with a separator
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, stop, punct, nChars, counts.size(), top,
        lang(0), lang(1), lang(2), lang(3), regexToks,
        nonWs, alphaToks, rawStop))
  }

  /** Column-level entry point: one struct of all per-doc primitives. */
  def text_profile(c: Column): Column =
    GraftColumnBridge.column(TextProfile(GraftColumnBridge.expression(c)))
}
