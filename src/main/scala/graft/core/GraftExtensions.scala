package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, RollingFingerprint, SqDistLong,
  UnicodeNorm, WordPieceTokenize}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions into the SQL function registry so `spark.sql` queries can
  * call them directly:
  *
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)   // or
  *     .config("spark.sql.extensions", "graft.core.GraftExtensions")
  * }}}
  *
  * then `SELECT rolling_fingerprint(text), rolling_fingerprint(text, 32)
  * FROM docs`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.rollingFingerprintDescriptor)
    ext.injectFunction(GraftExtensions.cosineSimDescriptor)
    ext.injectFunction(GraftExtensions.sqDistLongDescriptor)
    ext.injectFunction(GraftExtensions.unicodeNormDescriptor)
    ext.injectFunction(GraftExtensions.wordpieceDescriptor)
  }
}

object GraftExtensions {

  /** (name, info, builder) descriptor for injectFunction. */
  val rollingFingerprintDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("rolling_fingerprint"),
    new ExpressionInfo(classOf[RollingFingerprint].getName,
      "rolling_fingerprint"),
    (children: Seq[Expression]) => children match {
      case Seq(text) => RollingFingerprint(text)
      case Seq(text, k) =>
        RollingFingerprint(text,
          k.eval().asInstanceOf[Number].intValue())
      case _ => throw new IllegalArgumentException(
        "rolling_fingerprint(text[, k]) takes 1 or 2 arguments")
    })

  /** cosine_sim(a, b) over array<float|double> columns. */
  val cosineSimDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => CosineSimilarity(a, b)
      case _ => throw new IllegalArgumentException(
        "cosine_sim(a, b) takes exactly 2 arguments")
    })

  /** sq_dist_long(a, b) over array<bigint> columns. */
  val sqDistLongDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("sq_dist_long"),
    new ExpressionInfo(classOf[SqDistLong].getName, "sq_dist_long"),
    (children: Seq[Expression]) => children match {
      case Seq(a, b) => SqDistLong(a, b)
      case _ => throw new IllegalArgumentException(
        "sq_dist_long(a, b) takes exactly 2 arguments")
    })

  /** unicode_norm(text, 'nfc'|'nfkc'|'strip_accents'). */
  val unicodeNormDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("unicode_norm"),
    new ExpressionInfo(classOf[UnicodeNorm].getName, "unicode_norm"),
    (children: Seq[Expression]) => children match {
      case Seq(text, mode) =>
        UnicodeNorm(text, mode.eval().toString)
      case _ => throw new IllegalArgumentException(
        "unicode_norm(text, mode) takes exactly 2 arguments")
    })

  /** wordpiece_tokenize(text, array('piece', ...)). */
  val wordpieceDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("wordpiece_tokenize"),
    new ExpressionInfo(classOf[WordPieceTokenize].getName,
      "wordpiece_tokenize"),
    (children: Seq[Expression]) => children match {
      case Seq(text, vocab) =>
        val arr = vocab.eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        WordPieceTokenize(text,
          (0 until arr.numElements()).map(arr.getUTF8String(_).toString))
      case _ => throw new IllegalArgumentException(
        "wordpiece_tokenize(text, vocab_array) takes exactly 2 arguments")
    })

  private def descriptors = Seq(rollingFingerprintDescriptor,
    cosineSimDescriptor, sqDistLongDescriptor, unicodeNormDescriptor,
    wordpieceDescriptor)

  /** Imperative registration for sessions created without extensions
    * (tests, notebooks).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }
}
