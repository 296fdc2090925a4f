package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.RollingFingerprint

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

  /** Imperative registration for sessions created without extensions
    * (tests, notebooks).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val (id, info, builder) = rollingFingerprintDescriptor
    spark.sessionState.functionRegistry
      .registerFunction(id, info, builder)
  }
}
