package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Rabin-Karp rolling-hash document
  * fingerprint — the minimum mixed hash over all k-byte windows of the
  * UTF-8 text (winnowing-style representative; equal documents always
  * agree, and documents sharing most content usually agree because the
  * minimizing window is likely shared).
  *
  * Implemented as a real `Expression` with `doGenCode` (not a Scala UDF):
  * the generated loop runs inside whole-stage codegen with zero
  * boxing/serialization per row — on a 100 TB corpus this is the
  * difference between a fingerprint pass bounded by IO and one bounded by
  * UDF overhead.
  */
case class RollingFingerprint(child: Expression, k: Int = 16)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_fingerprint needs a string child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    RollingFingerprint.fingerprint(bytes, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = RollingFingerprint.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev,
      c => s"$cls.fingerprint($c.getBytes(), $k)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : RollingFingerprint = copy(child = newChild)

  override def prettyName: String = "rolling_fingerprint"
}

object RollingFingerprint {

  private final val Base = 1000000007L

  /** splitmix64 finalizer — decorrelates the weak polynomial hash. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Min mixed Rabin-Karp hash over all k-byte windows (whole-text hash if
    * shorter than k). Called from both interpreted eval and generated code.
    */
  def fingerprint(bytes: Array[Byte], k: Int): Long = {
    val n = bytes.length
    if (n == 0) return mix(0L)
    val w = math.min(k, n)
    // pow = Base^(w-1) for the outgoing byte
    var pow = 1L
    var i = 1
    while (i < w) { pow *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + (bytes(i) & 0xFF); i += 1 }
    var min = mix(h)
    i = w
    while (i < n) {
      h = (h - (bytes(i - w) & 0xFF) * pow) * Base + (bytes(i) & 0xFF)
      val m = mix(h)
      if (m < min) min = m
      i += 1
    }
    min
  }

  /** Column-level entry point. */
  def rolling_fingerprint(c: Column, k: Int = 16): Column =
    GraftColumnBridge.column(
      RollingFingerprint(GraftColumnBridge.expression(c), k))
}
