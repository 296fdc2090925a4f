package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{
  CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two numeric arrays in
  * a single fused loop (dot product + both norms), with `doGenCode` so the
  * whole computation stays inside whole-stage codegen.
  *
  * This is the hot inner operation of the similarity-search / semantic
  * dedup family (`graft.sim.Ann`). The declarative alternative —
  * `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)` — allocates a zipped
  * array per row and evaluates the lambda per element through Catalyst's
  * interpreted HigherOrderFunction path; at 100 TB × hundreds of
  * dimensions that overhead dominates the scan. The fused loop is one
  * branch-free pass over the two arrays with no per-element boxing.
  *
  * Accumulation order matches the naive sequential sum (index 0..n-1), so
  * results are bit-identical to the HOF formulation and to DuckDB's
  * `list_dot_product` on double lists — which keeps cosine queries
  * oracle-checkable (QueryDef determinism contract).
  *
  * Semantics: null if either input is null; NaN if lengths differ, a
  * null element is encountered, or either norm is zero. (The HOF
  * formulation propagates element nulls to a null result; this
  * expression signals the same degenerate cases through NaN so the
  * result stays non-nullable — the bit-identical claim holds for dense
  * arrays, asserted in VectorMathSpec.)
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left).isDefined && elemType(right).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"cosine_sim needs array<float|double> children, got " +
          s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  private def isFloat(e: Expression): Boolean =
    elemType(e).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.cosine(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = VectorMath.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev,
      (a, b) => s"$cls.cosine($a, ${isFloat(left)}, $b, ${isFloat(right)})")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_sim"
}

/** Native Catalyst expression: squared L2 distance of two long arrays in
  * one fused loop — the hot inner operation of the exact-integer
  * quantized-vector family (`Ann.pqTopK` codebook train/encode/ADC
  * tables, `q_kmeans_lloyd` assignment). The declarative form —
  * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, _+_)` — pays the
  * interpreted HigherOrderFunction path per element plus a zipped-array
  * allocation per row; this is one branch-free long loop inside
  * whole-stage codegen. Integer arithmetic is associative, so the result
  * is bit-identical to the HOF form (asserted in VectorMathSpec).
  *
  * Semantics: null if either input is null; throws on length mismatch or
  * null elements (the quantized pipelines construct dense equal-length
  * arrays by construction — a mismatch is a bug, not data).
  */
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private def ok(e: Expression): Boolean = e.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_dist_long needs array<bigint> children, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.sqDistLong(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = VectorMath.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (a, b) => s"$cls.sqDistLong($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sq_dist_long"
}

object VectorMath {

  /** Fused squared-L2 over long arrays; called from interpreted eval and
    * generated code.
    */
  def sqDistLong(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"sq_dist_long: length mismatch $n vs ${b.numElements()}")
    var acc = 0L
    var i = 0
    while (i < n) {
      // ArrayData.getLong on a null slot silently reads 0 — that would
      // turn a sparse array into a WRONG distance instead of an error,
      // so nulls must fail loudly here (the doc'd contract); the branch
      // is perfectly predicted on the dense arrays the pipelines build
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"sq_dist_long: null element at index $i — inputs must be dense")
      val d = a.getLong(i) - b.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Column-level entry point for [[SqDistLong]]. */
  def sq_dist_long(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      SqDistLong(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))

  /** Fused dot + norms cosine; called from interpreted eval and generated
    * code. Sequential accumulation (see class doc for why the order is
    * load-bearing).
    */
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData,
      bFloat: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements()) return Double.NaN
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Column-level entry point. */
  def cosine_sim(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      CosineSimilarity(GraftColumnBridge.expression(a),
        GraftColumnBridge.expression(b)))
}
