package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native mergeable Count-Min sketch aggregate: one pass over a token
  * column builds a depth×width counter matrix; `eval` returns the CMS
  * point estimates for a fixed probe-term list.
  *
  * Why an aggregate and not explode+groupBy: at 100 TB the exact
  * heavy-hitter count shuffles |distinct| rows; the sketch reduces each
  * partition to a fixed 256 KB buffer (4×8192 longs) that merges by
  * ELEMENTWISE SUM —
  * commutative and associative, so results are bit-identical at any
  * partitioning or merge order (unlike SpaceSaving-style top-k buffers,
  * whose contents depend on arrival order). Estimates carry the standard
  * guarantees: never below the true count, above it by more than
  * 2N/width with probability ≤ (1/2)^depth per probe.
  *
  * Mirrors the role of Spark's `DataFrame.stat.countMinSketch` (a
  * driver-side sketch) as a composable in-plan expression instead.
  */
case class CountMinSketchAgg(
    child: Expression,
    probes: Seq[String],
    depth: Int = 4,
    width: Int = 8192,
    seed: Long = 42L,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(
            s"cms_estimates needs a string child, got ${other.simpleString}")
    }

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  private def bucket(s: UTF8String, d: Int): Int = {
    val h = XxHash64Function.hash(s, StringType, seed + d)
    (((h % width) + width) % width).toInt
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var d = 0
      while (d < depth) {
        buf(d * width + bucket(s, d)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val ests = probes.map { p =>
      val s = UTF8String.fromString(p)
      var mn = Long.MaxValue
      var d = 0
      while (d < depth) {
        val c = buf(d * width + bucket(s, d))
        if (c < mn) mn = c
        d += 1
      }
      mn
    }
    new GenericArrayData(ests.toArray)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int)
      : CountMinSketchAgg = copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int)
      : CountMinSketchAgg = copy(inputAggBufferOffset = offset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketchAgg =
    copy(child = newChildren.head)

  override def prettyName: String = "cms_estimates"
}

object CountMinSketchAgg {

  /** Column API: CMS estimates (array<long>, aligned with `probes`) of
    * the probe terms' frequencies in `tokens`.
    */
  def cms_estimates(tokens: Column, probes: Seq[String], depth: Int = 4,
      width: Int = 8192): Column =
    GraftColumnBridge.column(
      CountMinSketchAgg(GraftColumnBridge.expression(tokens), probes,
        depth, width).toAggregateExpression())
}
