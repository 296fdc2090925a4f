package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's Column ⇄ Expression converters, which became
  * `private[sql]` in Spark 4 (they were the public `new Column(expr)` /
  * `col.expr` surface in Spark 3). Needed to expose native Catalyst
  * expressions (e.g. graft.functions.RollingFingerprint) as composable
  * `Column`s.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
