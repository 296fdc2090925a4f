package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.LongType

/** Exact fixed-point arithmetic helpers for oracle-gated queries.
  *
  * The determinism contract (COVERAGE.md header) requires every float
  * the gate sees to be minted exactly once from exact integer
  * intermediates with the same expression shape on both engines. These
  * helpers keep ratio-minting inside long arithmetic: truncating and
  * flooring division agree on non-negative operands, which is what
  * makes Spark's `div` and DuckDB's `//` interchangeable.
  */
object FixedPoint {

  /** Exact long integer division a div b for non-negative operands:
    * (a - a mod b) is exactly divisible, so the decimal divide is an
    * exact integer — no double rounding above 2^53.
    */
  def ldiv(a: Column, b: Column): Column =
    ((a - a.mod(b)).cast("decimal(38,0)") / b.cast("decimal(38,0)"))
      .cast(LongType)

  /** floor(scale * a / b) for non-negative long columns without leaving
    * exact integer arithmetic: (a div b)*scale + ((a mod b)*scale) div b
    * — no intermediate exceeds b*scale.
    */
  def scaledDiv(a: Column, b: Column, scale: Long): Column =
    ldiv(a, b) * scale + ldiv(a.mod(b) * scale, b)
}
