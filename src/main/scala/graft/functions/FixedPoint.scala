package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{concat, lit, raise_error, when}
import org.apache.spark.sql.types.{DecimalType, LongType, StringType}

/** Exact fixed-point arithmetic helpers for oracle-gated queries.
  *
  * The determinism contract (COVERAGE.md header) requires every float
  * the gate sees to be minted exactly once from exact integer
  * intermediates with the same expression shape on both engines.
  * Truncating and flooring division agree on non-negative operands,
  * which is what makes Spark's `div` and DuckDB's `//`
  * interchangeable.
  *
  * All internal arithmetic runs in decimal(38,0), NOT long: the
  * round-10 sf10 sweep caught q_cohens_kappa overflowing long inside
  * the old split-division identity ((a mod b) * scale exceeds 2^63
  * once b*scale does — there b was ~n^2 of a 200k-row table under a
  * 1e9 scale). Decimal(38,0) gives 10^38 of exact headroom, the
  * helpers only ever run on post-aggregation frames (counts and
  * sufficient statistics, never fact-table rows), and the returned
  * column is still LongType, so oracle schemas are unchanged.
  */
object FixedPoint {

  private val D38 = DecimalType(38, 0)

  /** Exact integer division a div b (floor) for non-negative operands:
    * (a - a mod b) is exactly divisible, so the decimal divide is an
    * exact integer — no double rounding above 2^53 and no long
    * overflow below 10^38.
    */
  /** Loud-overflow guard: in non-ANSI mode an out-of-range decimal(38,0)
    * result (or a division by zero) is a silent NULL, which would
    * surface as a null metric instead of a failure (round-10 advice).
    * `expr` null while every input is non-null is exactly that
    * out-of-contract case — raise instead of propagating the null.
    * The helpers run on post-aggregation frames only, so the extra
    * null-checks cost nothing measurable.
    */
  private def guarded(expr: Column, what: String,
      inputs: Column*): Column =
    when(inputs.map(_.isNotNull).reduce(_ && _) && expr.isNull,
      raise_error(concat(lit(s"FixedPoint $what out of contract " +
        "(decimal(38,0) overflow or zero divisor); inputs: "),
        concat(inputs.map(_.cast(StringType)): _*))))
      .otherwise(expr)

  def ldiv(a: Column, b: Column): Column = {
    val ad = a.cast(D38)
    val bd = b.cast(D38)
    guarded((ad - ad.mod(bd)) / bd, "ldiv", a, b).cast(LongType)
  }

  /** floor(scale * a / b) for non-negative operands. a*scale stays in
    * decimal(38,0) — exact up to 10^38, no split-division identity
    * needed (the pre-round-10 long form overflowed at b*scale > 2^63).
    */
  def scaledDiv(a: Column, b: Column, scale: Long): Column =
    ldiv(guarded(a.cast(D38) * lit(scale).cast(D38),
      "scaledDiv product", a), b)
}
