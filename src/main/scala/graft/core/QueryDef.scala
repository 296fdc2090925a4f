package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark-first implementation plus, when the
  * semantics are ANSI-SQL-expressible, an equivalent DuckDB oracle query the
  * driver hash-compares against at sf0.01.
  *
  * Determinism contract for oracle-checked queries (both sides must obey):
  *   - money / fractional sums go through exact `decimal` intermediates and
  *     are cast to double only once, at the end;
  *   - derived floating stats are computed from exact integer/decimal
  *     components with an identical expression shape, and rounded before any
  *     per-row reuse ("round-stats-then-apply");
  *   - every result is totally ordered by a unique key set;
  *   - ranking keys are exact (ints, decimals, or pre-rounded doubles).
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

trait QueryModule {
  def defs: Map[String, QueryDef]
}
