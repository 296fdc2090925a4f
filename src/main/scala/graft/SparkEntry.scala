package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, QueryDef, QueryModule, Tables}
import graft.etl.Preprocess
import graft.queries.{AnalyticsQueries, BehaviorQueries,
  CompositionQueries, CorpusQueries, EtlQueries, EvalQueries, LlmQueries,
  MiningQueries, MlQueries, PipelineQueries, TpchQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries/oracles are derived from the QueryModule registry so the engine
  * has a single source of truth (QueryDef) and the two maps cannot drift.
  */
object SparkEntry {

  /** All query modules; each contributes oracle-checked and rows-only
    * queries. Extend here as modules land.
    */
  def modules: Seq[QueryModule] =
    Seq(EtlQueries, MlQueries, LlmQueries, TpchQueries, CorpusQueries,
      AnalyticsQueries, PipelineQueries, BehaviorQueries, MiningQueries,
      EvalQueries, CompositionQueries)

  lazy val registry: Map[String, QueryDef] =
    modules.flatMap(_.defs).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mirrors the reference's preprocess→aggregate spine (preprocess.py:60-90
    * feeding the label histogram of notebook cell 43): derive a rate,
    * normalize ±inf→null, CASE-derive a label, aggregate per class.
    */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.ensureConfigured(spark)
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem")
      .withColumn("rate",
        when(col("l_quantity") > 45, lit(Double.PositiveInfinity))
          .otherwise(col("l_extendedprice") / col("l_quantity")))
    val cleaned = Preprocess.infToNull(li, Seq("rate"))
    Preprocess.deriveLabel(cleaned, "l_returnflag", "R", "state")
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n"), avg(col("rate")).as("avg_rate"))
      .orderBy(col("state"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, d) => k -> d.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registry.collect { case (k, QueryDef(_, Some(sql), _)) => k -> sql }
}
