package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec,
  ShuffleExchangeLike}

/** Post-execution plan accounting: what a query actually read and
  * shuffled, straight from the executed plan's SQLMetrics. This is the
  * ops-side complement to PlanAuditSpec — the audit pins plan SHAPES
  * pre-execution; this reports realized VOLUMES, which is what capacity
  * planning and regression triage consume at 100 TB ("did this round's
  * change double shuffle bytes?" is answerable from bench_full.json
  * alone, no Spark UI required).
  *
  * Scope caveat: the profile covers the FINAL action's plan. Operators
  * that materialize intermediate actions while building their result
  * (the connected-components loop's per-round localCheckpoints, model
  * fits) contribute only their last job's volumes here — their
  * intermediate shuffles show up in the timing, not in this accounting.
  */
object QueryMetrics {

  final case class PlanProfile(scanRows: Long, shuffleBytes: Long,
      nShuffles: Int)

  /** Execute `df` via the noop sink (same materialization Bench times)
    * and return realized scan/shuffle totals from the final adaptive
    * plan. Reused exchanges are counted once (their metrics live on the
    * original node).
    *
    * The write runs its OWN QueryExecution (df.queryExecution is a
    * separate, never-executed plan), so the executed plan is captured
    * through a QueryExecutionListener; the listener bus is async, hence
    * the bounded poll.
    */
  def profile(df: DataFrame): PlanProfile = {
    val spark = df.sparkSession
    val captured =
      new java.util.concurrent.ArrayBlockingQueue[
        org.apache.spark.sql.execution.QueryExecution](4)
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = { captured.offer(qe); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val qe = try {
      df.write.format("noop").mode("overwrite").save()
      val got = captured.poll(30, java.util.concurrent.TimeUnit.SECONDS)
      require(got != null, "query-execution event not observed within 30s")
      got
    } finally spark.listenerManager.unregister(listener)
    val all = collectAll(qe.executedPlan)
    val scanRows = all.collect {
      case p if p.nodeName.contains("Scan") =>
        p.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
    }.sum
    val shuffles = all.collect {
      case s: ShuffleExchangeLike => s
    }
    val shuffleBytes = shuffles
      .map(_.metrics.get("shuffleBytesWritten").map(_.value).getOrElse(0L))
      .sum
    PlanProfile(scanRows, shuffleBytes, shuffles.size)
  }

  /** Recursive walk that crosses AQE boundaries (final adaptive plan,
    * materialized query stages) and skips reused-exchange duplicates.
    */
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val children = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _: ReusedExchangeExec => Seq.empty
      case other => other.children
    }
    p +: children.flatMap(collectAll)
  }
}
