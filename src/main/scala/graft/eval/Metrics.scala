package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scoring aggregates (SURVEY §2.5 A7-A9): accuracy, confusion matrix and
  * per-class precision/recall/F1, mirroring the reference's
  * `accuracy_score` / `confusion_matrix` / `classification_report`
  * (/root/reference/src/train.py:124, notebook cells 48-51).
  *
  * Each metric is a grouped count over (label, prediction) — a single
  * shuffle of at most |classes|² rows after map-side combine, so cost is a
  * scan regardless of data size.
  */
object Metrics {

  /** A7 — fraction of rows where label == prediction. Exact: integer counts
    * divided once at the end (deterministic across partitionings).
    */
  def accuracy(df: DataFrame, label: String = "label",
      pred: String = "prediction"): DataFrame =
    df.agg(
      (sum(when(col(label) === col(pred), 1L).otherwise(0L)) /
        count(lit(1))).as("accuracy"))

  /** A8 — confusion matrix as (label, prediction, n) rows, totally ordered.
    * Long form scales to any class count; pivot client-side if a 2×2 grid
    * is wanted.
    */
  def confusion(df: DataFrame, label: String = "label",
      pred: String = "prediction"): DataFrame =
    df.groupBy(col(label), col(pred)).agg(count(lit(1)).as("n"))
      .orderBy(col(label), col(pred))

  /** A9 — per-class precision/recall/F1 + support, derived from the
    * confusion counts (one extra tiny shuffle over |classes|² rows).
    */
  def classificationReport(df: DataFrame, label: String = "label",
      pred: String = "prediction"): DataFrame = {
    val cm = df.groupBy(col(label), col(pred)).agg(count(lit(1)).as("n"))
    val byLabel = cm.groupBy(col(label).as("cls"))
      .agg(sum("n").as("support"),
        sum(when(col(label) === col(pred), col("n")).otherwise(0L)).as("tp"))
    val byPred = cm.groupBy(col(pred).as("cls"))
      .agg(sum("n").as("predicted"))
    byLabel.join(byPred, Seq("cls"), "full_outer")
      .na.fill(0L, Seq("support", "tp", "predicted"))
      .select(
        col("cls"),
        col("support"),
        when(col("predicted") === 0L, 0.0)
          .otherwise(col("tp") / col("predicted")).as("precision"),
        when(col("support") === 0L, 0.0)
          .otherwise(col("tp") / col("support")).as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0.0, 0.0)
          .otherwise(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
      .orderBy(col("cls"))
  }
}
