package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.feature.{Imputer, StandardScaler, VectorAssembler}
import org.apache.spark.sql.DataFrame

/** L1 — the reference's preprocessing pipeline re-expressed as spark.ml
  * stages: mean-impute → assemble → standardize
  * (reference /root/reference/src/train.py:61-66 `SimpleImputer(mean)` +
  * `StandardScaler` fit; persisted with the feature list at train.py:98).
  *
  * All three stages are single-pass fitted transforms; at scale the fit
  * costs two scans (impute means, scaler stats) and transform is a narrow
  * map — no shuffle.
  */
object PrepPipeline {

  val FeaturesCol = "features"

  /** Build the unfit pipeline over the given numeric feature columns.
    *
    * @param imputeStrategy "mean" (reference default), "median" or "mode"
    * @param withMean       center to zero mean (sklearn StandardScaler
    *                       default; dense output)
    */
  def build(featureCols: Seq[String], imputeStrategy: String = "mean",
      withMean: Boolean = true, withStd: Boolean = true): Pipeline = {
    val imputed = featureCols.map(c => s"imp_$c")
    val imputer = new Imputer()
      .setStrategy(imputeStrategy)
      .setInputCols(featureCols.toArray)
      .setOutputCols(imputed.toArray)
    val assembler = new VectorAssembler()
      .setInputCols(imputed.toArray)
      .setOutputCol("assembled")
      .setHandleInvalid("keep")
    val scaler = new StandardScaler()
      .setInputCol("assembled")
      .setOutputCol(FeaturesCol)
      .setWithMean(withMean)
      .setWithStd(withStd)
    new Pipeline().setStages(Array(imputer, assembler, scaler))
  }

  def fit(df: DataFrame, featureCols: Seq[String],
      imputeStrategy: String = "mean"): PipelineModel =
    build(featureCols, imputeStrategy).fit(df)
}
