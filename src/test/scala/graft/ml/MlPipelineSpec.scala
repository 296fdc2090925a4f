package graft.ml

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.eval.Metrics

/** L1-L6 + M1/M2 on sf0.001: every reference model type trains, scores in
  * [0,1], persists and reloads; SMOTE balances exactly and is
  * deterministic under its seed.
  */
class MlPipelineSpec extends SparkSpec {

  private val featureCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  private lazy val labeled = Tables.load(spark, sf0001, "lineitem").select(
    when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("label"),
    col("l_quantity"), col("l_extendedprice"), col("l_discount"),
    col("l_tax")).cache()

  test("M1 randomSplit(seed 42) is deterministic and ~70/30") {
    val (tr1, te1) = MultiModel.split(labeled)
    val (tr2, _) = MultiModel.split(labeled)
    assert(tr1.count() === tr2.count())
    val frac = tr1.count().toDouble / labeled.count()
    assert(frac > 0.6 && frac < 0.8)
    assert(tr1.count() + te1.count() === labeled.count())
  }

  for (mt <- Trainers.ModelTypes)
    test(s"L2-L5 $mt trains and scores within [0,1]") {
      val (tr, te) = MultiModel.split(labeled)
      val t = MultiModel.train(tr, featureCols, mt,
        Map("max_iter" -> "10", "n_estimators" -> "5"),
        useSmote = true, smoteStrategy = "oversample")
      val acc = MultiModel.accuracy(t.pipeline, te)
      assert(acc >= 0.0 && acc <= 1.0)
      assert(t.trainAccuracy >= 0.0 && t.trainAccuracy <= 1.0)
    }

  test("L2/L5 model fingerprints are deterministic under seed") {
    // two independent end-to-end fits must produce bit-identical models:
    // LR coefficients and the DT structure serve as the model
    // fingerprint (the gate queries assert oracle-expressible invariants;
    // this pins the stronger full-determinism property)
    val (tr, _) = MultiModel.split(labeled)
    def lrFp(): Seq[Double] = {
      val t = MultiModel.train(tr, featureCols, "LOG_REG",
        Map("max_iter" -> "10"), useSmote = true,
        smoteStrategy = "oversample")
      val lr = t.pipeline.stages.last
        .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
      lr.coefficients.toArray.toSeq :+ lr.intercept
    }
    def dtFp(): String = {
      val t = MultiModel.train(tr, featureCols, "D_TREE",
        Map("max_depth" -> "5"), useSmote = false)
      t.pipeline.stages.last
        .asInstanceOf[org.apache.spark.ml.classification.DecisionTreeClassificationModel]
        // the debug string's header carries the per-fit random uid —
        // normalize it so the fingerprint compares tree structure only
        .toDebugString.replaceAll("uid=dtc_[0-9a-f]+", "uid=<norm>")
    }
    assert(lrFp() === lrFp())
    assert(dtFp() === dtFp())
  }

  test("ModelCache: same tag hits cache; distinct tags fit fresh") {
    import graft.ml.ModelCache
    ModelCache.clear()
    var fits = 0
    val (tr, _) = MultiModel.split(labeled)
    val prep = PrepPipeline.fit(tr, featureCols)
    val prepped = prep.transform(tr)
    def fitDt(): org.apache.spark.ml.Transformer = {
      fits += 1
      Trainers.decisionTree(maxDepth = 3).fit(prepped)
        .asInstanceOf[org.apache.spark.ml.Transformer]
    }
    val a = ModelCache.fitted(spark, "k", "dt:3")(fitDt())
    val b = ModelCache.fitted(spark, "k", "dt:3")(fitDt())
    val c = ModelCache.fitted(spark, "k", "dt:3b")(fitDt())
    assert(a eq b)           // cache hit returns the same fitted model
    assert(!(a eq c))        // a different tag never false-shares
    assert(fits === 2)
    ModelCache.clear()
  }

  test("S7 save/load round-trip preserves predictions; registry records") {
    val dir = Files.createTempDirectory("graft-models").toString
    val reg = new ModelRegistry(s"$dir/registry.jsonl")
    val (tr, te) = MultiModel.split(labeled)
    val t = MultiModel.train(tr, featureCols, "D_TREE",
      Map("max_depth" -> "4"), useSmote = false)
    val path = MultiModel.save(t, dir, reg, "dtree_test")
    val reloaded = MultiModel.load(path)
    val a = MultiModel.score(t.pipeline, te).select("prediction")
      .collect().map(_.getDouble(0)).toSeq
    val b = MultiModel.score(reloaded, te).select("prediction")
      .collect().map(_.getDouble(0)).toSeq
    assert(a === b)
    val entry = reg.latest("dtree_test")
    assert(entry.exists(_.modelType === "D_TREE"))
    assert(entry.exists(_.params === Map("max_depth" -> "4")))
  }

  test("M2 SMOTE balances classes exactly") {
    val prep = PrepPipeline.fit(labeled, featureCols)
    val prepped = prep.transform(labeled)
      .select(col("label"), col(PrepPipeline.FeaturesCol))
    val out = new Smote().setStrategy("smote").setK(3).transform(prepped)
    val counts = out.groupBy("label").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(counts(0.0) === counts(1.0))
  }

  test("M2 SMOTE is deterministic under fixed seed") {
    val prep = PrepPipeline.fit(labeled, featureCols)
    val prepped = prep.transform(labeled)
      .select(col("label"), col(PrepPipeline.FeaturesCol))
    def runSum() = new Smote().setStrategy("smote").setK(3)
      .transform(prepped)
      .select(explode(
        org.apache.spark.ml.functions.vector_to_array(col("features")))
        .as("v"))
      .agg(sum(floor(col("v") * 1000)).as("s")).head().getLong(0)
    assert(runSum() === runSum())
  }

  test("M2 oversample strategy duplicates real minority rows only") {
    val prep = PrepPipeline.fit(labeled, featureCols)
    val prepped = prep.transform(labeled)
      .select(col("label"), col(PrepPipeline.FeaturesCol)).cache()
    val out = new Smote().setStrategy("oversample").transform(prepped)
    val counts = out.groupBy("label").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(counts(0.0) === counts(1.0))
    // every synthetic row is a copy of an existing minority vector
    val minority = prepped.filter(col("label") === 1.0)
      .select(PrepPipeline.FeaturesCol).distinct()
    val outDistinct = out.filter(col("label") === 1.0)
      .select(PrepPipeline.FeaturesCol).distinct()
    assert(outDistinct.exceptAll(minority).count() === 0)
  }

  test("A10 importances cover all features and sum to ~1") {
    val prep = PrepPipeline.fit(labeled, featureCols)
    val prepped = prep.transform(labeled)
      .select(col("label"), col(PrepPipeline.FeaturesCol))
    val rf = Trainers.randomForest(nEstimators = 5).fit(prepped)
    val ranked = Importance.ranked(spark, rf, featureCols).collect()
    assert(ranked.map(_.getString(0)).sorted === featureCols.sorted.toArray)
    val total = ranked.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-6)
  }

  test("A7-A9 metrics agree on a hand-built frame") {
    import spark.implicits._
    val df = Seq((1.0, 1.0), (1.0, 0.0), (0.0, 0.0), (0.0, 0.0))
      .toDF("label", "prediction")
    assert(Metrics.accuracy(df).head().getDouble(0) === 0.75)
    val cm = Metrics.confusion(df).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(cm === Seq((0.0, 0.0, 2L), (1.0, 0.0, 1L), (1.0, 1.0, 1L)))
    val rep = Metrics.classificationReport(df).collect()
      .map(r => r.getDouble(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    // class 1: precision 1/1=1, recall 1/2=0.5, f1 = 2/3
    assert(rep(1.0)._2 === 1.0)
    assert(rep(1.0)._3 === 0.5)
    assert(math.abs(rep(1.0)._4 - 2.0 / 3.0) < 1e-12)
  }
}
