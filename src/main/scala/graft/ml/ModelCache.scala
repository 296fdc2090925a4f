package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.sql.SparkSession

/** Session-scoped cache of fitted models, one level above TrainingCache:
  * the same (input dir, model type, params, fit-input) always yields the
  * same fitted model because every trainer is seeded (seed 42 throughout,
  * matching the reference protocol) and the cached prepared/SMOTE'd
  * matrices are themselves deterministic. Mirrors the reference's
  * persisted-model reuse (/root/reference/src/train.py:96-105 pickles the
  * preprocessor+models precisely so later requests skip refitting): a
  * serving session fits each model once, then every scoring/importance
  * query reuses it. DeterminismSpec pins fresh-fit == refit model
  * fingerprints, so cache hits are observationally identical to fresh
  * fits.
  */
object ModelCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, String, String),
      (org.apache.spark.SparkContext, Transformer)]()

  /** Get-or-fit the model for (session, input key, model tag). The tag
    * must encode model type, params, and which cached matrix the fit
    * consumes (e.g. "RAND_FOREST:n=20:smoted").
    *
    * computeIfAbsent gives the single-fit-per-key guarantee with
    * per-bin locking — a cache hit on one model never blocks behind
    * another model's multi-second fit (a global object lock would
    * serialize all model access). Eviction is lazy and targets only
    * entries whose owning SparkContext has stopped: one JVM cycling
    * sessions (test runners, driver restarts) must not pin dead apps'
    * models forever, but two concurrently live sessions with different
    * applicationIds must not thrash-evict each other's entries either.
    */
  def fitted(spark: SparkSession, key: String, modelTag: String)
      (fit: => Transformer): Transformer = {
    val sc = spark.sparkContext
    cache.values.removeIf(_._1.isStopped)
    cache.computeIfAbsent(
      (sc.applicationId, key, modelTag), _ => (sc, fit))._2
  }

  /** Drop all cached models (tests / memory pressure). */
  def clear(): Unit = cache.clear()
}
