package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped cache of deterministic intermediate frames shared by
  * several registered queries — the DataFrame analogue of ml.TrainingCache
  * (prepared matrices) and ml.ModelCache (fitted models).
  *
  * Motivation: the registry's behavioral queries re-derive the same
  * expensive common subplans — the gap-sessionized interval frame
  * (one per-user window pass over events) and the co-order edge list
  * (a self-join + dedup of lineitem) — once per query, per run. In a
  * long-lived session (the serving path, a notebook, the bench loop)
  * those subplans are identical across consumers, so the engine should
  * plan them once and share the materialization, exactly like a
  * materialized CTE. At cluster scale this is the difference between one
  * shuffle of the fact table and one per consumer query.
  *
  * Entries are persisted MEMORY_AND_DISK (spill-safe: an executor under
  * memory pressure degrades to disk reads, never OOM) and materialized
  * eagerly so the first consumer pays the build and every later consumer
  * is a cache read. Keys must fully determine the frame (caller includes
  * the input dir and every parameter of the build); all builders are
  * deterministic, so a hit is observationally identical to a rebuild —
  * DeterminismSpec-style guarantees carry over.
  *
  * Concurrency: `computeIfAbsent` gives the single-build-per-key
  * guarantee with PER-BIN locking (the ModelCache policy, replacing the
  * earlier coarse object lock): a racing second caller of the same key
  * blocks until the winner's build materializes and then reads it — no
  * duplicate persisted frame to leak — while a hit on one key never
  * waits behind another key's multi-second build. Builders must not call
  * `cached` recursively (ConcurrentHashMap forbids reentrant updates);
  * obtain any prerequisite frame with its own `cached` call BEFORE
  * starting the dependent build, as Ann.pqTopK does. Entries bound to a
  * stopped SparkContext are dropped lazily; two concurrently live
  * sessions never evict each other (ConcurrencySpec pins all of this).
  */
object FrameCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DataFrame]()

  def cached(spark: SparkSession, key: String)
      (build: => DataFrame): DataFrame = {
    cache.values.removeIf(df => df.sparkSession.sparkContext.isStopped)
    cache.computeIfAbsent((spark.sparkContext.applicationId, key), _ => {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize now: consumers must only read
      df
    })
  }

  /** Drop and unpersist everything (tests / memory pressure). */
  def clear(): Unit = {
    cache.values.forEach { df =>
      if (!df.sparkSession.sparkContext.isStopped)
        df.unpersist(blocking = false)
    }
    cache.clear()
  }
}
