package graft.core

import scala.collection.concurrent.TrieMap

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
  * Builds run under a coarse lock (same rationale as TrainingCache): a
  * racing getOrElseUpdate would leak the loser's persisted frame in
  * executor memory. Entries bound to a stopped SparkContext are dropped
  * lazily; two concurrently live sessions never evict each other.
  */
object FrameCache {

  private val cache = TrieMap.empty[(String, String), DataFrame]

  def cached(spark: SparkSession, key: String)
      (build: => DataFrame): DataFrame = synchronized {
    cache.filterInPlace((_, df) =>
      !df.sparkSession.sparkContext.isStopped)
    cache.getOrElseUpdate((spark.sparkContext.applicationId, key), {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      df.count() // materialize now: consumers must only read
      df
    })
  }

  /** Drop and unpersist everything (tests / memory pressure). */
  def clear(): Unit = synchronized {
    cache.values.foreach { df =>
      if (!df.sparkSession.sparkContext.isStopped)
        df.unpersist(blocking = false)
    }
    cache.clear()
  }
}
