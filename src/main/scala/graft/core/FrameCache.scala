package graft.core

import java.util.concurrent.{CompletableFuture, CompletionException,
  ConcurrentHashMap}

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
  * Concurrency: the map stores a PROMISE per key, installed with a cheap
  * `putIfAbsent` — the multi-second Spark build runs entirely OUTSIDE
  * the map's bin locks (the earlier computeIfAbsent form held a bin lock
  * for the whole build, so a hit on a different key hashing into the
  * same bin stalled behind it). A racing second caller of the same key
  * parks on the winner's future and reads the materialized frame — still
  * exactly one build per key, no duplicate persisted frame to leak. A
  * build that THROWS removes its promise before propagating, so a later
  * caller retries instead of caching the failure. Builders may now call
  * `cached` recursively for a DIFFERENT key (no map lock is held during
  * a build); a builder requesting its OWN key would self-deadlock — keep
  * obtaining prerequisite frames with their own `cached` calls, as
  * Ann.pqTopK does. Entries bound to a stopped SparkContext are dropped
  * lazily; two concurrently live sessions never evict each other
  * (ConcurrencySpec pins all of this, including an elapsed-time bound on
  * hits racing a slow build).
  *
  * Build-time ledger: every completed build's wall seconds are recorded
  * under its key ([[buildLog]]), so the bench can report shared-frame
  * build cost as its own line instead of billing it to whichever
  * consumer query happens to run first (round-7 verdict: per-query
  * medians swung on consumer order).
  */
object FrameCache {

  private val cache =
    new ConcurrentHashMap[(String, String), CompletableFuture[DataFrame]]()

  private val buildSecs =
    new ConcurrentHashMap[(String, String), Double]()

  /** Completed builds this JVM: (applicationId, key) -> build seconds. */
  def buildLog: Map[(String, String), Double] = {
    import scala.jdk.CollectionConverters._
    buildSecs.asScala.toMap
  }

  private def doneFrame(f: CompletableFuture[DataFrame]): Option[DataFrame] =
    if (f.isDone && !f.isCompletedExceptionally && !f.isCancelled)
      Some(f.join())
    else None

  def cached(spark: SparkSession, key: String)
      (build: => DataFrame): DataFrame = {
    // lazily drop entries whose SparkContext is gone (test suites create
    // and stop many sessions); in-flight builds are left alone
    cache.entrySet().removeIf(e =>
      doneFrame(e.getValue).exists(_.sparkSession.sparkContext.isStopped))
    val k = (spark.sparkContext.applicationId, key)
    val promise = new CompletableFuture[DataFrame]()
    val existing = cache.putIfAbsent(k, promise)
    if (existing != null) {
      try existing.join()
      catch {
        case e: CompletionException =>
          throw Option(e.getCause).getOrElse(e)
      }
    } else {
      try {
        val t0 = System.nanoTime()
        val df = build.persist(StorageLevel.MEMORY_AND_DISK)
        df.count() // materialize now: consumers must only read
        buildSecs.put(k, (System.nanoTime() - t0) / 1e9)
        promise.complete(df)
        df
      } catch {
        case t: Throwable =>
          cache.remove(k, promise)
          promise.completeExceptionally(t)
          throw t
      }
    }
  }

  /** Drop and unpersist everything (tests / memory pressure). In-flight
    * builds are cancelled from the waiters' point of view (their entry is
    * removed so the next call rebuilds); the winning builder still
    * returns its own frame.
    */
  def clear(): Unit = {
    cache.values.forEach { f =>
      doneFrame(f).foreach { df =>
        if (!df.sparkSession.sparkContext.isStopped)
          df.unpersist(blocking = false)
      }
    }
    cache.clear()
    buildSecs.clear()
  }
}
