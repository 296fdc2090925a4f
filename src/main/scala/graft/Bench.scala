package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  *
  * Methodology: each query gets one un-timed warmup run (JIT, scan cache,
  * shared TrainingCache population) followed by SPARK_GRAFT_REPS timed
  * runs (default 5); the reported per-query number is the STALL-AWARE
  * median of the timed runs (median over reps within 3× of the best rep
  * — see [[stallAwareMedian]]), so round-over-round comparisons are
  * robust both to the ±30-50% single-run variance measured on local[32]
  * and to the host's multi-rep external stall windows. Raw rep samples
  * are preserved in bench_full.json. A query that throws is recorded as
  * -1.0 (never silently counted as a fast success) and excluded from
  * the total.
  */
object Bench {

  private def runOnce(spark: SparkSession, sfDir: String,
      fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
    val t0 = System.nanoTime()
    // noop sink: materializes every output column (a count() would let
    // Catalyst prune the projections being measured) without paying for
    // a real write
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Stall-aware committed estimate: median over the reps within 3× of
    * the best rep. Rationale (round-8 evidence): the host's external
    * stall windows inflate 1-3 CONSECUTIVE reps 10-30×, so even a
    * median-of-5 can commit a 5× lie (r8's q_curation_pipeline median
    * 18.2 s over [31.0, 3.4, 35.4, 12.0, 18.2]; clean rep 3.4 s). Reps
    * within 3× of min are engine behavior (JIT/cache variance measured
    * ≤2× on a quiet host); beyond 3× is the stall signature. Raw
    * rep_samples stay in the artifact so the filter is auditable.
    */
  private def stallAwareMedian(xs: Seq[Double]): Double = {
    val lo = xs.min
    median(xs.filter(_ <= 3.0 * lo))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // default 5 (round 8): the sandbox host shows external stall windows
    // of ~1-2 min that inflate 1-2 CONSECUTIVE reps 10-30x (rep_samples
    // in bench_full.json carry the evidence); a median of 3 flips on a
    // 2-rep window, a median of 5 survives it
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt.max(1)
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1").toInt.max(0)
    val spark = GraftSession.benchScratch(GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench")))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    // ERROR, not WARN: repeated executor warnings (cache-manager,
    // single-partition-window notices) add hundreds of lines to the
    // merged output the driver captures; the bench result must not
    // depend on how much of that noise fits the capture window
    spark.sparkContext.setLogLevel("ERROR")
    // local-iteration aid: SPARK_GRAFT_ONLY=<regex> restricts the run to
    // matching query names (unset in the driver's per-round invocation)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
    val profiles = scala.collection.mutable.LinkedHashMap
      .empty[String, graft.core.QueryMetrics.PlanProfile]
    // per-rep samples + sweep-relative start offsets: the medians alone
    // cannot distinguish a real regression from an environment stall
    // window (observed: host write-throttle episodes inflating whichever
    // query runs inside them 10-30× for several consecutive reps, a
    // different query every sweep). The full file keeps the evidence.
    val repsDetail = scala.collection.mutable.LinkedHashMap
      .empty[String, Seq[Double]]
    val startOff = scala.collection.mutable.LinkedHashMap
      .empty[String, Double]
    val sweepT0 = System.nanoTime()
    val results = selected.map { case (name, fn) =>
      val sec =
        try {
          // collect between queries, outside the timed region: garbage
          // from the previous query's runs otherwise surfaces as a GC
          // pause INSIDE some later query's timing (measured 6-12×
          // inflation on mid-run queries in full 129-query rounds)
          System.gc()
          startOff(name) = (System.nanoTime() - sweepT0) / 1e9
          // the first warmup run doubles as the metrics-accounting run
          // (QueryMetrics executes the same noop materialization) —
          // realized scan rows / shuffle bytes land in bench_full.json
          // at zero added cost
          if (warmup >= 1)
            profiles(name) = graft.core.QueryMetrics.profile(fn(spark, sfDir))
          (1 until warmup).foreach(_ => runOnce(spark, sfDir, fn))
          val samples = (1 to reps).map(_ => runOnce(spark, sfDir, fn))
          repsDetail(name) = samples
          stallAwareMedian(samples)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      // stderr progress line per query (diagnosing a long sweep no
      // longer needs jstack guesswork); all of these print BEFORE the
      // final stdout JSON line, so the driver's bounded tail capture
      // still ends with the compact result
      System.err.println(f"[bench] $name done: $sec%.2fs")
      name -> sec
    }
    // Full per-query medians go to a file: the driver's log capture keeps
    // only a ~2000-char tail of stdout, and an 80-query JSON line (~4 KB)
    // overflows it — which is why BENCH_r01..r03 all recorded parsed:null.
    val fmt = new java.text.DecimalFormat("0.###",
      java.text.DecimalFormatSymbols.getInstance(java.util.Locale.ROOT))
    // every JSON key goes through esc(): query names are identifiers
    // today, but a quote/backslash in a future name must corrupt nothing
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    def ent(k: String, v: Double) = "\"" + esc(k) + "\":" + fmt.format(v)
    val fullJson = results.map { case (k, v) => ent(k, v) }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failed = results.count(_._2 < 0)
    val profJson = profiles.map { case (k, p) =>
      "\"" + k + "\":{\"scan_rows\":" + p.scanRows +
        ",\"shuffle_bytes\":" + p.shuffleBytes +
        ",\"n_shuffles\":" + p.nShuffles + "}"
    }.mkString("{", ",", "}")
    // Shared-cache build attribution (round-7 verdict): FrameCache /
    // ModelCache / TrainingCache builds happen during whichever consumer
    // query runs FIRST (its warmup invocation), so per-query medians are
    // clean of build cost — but the build time itself swung invisible
    // between rounds. Report every build as its own ledger line so the
    // bench total decomposes into query time + cache-build time.
    val cacheBuilds: Seq[(String, Double)] =
      graft.core.FrameCache.buildLog.toSeq.map { case ((_, k), s) =>
        s"frame:$k" -> s } ++
      graft.ml.ModelCache.buildLog.toSeq.map { case ((_, k, tag), s) =>
        s"model:$k:$tag" -> s } ++
      graft.ml.TrainingCache.buildLog.toSeq.map { case ((_, k, fc), s) =>
        s"matrix:$k:${fc.mkString("+")}" -> s }
    val cacheBuildSec = cacheBuilds.map(_._2).sum
    val cacheJson = cacheBuilds.sortBy(-_._2)
      .map { case (k, s) => "\"" + esc(k) + "\":" + fmt.format(s) }
      .mkString("{", ",", "}")
    val repsJson = repsDetail.map { case (k, xs) =>
      "\"" + esc(k) + "\":[" + xs.map(fmt.format).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val offJson = startOff.map { case (k, o) => ent(k, o) }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${fmt.format(total)},"unit":"sec","queries":$fullJson,"profiles":$profJson,"cache_build_sec":${fmt.format(cacheBuildSec)},"cache_builds":$cacheJson,"rep_samples":$repsJson,"start_offset_sec":$offJson,"sf":"$sfDir","reps":$reps,"warmup":$warmup,"failed":$failed}"""
    val fullPath = java.nio.file.Paths.get("bench_full.json")
    java.nio.file.Files.write(fullPath, (fullLine + "\n").getBytes("UTF-8"))
    // The full line goes ONLY to the file, never to stderr: sbt's
    // StdoutOutput forwards the forked process's stderr into the same
    // stream as stdout, and a ~10 KB stderr line can swamp or truncate
    // the driver's bounded capture window — BENCH_r04 recorded
    // parsed:null with its tail cut mid-full-line for exactly this
    // reason. Stdout must end with the one compact JSON line below.
    System.err.println(s"[bench] full per-query medians: $fullPath")

    // Final stdout line: compact enough (<1500 chars) to survive the tail
    // window intact. Lists failures first, then the costliest queries,
    // until the budget is spent; the rest are summarized.
    val byCost = results.filter(_._2 < 0) ++ results.filter(_._2 >= 0).sortBy(-_._2)
    val budget = 1400
    val head =
      s"""{"metric":"total","value":${fmt.format(total)},"unit":"sec","sf":"$sfDir","reps":$reps,"warmup":$warmup,"n_queries":${results.size},"failed":$failed,"cache_build_sec":${fmt.format(cacheBuildSec)},"full":"bench_full.json","queries":{"""
    val tail0 = "}}"
    val kept = scala.collection.mutable.ListBuffer.empty[String]
    var len = head.length + tail0.length + 40 // slack for omitted_* fields
    byCost.foreach { case (k, v) =>
      val e = ent(k, v)
      if (len + e.length + 1 <= budget) { kept += e; len += e.length + 1 }
    }
    val omitted = results.size - kept.size
    val omittedSec = total - byCost.take(kept.size).collect {
      case (_, v) if v >= 0 => v
    }.sum
    if (omitted > 0)
      kept += ent("omitted_" + omitted + "_queries_sec", omittedSec)
    println(head + kept.mkString(",") + tail0)
    spark.stop()
  }
}
