package graft

import org.apache.spark.sql.SparkSession

import graft.core.GraftSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  *
  * Methodology: each query gets one un-timed warmup run (JIT, scan cache,
  * shared TrainingCache population) followed by SPARK_GRAFT_REPS timed
  * runs (default 3); the reported per-query number is the MEDIAN of the
  * timed runs, so round-over-round comparisons are robust to the
  * ±30-50% single-run variance measured on local[32]. A query that
  * throws is recorded as -1.0 (never silently counted as a fast success)
  * and excluded from the total.
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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt.max(1)
    val warmup = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1").toInt.max(0)
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // local-iteration aid: SPARK_GRAFT_ONLY=<regex> restricts the run to
    // matching query names (unset in the driver's per-round invocation)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
    val results = selected.map { case (name, fn) =>
      val sec =
        try {
          (1 to warmup).foreach(_ => runOnce(spark, sfDir, fn))
          median((1 to reps).map(_ => runOnce(spark, sfDir, fn)))
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
      name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"warmup":$warmup}""")
    spark.stop()
  }
}
