package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Distributed exact prefix sum (running total) over a globally ordered
  * long-valued column.
  *
  * Spark's window functions compute a global running total only under an
  * un-partitioned `Window.orderBy(...)`, which funnels the entire input
  * through ONE task — a non-starter at 100 TB. This operator is the
  * scalable form, the classic two-phase scan:
  *
  *   1. range-partition by the order key and sort within partitions
  *      (each of the P partitions holds a contiguous key range);
  *   2. pass A: reduce each partition to its local sum — P longs to the
  *      driver (P ≈ thousands, so this collect is O(KB), the same
  *      driver-side footprint as Spark's own RangePartitioner sample);
  *   3. exclusive-scan those P totals on the driver, broadcast the
  *      offsets;
  *   4. pass B: each partition streams its rows once more, adding its
  *      broadcast base offset to a local accumulator.
  *
  * Both passes read the same persisted (MEMORY_AND_DISK) sorted RDD, so
  * the range partitioning is computed once; if an executor drops a block
  * the lineage recomputes with the SAME partitioner instance, so the
  * offsets stay valid. The result is eagerly localCheckpoint'ed and the
  * sorted intermediate is unpersisted before returning — a session that
  * runs many scans (determinism sweeps, the bench loop) must not
  * accumulate one cached sorted frame per call; only the grain-sized
  * output stays cached, and the ContextCleaner reclaims it once the
  * consumer drops the frame. All arithmetic is Long — exact,
  * associative, partitioning-independent — which is what lets a
  * prefix-sum result be oracle-gated at all.
  *
  * Used by the interval max-concurrency sweep (q_max_concurrency), where
  * the input has already been aggregated to one net delta per distinct
  * timestamp, so N here is |distinct boundary instants|, not |events|.
  */
object PrefixSum {

  /** Running total of `valueCol` (long) ordered by `orderCol` (long,
    * globally unique — e.g. a distinct timestamp). Returns
    * (orderCol, valueCol, runName) with the INCLUSIVE prefix sum.
    */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
      runName: String = "running"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .select(col(orderCol).cast(LongType).as("__k"),
        col(valueCol).cast(LongType).as("__v"))
      .repartitionByRange(col("__k"))
      .sortWithinPartitions(col("__k"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rdd = sorted.rdd
    // pass A: per-partition totals (tiny collect, see scaladoc)
    val totals = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach(s += _.getLong(1))
        Iterator.single((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // exclusive scan
    val bc = spark.sparkContext.broadcast(offsets)
    // pass B: stream each partition once, seeded with its base offset
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      it.map { r =>
        acc += r.getLong(1)
        Row(r.getLong(0), r.getLong(1), acc)
      }
    }
    val result = spark.createDataFrame(out, StructType(Seq(
        StructField(orderCol, LongType, nullable = false),
        StructField(valueCol, LongType, nullable = false),
        StructField(runName, LongType, nullable = false))))
      .localCheckpoint() // eager: pass B runs now, off the cached sort
    sorted.unpersist(blocking = false)
    result
  }

  /** Running totals of SEVERAL long-valued columns in ONE two-phase scan
    * over a shared global order — the shape a two-sample ECDF comparison
    * needs (cumulative counts of population A and B over the pooled value
    * axis). Same structure as [[runningTotal]] with a vector accumulator:
    * pass A reduces each partition to a W-vector of local sums (P×W longs
    * to the driver), the driver exclusive-scans component-wise, pass B
    * streams each partition once seeded with its offset vector. Returns
    * (orderCol, v0, run0, v1, run1, ...) with INCLUSIVE prefix sums.
    *
    * `orderCol` must be globally unique (pre-reduce to value grain first);
    * value columns must be non-null.
    */
  def runningTotals(df: DataFrame, orderCol: String,
      valueCols: Seq[String], runNames: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty && valueCols.length == runNames.length,
      "valueCols and runNames must align")
    val w = valueCols.length
    val spark = df.sparkSession
    val sorted = df
      .select(col(orderCol).cast(LongType).as("__k") +:
        valueCols.zipWithIndex.map { case (c, i) =>
          col(c).cast(LongType).as(s"__v$i") }: _*)
      .repartitionByRange(col("__k"))
      .sortWithinPartitions(col("__k"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rdd = sorted.rdd
    val totals = rdd
      .mapPartitionsWithIndex { (i, it) =>
        val s = new Array[Long](w)
        it.foreach { r =>
          var j = 0
          while (j < w) { s(j) += r.getLong(j + 1); j += 1 }
        }
        Iterator.single((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(new Array[Long](w)) { (a, b) =>
      Array.tabulate(w)(j => a(j) + b(j))
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val acc = bc.value(i).clone()
      it.map { r =>
        var j = 0
        while (j < w) { acc(j) += r.getLong(j + 1); j += 1 }
        Row.fromSeq(r.getLong(0) +:
          (0 until w).flatMap(j => Seq(r.getLong(j + 1), acc(j))))
      }
    }
    val result = spark.createDataFrame(out, StructType(
      StructField(orderCol, LongType, nullable = false) +:
        (0 until w).flatMap(j => Seq(
          StructField(valueCols(j), LongType, nullable = false),
          StructField(runNames(j), LongType, nullable = false)))))
      .localCheckpoint()
    sorted.unpersist(blocking = false)
    result
  }

  /** Running MAXIMUM of `valueCol` (long) ordered by `orderCol` (long,
    * globally unique), plus a flag marking rows that strictly RAISE the
    * running max — i.e. rows beating every value strictly before them.
    * That flag is exactly the 2-D skyline/Pareto-front membership test
    * (sort by the minimized dimension, keep maximizer improvements), so
    * the front computation inherits this scan's scale shape instead of
    * a single-task global window. Same two-phase structure as
    * [[runningTotal]] with the (max, Long.MinValue) monoid — max is
    * associative, so per-partition maxima + an exclusive driver scan of
    * P values reconstruct the exact global scan.
    */
  def runningMax(df: DataFrame, orderCol: String, valueCol: String,
      runName: String = "runmax",
      flagName: String = "is_new_max"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .select(col(orderCol).cast(LongType).as("__k"),
        col(valueCol).cast(LongType).as("__v"))
      .repartitionByRange(col("__k"))
      .sortWithinPartitions(col("__k"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rdd = sorted.rdd
    val totals = rdd
      .mapPartitionsWithIndex { (i, it) =>
        var m = Long.MinValue
        it.foreach(r => m = math.max(m, r.getLong(1)))
        Iterator.single((i, m))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(Long.MinValue)(math.max)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      it.map { r =>
        val before = acc
        val v = r.getLong(1)
        acc = math.max(acc, v)
        Row(r.getLong(0), v, acc, v > before)
      }
    }
    val result = spark.createDataFrame(out, StructType(Seq(
        StructField(orderCol, LongType, nullable = false),
        StructField(valueCol, LongType, nullable = false),
        StructField(runName, LongType, nullable = false),
        StructField(flagName,
          org.apache.spark.sql.types.BooleanType, nullable = false))))
      .localCheckpoint()
    sorted.unpersist(blocking = false)
    result
  }
}
