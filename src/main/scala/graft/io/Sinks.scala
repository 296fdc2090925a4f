package graft.io

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** S2/S4 — file sinks matching the reference's persisted artifacts. */
object Sinks {

  /** S2 — CSV with an explicit index column (reference
    * `to_csv(..., index=True)`, /root/reference/src/preprocess.py:106-107).
    * The index is the persisted rejoin key for split X/y files (SURVEY
    * §2.3): deterministic dense row numbers ordered by the given key
    * columns.
    *
    * The dense index is minted by a per-partition-count prefix sum
    * (`zipWithIndex`: one lightweight count pass over the sorted shuffle
    * output, then local offsets) — every partition numbers its rows in
    * parallel. No single-task global window; the only global step is the
    * range-partitioned sort itself.
    */
  def csvWithIndex(df: DataFrame, path: String, orderCols: Seq[String])
      : Unit = {
    val sorted = df.orderBy(orderCols.map(col): _*)
    val schema = StructType(
      StructField("idx", LongType, nullable = false) +: sorted.schema.fields)
    val indexed = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(i +: r.toSeq) }
    df.sparkSession.createDataFrame(indexed, schema)
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
  }

  /** Plain parquet sink — the engine's preferred format (columnar,
    * predicate-pushdown-able, splittable).
    */
  def parquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path)
  }

  /** Corpus-layout parquet writer — the 100 TB physical-layout recipe:
    * repartition by the partition columns (one shuffle; otherwise every
    * task writes a file into every partition dir → small-file explosion),
    * sort rows within files by a locality key (e.g. the content
    * fingerprint, so dup-candidate rows are adjacent and parquet row-group
    * min/max stats prune digest probes), and cap rows per file so single
    * files stay rewritable.
    *
    * Downstream reads then get partition pruning on the partition columns
    * for free (`PartitionFilters` in the scan).
    */
  def parquetCorpus(df: DataFrame, path: String,
      partitionCols: Seq[String], sortCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val keyed = df.repartition(partitionCols.map(col): _*)
      .sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
    keyed.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** S4 — JSON predictions document
    * `{"predictions": [...], "created_at": ...}` (reference
    * /root/reference/src/predict.py:248-260). Collapses to a single JSON
    * doc like the reference's fallback file; predictions frames are
    * result-sized, not data-sized.
    */
  def jsonPredictions(df: DataFrame, predictionCol: String, path: String)
      : Unit = {
    df.agg(collect_list(col(predictionCol).cast("int"))
        .as("predictions"))
      .withColumn("created_at",
        date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssX"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).json(path)
  }
}
