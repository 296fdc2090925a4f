package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers: pre-shuffle once at write time so repeated
  * joins/aggregations on the bucket key run shuffle-free.
  *
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every join and paying the shuffle once at ingest: two tables bucketed
  * into the same bucket count on the join key sort-merge join with NO
  * Exchange on either side (asserted in BucketingSpec against the physical
  * plan).
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 32): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
