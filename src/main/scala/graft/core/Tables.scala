package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Schemas are declared explicitly rather than inferred: at 100 TB an
  * inference pass over the footers of every file is wasted IO, and a
  * declared schema guarantees plan stability across data revisions
  * (mirrors the reference's `low_memory=False` single-pass typed parse,
  * /root/reference/src/preprocess.py:103 — there done for the same
  * reason, schema stability).
  */
object Tables {

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  // o_orderdate / l_shipdate / events.ts are stored timezone-naive
  // (parquet isAdjustedToUTC=false). TimestampNTZType matches that logical
  // type exactly, so results do not depend on spark.sql.session.timeZone or
  // the JVM default zone — required for stable DuckDB oracle comparison.
  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampNTZType),
    StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampNTZType)))

  // events.ts is a timezone-naive parquet TIMESTAMP whose physical unit has
  // varied across testdata generations (NANOS in earlier drops, MICROS in
  // the current one). Declaring LongType reads the raw int64 either way
  // (NANOS needs spark.sql.legacy.parquet.nanosAsLong=true, set by
  // GraftSession; MICROS reads its raw value directly), and load()
  // normalizes to canonical MICROSECONDS — see usNormalized.
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val schemas: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events,
    "documents" -> documents, "embeddings" -> embeddings)

  /** Normalize a raw int64 epoch `ts` to canonical MICROSECONDS,
    * whatever unit the parquet generation stored (the unit has already
    * changed once between testdata drops — ns then µs). Seconds, millis,
    * micros, and nanos since epoch live 1000x apart, so for any instant
    * between 1973 and ~5100 the magnitude alone classifies the unit:
    * >=1e17 is nanos (1e17 µs would be year 5138), >=1e14 is micros
    * (1e14 ms would be 5138 too), >=1e11 is millis, else seconds. A
    * per-row integral CASE ladder — codegen'd, deterministic, no
    * footer-sniffing, no data-dependent plan. SQL fragment so batch and
    * streaming readers share the exact same expression.
    */
  val tsToMicrosSql: String =
    "CASE WHEN ts >= 100000000000000000L THEN ts div 1000 " +
      "WHEN ts >= 100000000000000L THEN ts " +
      "WHEN ts >= 100000000000L THEN ts * 1000 " +
      "ELSE ts * 1000000 END"

  /** Era bounds for the ladder's validity: the magnitude bands only
    * classify unambiguously for instants in ~1973–5100, and the driver's
    * synthetic data has always generated 2024-era events. 1990–2100 in
    * canonical µs. */
  val tsEraLoUs: Long = 631152000000000L   // 1990-01-01T00:00Z
  val tsEraHiUs: Long = 4102444800000000L  // 2100-01-01T00:00Z

  /** The ladder plus a loud era assertion: a value that normalizes
    * outside 1990–2100 means the generation moved outside the ladder's
    * classifiable range (e.g. pre-epoch or 1971 instants, where the
    * µs/ns bands alias) — fail the scan with a diagnostic instead of
    * silently corrupting `ts` by 1000×. Two extra integer compares per
    * row, codegen'd; nulls pass through untouched.
    */
  val tsToMicrosGuardedSql: String =
    s"CASE WHEN ts IS NULL THEN CAST(NULL AS BIGINT) " +
      s"WHEN ($tsToMicrosSql) BETWEEN ${tsEraLoUs}L AND ${tsEraHiUs}L " +
      s"THEN ($tsToMicrosSql) " +
      "ELSE raise_error(concat('events.ts=', CAST(ts AS STRING), " +
      "' normalizes outside the 1990-2100 era: the testdata " +
      "generation changed unit/era beyond Tables.tsToMicrosSql''s " +
      "magnitude ladder — re-derive the ladder bands')) END"

  /** Read one synthetic table with its declared schema. Column pruning +
    * predicate pushdown then apply at the parquet scan via Catalyst.
    *
    * For `events`, `ts` is normalized to canonical integral MICROSECONDS
    * (exact, sortable, joinable — and the unit DuckDB's epoch_us() yields,
    * which is what the oracle side of every gate uses) and a derived
    * `event_time: TimestampType` (micros precision; session TZ is pinned
    * UTC by GraftSession so it behaves as naive UTC) is appended.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    GraftSession.ensureConfigured(spark)
    val df = spark.read.schema(schemas(name)).parquet(s"$sfDir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
          org.apache.spark.sql.functions.expr(tsToMicrosGuardedSql))
        .withColumn("event_time",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts)"))
    else df
  }
}
