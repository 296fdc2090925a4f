package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}
import graft.text.TextStats

/** LLM training-data pipeline queries over `documents` / `embeddings`:
  * exact dedup, text statistics, quality scoring, fingerprinting. The
  * similarity/near-dup families (MinHash-LSH, SimHash, ANN) are registered
  * as rows-only queries (not ANSI-SQL-expressible) with recall assertions in
  * ScalaTest.
  *
  * Scale: every dedup/stat here hash-partitions on a content digest — never
  * an all-pairs comparison — so cost is one shuffle of (digest, id) pairs
  * regardless of corpus size.
  */
object LlmQueries extends QueryModule {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def defs: Map[String, QueryDef] = Map(

    "q_dedup_exact_keep" -> QueryDef(
      (s, dir) => {
        val docs = T(s, dir, "documents")
        val w = Window.partitionBy(TextStats.fingerprintMd5(col("text")))
          .orderBy(col("doc_id"))
        docs.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id FROM (SELECT doc_id,
             |   ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |   FROM documents) t
             | WHERE rn = 1 ORDER BY doc_id""".stripMargin),
      "exact dedup: keep-first by content digest, hash-partitioned"),

    "q_dedup_exact_stats" -> QueryDef(
      (s, dir) =>
        T(s, dir, "documents")
          .groupBy(TextStats.fingerprintMd5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("keep_id"),
            count(lit(1)).as("copies"))
          .filter(col("copies") > 1)
          .orderBy(col("h")),
      Some("""SELECT md5(text) AS h, MIN(doc_id) AS keep_id,
             | COUNT(*) AS copies FROM documents
             | GROUP BY md5(text) HAVING COUNT(*) > 1
             | ORDER BY h""".stripMargin),
      "exact dedup: duplicate-group stats by digest"),

    "q_text_stats" -> QueryDef(
      (s, dir) =>
        T(s, dir, "documents")
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("docs"),
            sum(length(col("text")).cast("long")).as("chars"),
            sum(TextStats.tokenCount(col("text")).cast("long")).as("tokens"))
          .orderBy(col("lang")),
      Some("""SELECT lang, COUNT(*) AS docs,
             | CAST(SUM(LENGTH(text)) AS BIGINT) AS chars,
             | CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS tokens
             | FROM documents GROUP BY lang ORDER BY lang""".stripMargin),
      "text stats: per-language char/token totals, one-pass agg"),

    "q_quality_score" -> QueryDef(
      (s, dir) =>
        T(s, dir, "documents")
          .select(
            col("doc_id"),
            TextStats.tokenCount(col("text")).as("n_tokens"),
            (TextStats.stopwordCount(col("text")) /
              TextStats.tokenCount(col("text"))).as("stop_ratio"),
            TextStats.qualityScore(col("text")).as("quality"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             | len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             | len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |     x -> x IN ('the','a','of','and','to','in','is','it')))
             |   / len(regexp_split_to_array(trim(text), '\s+')) AS stop_ratio,
             | 0.5 * (len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |     x -> x IN ('the','a','of','and','to','in','is','it')))
             |   / len(regexp_split_to_array(trim(text), '\s+')))
             | + 0.3 * (CASE WHEN len(regexp_split_to_array(trim(text), '\s+'))
             |     BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
             | + 0.2 * (1.0 - LENGTH(regexp_replace(text, '[a-z0-9\s]', '', 'g'))
             |   / LENGTH(text)) AS quality
             | FROM documents ORDER BY doc_id""".stripMargin),
      "quality scoring: stopword/length/punct heuristics, codegen'd"),

    "q_fingerprint" -> QueryDef(
      (s, dir) =>
        T(s, dir, "documents")
          .select(col("doc_id"),
            TextStats.fingerprintMd5(col("text")).as("fp"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, md5(text) AS fp FROM documents
             | ORDER BY doc_id""".stripMargin),
      "document fingerprinting (content digest)"),

    "q_lang_hist" -> QueryDef(
      (s, dir) =>
        T(s, dir, "documents")
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("docs"), sum(col("n_chars")).as("chars"))
          .orderBy(col("lang"), col("source")),
      Some("""SELECT lang, source, COUNT(*) AS docs,
             | CAST(SUM(n_chars) AS BIGINT) AS chars FROM documents
             | GROUP BY lang, source ORDER BY lang, source""".stripMargin),
      "language/source histogram over corpus metadata")
  )
}
