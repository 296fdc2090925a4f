package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}
import graft.multimodal.Multimodal
import graft.sim.Ann
import graft.text.{BloomDedup, NearDup, TextStats}

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

    "q_ngram_jaccard" -> QueryDef(
      (s, dir) => {
        // exact 3-gram Jaccard over a deterministic pair set (adjacent
        // doc_ids) — the verification primitive of the near-dup family,
        // oracle-checked end to end.
        val docs = T(s, dir, "documents")
        val pairs = docs.select(col("doc_id").as("id_a"),
          (col("doc_id") + 1).as("id_b"))
          .join(docs.select(col("doc_id").as("id_b")), Seq("id_b"))
          .select(col("id_a"), col("id_b"))
        NearDup.ngramJaccard(docs, "doc_id", "text", pairs, n = 3)
          .orderBy(col("id_a"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |   regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |   FROM documents),
             | g AS (SELECT doc_id,
             |   list_distinct(list_transform(range(1, greatest(len(ts)-2,1)+1),
             |     i -> array_to_string(ts[i:least(i+2, len(ts))], ' '))) AS gs
             |   FROM t)
             | SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |   CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
             |     / (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)))
             |     AS jaccard
             | FROM g a JOIN g b ON b.doc_id = a.doc_id + 1
             | ORDER BY id_a""".stripMargin),
      "n-gram Jaccard similarity on deterministic pairs (oracle-checked)"),

    "q_token_count" -> QueryDef(
      (s, dir) =>
        T(s, dir, "documents")
          .groupBy(col("source"))
          .agg(
            sum(TextStats.regexTokenCount(col("text")).cast("long"))
              .as("regex_tokens"),
            sum(TextStats.tokenCount(col("text")).cast("long"))
              .as("ws_tokens"))
          .orderBy(col("source")),
      Some("""SELECT source,
             | CAST(SUM(len(regexp_extract_all(text,
             |   '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]'))) AS BIGINT) AS regex_tokens,
             | CAST(SUM(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
             |   AS ws_tokens
             | FROM documents GROUP BY source ORDER BY source""".stripMargin),
      "token counting: whitespace + BPE-ish regex tokenizers"),

    "q_fingerprint_rolling" -> QueryDef(
      (s, dir) =>
        T(s, dir, "documents")
          .groupBy(graft.functions.RollingFingerprint
            .rolling_fingerprint(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
          .filter(col("n") > 1)
          .orderBy(col("fp")),
      None,
      "native codegen'd rolling-hash fingerprint dedup groups"),

    "q_dedup_embedding" -> QueryDef(
      (s, dir) => {
        // embedding-cosine near-dup: LSH-bucketed candidate pairs at high
        // cosine — the semantic-dedup primitive
        val emb = T(s, dir, "embeddings")
        // nearest semantic neighbor per probe with its cosine: the dedup
        // decision is then a threshold over this candidate set (the
        // synthetic random embeddings have no true near-dups, so the
        // query emits the ranked candidates rather than filtering to an
        // empty frame)
        Ann.lshTopK(emb, emb.orderBy(col("vec_id")).limit(50),
            "vec_id", "embedding", k = 1,
            bucketLength = 2.0, numHashTables = 4)
          .select(col("probe_id"), col("neighbor_id"), col("cosine"),
            (col("cosine") > 0.95).as("is_dup"))
          .orderBy(col("probe_id"), col("neighbor_id"))
      },
      None,
      "embedding-cosine near-dup candidates (LSH-bucketed)"),

    "q_minhash_neardup" -> QueryDef(
      (s, dir) =>
        NearDup.minHashPairs(T(s, dir, "documents"), "doc_id", "text",
          minJaccard = 0.5)
          .orderBy(col("id_a"), col("id_b")),
      None,
      "MinHash-LSH near-dup pairs, bucket-local join + exact verify"),

    "q_simhash_neardup" -> QueryDef(
      (s, dir) =>
        NearDup.simHashPairs(T(s, dir, "documents"), "doc_id", "text",
          maxHamming = 8)
          .orderBy(col("id_a"), col("id_b")),
      None,
      "SimHash near-dup pairs via 16-bit pigeonhole banding"),

    "q_ann_brute_topk" -> QueryDef(
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        val probes = emb.orderBy(col("vec_id")).limit(5)
        Ann.bruteForceTopK(emb, probes, "vec_id", "embedding", k = 10)
      },
      None,
      "exact cosine top-k, broadcast probes (ANN baseline)"),

    "q_ann_lsh_topk" -> QueryDef(
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        val probes = emb.orderBy(col("vec_id")).limit(5)
        Ann.lshTopK(emb, probes, "vec_id", "embedding", k = 10)
      },
      None,
      "LSH-bucketed approximate cosine top-k (ANN scale path)"),

    "q_lang_id" -> QueryDef(
      (s, dir) =>
        T(s, dir, "documents")
          .groupBy(TextStats.langId(col("text")).as("lang_pred"))
          .agg(count(lit(1)).as("docs"))
          .orderBy(col("lang_pred")),
      // argmax over marker-token counts, tie-break lang asc ('und' on 0):
      // the CASE tests languages in alphabetical order so the first
      // equal-to-greatest wins, mirroring sort_array((neg, lang)) asc
      Some("""WITH t AS (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |   FROM documents),
             | s AS (SELECT
             |   len(list_filter(ts, x -> x IN ('der','die','und','das','ist','nicht','ein','zu'))) AS de,
             |   len(list_filter(ts, x -> x IN ('the','and','of','to','in','is','that','it'))) AS en,
             |   len(list_filter(ts, x -> x IN ('el','la','de','que','y','en','los','una'))) AS es,
             |   len(list_filter(ts, x -> x IN ('le','la','de','et','est','les','une','dans'))) AS fr
             |   FROM t)
             | SELECT CASE WHEN greatest(de, en, es, fr) = 0 THEN 'und'
             |   WHEN de = greatest(de, en, es, fr) THEN 'de'
             |   WHEN en = greatest(de, en, es, fr) THEN 'en'
             |   WHEN es = greatest(de, en, es, fr) THEN 'es'
             |   ELSE 'fr' END AS lang_pred, COUNT(*) AS docs
             | FROM s GROUP BY 1 ORDER BY 1""".stripMargin),
      "language-ID heuristic histogram (marker-token profiles, oracle)"),

    "q_vocab_topk" -> QueryDef(
      (s, dir) =>
        // corpus vocabulary heavy hitters: explode → partial-agg count →
        // tiny top-k (TakeOrderedAndProject). Deterministic tie-break
        // (count desc, token asc) keeps the cut oracle-stable.
        T(s, dir, "documents")
          .select(explode(split(trim(lower(col("text"))), "\\s+"))
            .as("token"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(desc("cnt"), asc("token"))
          .limit(20),
      Some("""SELECT t AS token, COUNT(*) AS cnt
             | FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)),
             |   '\s+')) AS t FROM documents)
             | GROUP BY t ORDER BY cnt DESC, token ASC LIMIT 20""".stripMargin),
      "vocabulary top-k heavy hitters (oracle-checked)"),

    "q_dedup_bloom_incremental" -> QueryDef(
      (s, dir) => {
        // incremental dedup: historical corpus (doc_id < 400) vs incoming
        // batch, keyed by a 20-char prefix fingerprint (boilerplate
        // detection shape). Bloom pre-filter + exact confirm == plain
        // semi join (oracle-checked).
        val d = T(s, dir, "documents")
        val corpus = d.filter(col("doc_id") < 400)
        val batch = d.filter(col("doc_id") >= 400)
        BloomDedup.duplicates(corpus, batch,
            substring(col("text"), 1, 20),
            expectedItems = 100000L, numBits = 800000L)
          .select(col("doc_id"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT b.doc_id FROM documents b
             | WHERE b.doc_id >= 400 AND EXISTS (
             |   SELECT 1 FROM documents c WHERE c.doc_id < 400
             |     AND substr(c.text, 1, 20) = substr(b.text, 1, 20))
             | ORDER BY b.doc_id""".stripMargin),
      "incremental dedup: Bloom pre-filter + exact confirm (oracle)"),

    "q_neardup_components" -> QueryDef(
      (s, dir) => {
        // cluster-level dedup: pairs don't dedup a corpus, components do
        // (similarity is transitive A~B~C). Edge set here: consecutive
        // doc_ids sharing a language — long chains that exercise the
        // multi-hop pointer-jumping path. Oracle: DuckDB recursive CTE.
        val d = T(s, dir, "documents").select(col("doc_id"), col("lang"))
        val a = d.select(col("doc_id").as("id_a"), col("lang").as("la"))
        val b = d.select((col("doc_id") - 1).as("id_a"),
          col("doc_id").as("id_b"), col("lang").as("lb"))
        val edges = a.join(b, Seq("id_a"))
          .filter(col("la") === col("lb"))
          .select(col("id_a"), col("id_b"))
        NearDup.connectedComponents(edges)
          .groupBy(col("component"))
          .agg(count(lit(1)).as("n_members"))
          .orderBy(col("component"))
      },
      Some("""WITH RECURSIVE e AS (
             |   SELECT a.doc_id AS id_a, b.doc_id AS id_b
             |   FROM documents a JOIN documents b
             |     ON b.doc_id = a.doc_id + 1 AND b.lang = a.lang),
             | sym AS (SELECT id_a AS src, id_b AS dst FROM e
             |   UNION ALL SELECT id_b, id_a FROM e),
             | r(id, lbl) AS (
             |   SELECT src, src FROM sym
             |   UNION
             |   SELECT sym.src, r.lbl FROM sym JOIN r ON r.id = sym.dst),
             | comp AS (SELECT id, MIN(lbl) AS component FROM r GROUP BY id)
             | SELECT component, COUNT(*) AS n_members
             | FROM comp GROUP BY component ORDER BY component""".stripMargin),
      "connected-components dedup clusters (pointer jumping; oracle via recursive CTE)"),

    "q_corpus_curation" -> QueryDef(
      (s, dir) => {
        // the flagship curation pipeline, oracle-checked end to end:
        // language-ID gate → quality threshold → exact dedup (keep-first
        // by digest) → per-source token accounting. One scan, one window
        // shuffle on the digest, one tiny grouped result.
        val d = T(s, dir, "documents")
        val scored = d.select(
            col("doc_id"), col("source"),
            TextStats.langId(col("text")).as("__lang"),
            TextStats.qualityScore(col("text")).as("__q"),
            TextStats.fingerprintMd5(col("text")).as("__fp"),
            TextStats.tokenCount(col("text")).as("__tok"))
          .filter(col("__lang") === "en" && col("__q") >= 0.5)
        val w = Window.partitionBy(col("__fp")).orderBy(col("doc_id"))
        scored.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("kept_docs"),
            sum(col("__tok").cast("long")).as("kept_tokens"))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (SELECT doc_id, source, text,
             |   regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |   FROM documents),
             | s AS (SELECT doc_id, source, text,
             |   CASE WHEN greatest(
             |       len(list_filter(ts, x -> x IN ('der','die','und','das','ist','nicht','ein','zu'))),
             |       len(list_filter(ts, x -> x IN ('the','and','of','to','in','is','that','it'))),
             |       len(list_filter(ts, x -> x IN ('el','la','de','que','y','en','los','una'))),
             |       len(list_filter(ts, x -> x IN ('le','la','de','et','est','les','une','dans')))) = 0
             |     THEN 'und'
             |     WHEN len(list_filter(ts, x -> x IN ('der','die','und','das','ist','nicht','ein','zu'))) = greatest(
             |       len(list_filter(ts, x -> x IN ('der','die','und','das','ist','nicht','ein','zu'))),
             |       len(list_filter(ts, x -> x IN ('the','and','of','to','in','is','that','it'))),
             |       len(list_filter(ts, x -> x IN ('el','la','de','que','y','en','los','una'))),
             |       len(list_filter(ts, x -> x IN ('le','la','de','et','est','les','une','dans')))) THEN 'de'
             |     WHEN len(list_filter(ts, x -> x IN ('the','and','of','to','in','is','that','it'))) = greatest(
             |       len(list_filter(ts, x -> x IN ('der','die','und','das','ist','nicht','ein','zu'))),
             |       len(list_filter(ts, x -> x IN ('the','and','of','to','in','is','that','it'))),
             |       len(list_filter(ts, x -> x IN ('el','la','de','que','y','en','los','una'))),
             |       len(list_filter(ts, x -> x IN ('le','la','de','et','est','les','une','dans')))) THEN 'en'
             |     WHEN len(list_filter(ts, x -> x IN ('el','la','de','que','y','en','los','una'))) = greatest(
             |       len(list_filter(ts, x -> x IN ('der','die','und','das','ist','nicht','ein','zu'))),
             |       len(list_filter(ts, x -> x IN ('the','and','of','to','in','is','that','it'))),
             |       len(list_filter(ts, x -> x IN ('el','la','de','que','y','en','los','una'))),
             |       len(list_filter(ts, x -> x IN ('le','la','de','et','est','les','une','dans')))) THEN 'es'
             |     ELSE 'fr' END AS lang_pred,
             |   0.5 * (len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |       x -> x IN ('the','a','of','and','to','in','is','it')))
             |     / len(regexp_split_to_array(trim(text), '\s+')))
             |   + 0.3 * (CASE WHEN len(regexp_split_to_array(trim(text), '\s+'))
             |       BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
             |   + 0.2 * (1.0 - LENGTH(regexp_replace(text, '[a-z0-9\s]', '', 'g'))
             |     / LENGTH(text)) AS q,
             |   len(regexp_split_to_array(trim(text), '\s+')) AS tok
             |   FROM t),
             | f AS (SELECT doc_id, source, tok,
             |   ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
             |   FROM s WHERE lang_pred = 'en' AND q >= 0.5)
             | SELECT source, COUNT(*) AS kept_docs,
             |   CAST(SUM(tok) AS BIGINT) AS kept_tokens
             | FROM f WHERE rn = 1
             | GROUP BY source ORDER BY source""".stripMargin),
      "flagship corpus curation: lang gate + quality + dedup + accounting"),

    "q_ann_ivf_topk" -> QueryDef(
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        val probes = emb.orderBy(col("vec_id")).limit(5)
        Ann.ivfTopK(emb, probes, "vec_id", "embedding", k = 10,
          nCells = 8, nProbe = 3)
      },
      None,
      "IVF (inverted-file) approximate cosine top-k — the partitioned scale path"),

    "q_mm_decode" -> QueryDef(
      (s, dir) => {
        // multimodal plumbing demo: documents bytes as opaque media
        // payloads → stub decode → per-type stats over decoded features
        val media = Multimodal.asMedia(
          T(s, dir, "documents").withColumn("payload",
            col("text").cast("binary")),
          "doc_id", "payload", "image")
        Multimodal.decode(media)
          .groupBy(col("media_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("decoded.n_bytes").cast("long")).as("total_bytes"),
            sum(floor(col("decoded.mean_byte") * 1000)).as("mean_byte_milli"))
          .orderBy(col("media_type"))
      },
      None,
      "multimodal: binary payload + stubbed decode, partition-local"),

    "q_mm_frame_sample" -> QueryDef(
      (s, dir) => {
        val media = Multimodal.asMedia(
          T(s, dir, "documents").withColumn("payload",
            col("text").cast("binary")),
          "doc_id", "payload", "video")
        Multimodal.frameSample(media, stride = 10)
          .groupBy(col("media_id") % 10)
          .agg(count(lit(1)).as("frames"))
          .withColumnRenamed("(media_id % 10)", "bucket")
          .orderBy(col("bucket"))
      },
      None,
      "multimodal: video frame sampling at stride"),

    "q_cosine_adjacent" -> QueryDef(
      (s, dir) => {
        // the embedding-similarity primitive, oracle-checked end to end:
        // native codegen'd cosine (fused dot+norm loop) over a
        // deterministic pair set; bit-identical to DuckDB list_dot_product
        // because both accumulate sequentially in double
        val e = T(s, dir, "embeddings")
        val a = e.select(col("vec_id"), col("embedding").as("__ea"))
        val b = e.select((col("vec_id") - 1).as("vec_id"),
          col("embedding").as("__eb"))
        a.join(b, Seq("vec_id"))
          .withColumn("cosine",
            graft.functions.VectorMath.cosine_sim(col("__ea"), col("__eb")))
          .select(col("vec_id"), col("cosine"),
            // NOT isnan guard: Spark evaluates NaN > x as false but
            // DuckDB orders NaN greater-than-all — make both sides
            // explicit so a degenerate (zero-norm) vector can't split
            // the oracle
            (col("cosine") > 0.95 && !isnan(col("cosine"))).as("is_dup"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH d AS (SELECT vec_id,
             |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |   FROM embeddings)
             | SELECT a.vec_id,
             |   list_dot_product(a.v, b.v)
             |     / (sqrt(list_dot_product(a.v, a.v))
             |      * sqrt(list_dot_product(b.v, b.v))) AS cosine,
             |   list_dot_product(a.v, b.v)
             |     / (sqrt(list_dot_product(a.v, a.v))
             |      * sqrt(list_dot_product(b.v, b.v))) > 0.95
             |   AND NOT isnan(list_dot_product(a.v, b.v)
             |     / (sqrt(list_dot_product(a.v, a.v))
             |      * sqrt(list_dot_product(b.v, b.v)))) AS is_dup
             | FROM d a JOIN d b ON b.vec_id = a.vec_id + 1
             | ORDER BY a.vec_id""".stripMargin),
      "native codegen'd cosine over adjacent embedding pairs (oracle)"),

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
