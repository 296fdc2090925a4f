package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}
import graft.multimodal.Multimodal
import graft.sim.Ann
import graft.text.{BloomDedup, Decontaminate, NearDup, TextStats}

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

  /** Ground truth for the near-dup family: exact all-pairs 3-gram Jaccard
    * >= 0.5 in DuckDB — a completeness gate, not just a sanity row: the
    * engine-side queries must reach the same pair set through
    * bucket-local candidate generation + exact verify. Shingle
    * construction mirrors NearDup.shingles exactly (proven bit-compatible
    * by q_ngram_jaccard).
    *
    * DUPLICATE-COLLAPSED (round-8, closing the round-7 sf1 skips): the
    * all-pairs join runs over DISTINCT texts, and member doc_ids expand
    * only at the end — EXACT, not approximate: identical texts have
    * identical shingle sets, so (a) a cross pair's Jaccard is the same
    * for every member combination and (b) a within-group pair's Jaccard
    * is 1.0 by definition. This is the same collapse the engine itself
    * performs (NearDup.minHashPairs), so the truth oracle now terminates
    * at the replicated scale points (sf1: 50 k docs but 4 992 distinct
    * texts ⇒ the quadratic stage is sf0.1-sized) instead of timing out.
    * Proven pair-for-pair EQUAL to the raw all-pairs form at sf0.01 and
    * sf0.1 before the swap.
    *
    * SPARSE COUNT-JOIN (round-8): even duplicate-collapsed, the n²/2
    * pair enumeration with a per-pair list_intersect (~5 k distinct
    * texts ⇒ 12.5 M intersections over few-hundred-element lists) runs
    * tens of minutes in DuckDB at the sf1 scale point. The intersection
    * size is instead computed by the classic sparse-vector join: unnest
    * each distinct text's (already-distinct) shingle set, equi-join on
    * the shingle, and COUNT(*) per (rep_a, rep_b) — exactly
    * |gs_a ∩ gs_b|, no list ops. Pairs sharing ZERO shingles never
    * appear, but their Jaccard is 0 and every consumer of this truth
    * table filters `jaccard >= 0.5`, so the result set is IDENTICAL
    * (asserted by the unchanged gate hashes at sf0.01/sf0.1). Cost is
    * Σ_s cnt(s)² join rows (2.8 M at sf1, measured) instead of n²/2
    * intersections — seconds, not tens of minutes.
    */
  private val ExactNearDupPairsSql: String =
    """WITH grp AS (SELECT text, min(doc_id) AS rep,
      |   list_sort(list(doc_id)) AS ids
      |   FROM documents GROUP BY text),
      | t AS (SELECT rep, ids,
      |   regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |   FROM grp),
      | g AS (SELECT rep, ids,
      |   list_distinct(list_transform(range(1, greatest(len(ts)-2,1)+1),
      |     i -> array_to_string(ts[i:least(i+2, len(ts))], ' '))) AS gs
      |   FROM t),
      | u AS (SELECT rep, unnest(gs) AS s FROM g),
      | iv AS (SELECT a.rep AS ra, b.rep AS rb, count(*) AS inter
      |   FROM u a JOIN u b ON a.s = b.s AND a.rep < b.rep
      |   GROUP BY a.rep, b.rep),
      | vp AS (SELECT ga.ids AS ids_a, gb.ids AS ids_b,
      |   CAST(iv.inter AS DOUBLE)
      |     / (len(ga.gs) + len(gb.gs) - iv.inter) AS jaccard
      |   FROM iv JOIN g ga ON ga.rep = iv.ra
      |     JOIN g gb ON gb.rep = iv.rb),
      | p AS (
      |   SELECT least(ua.ia, ub.ib) AS id_a,
      |     greatest(ua.ia, ub.ib) AS id_b, jaccard
      |   FROM vp CROSS JOIN UNNEST(ids_a) AS ua(ia)
      |     CROSS JOIN UNNEST(ids_b) AS ub(ib)
      |   UNION ALL
      |   SELECT u1.ia AS id_a, u2.ib AS id_b, CAST(1.0 AS DOUBLE) AS jaccard
      |   FROM grp CROSS JOIN UNNEST(ids) AS u1(ia)
      |     CROSS JOIN UNNEST(ids) AS u2(ib)
      |   WHERE u1.ia < u2.ib)
      |""".stripMargin

  /** The adjacent-pair variant of [[ExactNearDupPairsSql]] (pairs are
    * (doc_id, doc_id+1) instead of all pairs) — the deterministic pair
    * set used by the estimator/verification gates.
    */
  private val ExactNearDupPairsAdjacentSql: String =
    """WITH t AS (SELECT doc_id,
      |   regexp_split_to_array(trim(lower(text)), '\s+') AS ts
      |   FROM documents),
      | g AS (SELECT doc_id,
      |   list_distinct(list_transform(range(1, greatest(len(ts)-2,1)+1),
      |     i -> array_to_string(ts[i:least(i+2, len(ts))], ' '))) AS gs
      |   FROM t),
      | p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |   CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE)
      |     / (len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)))
      |     AS jaccard
      |   FROM g a JOIN g b ON b.doc_id = a.doc_id + 1)
      |""".stripMargin

  /** Session-cached MinHash near-dup pair table (3-gram shingles, 8
    * hash tables, jaccard >= 0.5) — the corpus's materialized dedup
    * pair set. A production session persists exactly this artifact
    * (every dedup decision reads it); here it serves q_minhash_neardup
    * (its output), q_simhash_neardup (the recall denominator), and any
    * future cluster consumer, one LSH+verify pass per session.
    */
  private def cachedMinHashPairs(s: SparkSession, dir: String): DataFrame =
    graft.core.FrameCache.cached(s, s"minhash_pairs:3:8:0.5:$dir") {
      NearDup.minHashPairs(T(s, dir, "documents"), "doc_id", "text",
        minJaccard = 0.5)
    }

  /** The self-seeded containment corpus shared by q_containment_dedup and
    * q_containment_stats: documents plus truncated 15-token prefixes of
    * the first 40 docs (q_dedup_exact_stats convention — prefix 3-grams
    * are a subset of the source doc's by construction).
    */
  private def seededContainmentDocs(s: SparkSession, dir: String)
      : DataFrame = {
    val d = T(s, dir, "documents")
    val toks = split(trim(lower(col("text"))), "\\s+")
    d.select(col("doc_id"), col("text")).unionByName(
      d.filter(col("doc_id") < 40 && size(toks) >= 18)
        .select((-col("doc_id") - 1).as("doc_id"),
          array_join(slice(toks, 1, 15), " ").as("text")))
  }

  /** Session-cached collapsed containment frames over the seeded corpus —
    * round 14 session 2: q_containment_dedup and q_containment_stats each
    * re-ran the IDENTICAL rarest-shingle blocking + exact subset verify
    * per execution (probe: 1.7 s of machinery shared by two ~2 s
    * queries). One FrameCache entry encodes BOTH containmentSetPairs
    * outputs (members rows tagged 'm' = (set digest, doc id), strict
    * set-level pairs tagged 'p' = (contained digest, container digest)),
    * so one build serves both consumers — the cachedMinHashPairs pattern;
    * the build is charged to the bench's cache_build_sec ledger.
    */
  private def cachedSeededContainment(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    cachedContainmentFrames(s, s"containment_seeded:3:$dir",
      seededContainmentDocs(s, dir))

  /** One FrameCache entry encoding BOTH containmentSetPairs outputs
    * (members rows tagged 'm' = (set digest, doc id), strict set-level
    * pairs tagged 'p' = (contained digest, container digest)) — one
    * build serves every consumer of the corpus named by `cacheKey`.
    */
  private def cachedContainmentFrames(s: SparkSession, cacheKey: String,
      docs: => DataFrame): (DataFrame, DataFrame) = {
    val both = graft.core.FrameCache.cached(s, cacheKey) {
      val (members, setPairs) =
        NearDup.containmentSetPairs(docs, "doc_id", "text", 3)
      members.select(lit("m").as("__tag"), col("__did").as("__a"),
          col("__id").as("__b"))
        .unionByName(setPairs.select(lit("p").as("__tag"),
          col("__da").as("__a"), col("__db").as("__b")))
    }
    (both.filter(col("__tag") === "m")
        .select(col("__a").as("__did"), col("__b").as("__id")),
      both.filter(col("__tag") === "p")
        .select(col("__a").as("__da"), col("__b").as("__db")))
  }

  /** Session-cached near-dup components over the lang-chain edge set
    * (consecutive doc_ids sharing a language — long chains that exercise
    * the multi-hop pointer-jumping path). The iterative clusterer is the
    * dominant cost of BOTH q_neardup_components (cluster sizes) and
    * q_canonical_select (per-cluster argmax), so it materializes once
    * per (session, dir) via FrameCache — one O(log n)-round clustering
    * job per session instead of one per consumer.
    */
  private def cachedLangChainComponents(
      s: SparkSession, dir: String): DataFrame =
    graft.core.FrameCache.cached(s, s"langchain_components:$dir") {
      val d = T(s, dir, "documents").select(col("doc_id"), col("lang"))
      val a = d.select(col("doc_id").as("id_a"), col("lang").as("la"))
      val b = d.select((col("doc_id") - 1).as("id_a"),
        col("doc_id").as("id_b"), col("lang").as("lb"))
      val edges = a.join(b, Seq("id_a"))
        .filter(col("la") === col("lb"))
        .select(col("id_a"), col("id_b"))
      NearDup.connectedComponents(edges)
    }

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
      (s, dir) => {
        // self-seeding: the synthetic corpus has no byte-identical texts,
        // so union a re-keyed slice — the HAVING branch then returns real
        // duplicate groups instead of passing vacuously on 0 rows
        val d = T(s, dir, "documents")
        val seeded = d.select(col("doc_id"), col("text")).unionByName(
          d.filter(col("doc_id") < 50)
            .select((-col("doc_id") - 1).as("doc_id"), col("text")))
        seeded
          .groupBy(TextStats.fingerprintMd5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("keep_id"),
            count(lit(1)).as("copies"))
          .filter(col("copies") > 1)
          .orderBy(col("h"))
      },
      Some("""WITH u AS (SELECT doc_id, text FROM documents
             |   UNION ALL
             |   SELECT -doc_id - 1, text FROM documents WHERE doc_id < 50)
             | SELECT md5(text) AS h, MIN(doc_id) AS keep_id,
             | COUNT(*) AS copies FROM u
             | GROUP BY md5(text) HAVING COUNT(*) > 1
             | ORDER BY h""".stripMargin),
      "exact dedup: duplicate-group stats by digest (self-seeded dups)"),

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
        // one fused TextProfile scan (was 4 separate tokenizations of
        // the same text); derived values bit-identical to the
        // declarative forms (TextProfileSpec)
        T(s, dir, "documents")
          .select(col("doc_id"),
            TextStats.profile(col("text")).as("__p"))
          .select(
            col("doc_id"),
            TextStats.tokenCountFrom(col("__p")).as("n_tokens"),
            (TextStats.stopwordCountFrom(col("__p")) /
              TextStats.tokenCountFrom(col("__p"))).as("stop_ratio"),
            TextStats.qualityScoreFrom(col("__p")).as("quality"))
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
      (s, dir) =>
        // exact 3-gram Jaccard over a deterministic pair set (adjacent
        // doc_ids) — the verification primitive of the near-dup family,
        // oracle-checked end to end. The adjacent specialization
        // assembles each pair with ONE exchange (see
        // NearDup.adjacentNgramJaccard; equality with the general join
        // shape is pinned in NearDupSpec).
        NearDup.adjacentNgramJaccard(T(s, dir, "documents"),
          "doc_id", "text", n = 3),
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
        // one fused TextProfile scan per row feeds both tokenizer counts
        T(s, dir, "documents")
          .select(col("source"), TextStats.profile(col("text")).as("__p"))
          .groupBy(col("source"))
          .agg(
            sum(TextStats.regexTokenCountFrom(col("__p")).cast("long"))
              .as("regex_tokens"),
            sum(TextStats.tokenCountFrom(col("__p")).cast("long"))
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
      (s, dir) => {
        // the rolling min-hash fingerprint's quality contract, asserted
        // against exact ground truth: every true near-dup pair (exact
        // 3-gram Jaccard >= 0.5 — these sit at j>=0.9, sharing most
        // 16-byte windows, so the minimizing window is shared) must get
        // the same fingerprint. The wraparound Long arithmetic itself is
        // not SQL-expressible; the agreement property is.
        val docs = T(s, dir, "documents")
        // round-14 session 2: the true-pair set here is EXACTLY the frame
        // the session already materializes for q_minhash_neardup /
        // q_simhash_neardup / q_curation_pipeline (same table, same n/
        // bands/threshold/seed) — re-deriving it per execution was the
        // whole query wall (probe: fresh minHashPairs 2.6 s of the 2.3 s
        // query; the rolling fingerprints under test cost 0.1 s). Shared
        // via cachedMinHashPairs like every other consumer; the build is
        // charged to the bench's cache_build_sec ledger, per its
        // round-7 attribution contract.
        val pairs = cachedMinHashPairs(s, dir)
          .select(col("id_a"), col("id_b"))
        val fps = docs.select(col("doc_id"),
          graft.functions.RollingFingerprint
            .rolling_fingerprint(col("text")).as("__fp"))
        pairs
          .join(fps.select(col("doc_id").as("id_a"),
            col("__fp").as("__fa")), Seq("id_a"))
          .join(fps.select(col("doc_id").as("id_b"),
            col("__fp").as("__fb")), Seq("id_b"))
          .agg(count(lit(1)).as("n_pairs"),
            sum((col("__fa") === col("__fb")).cast("long")).as("__match"))
          .select(col("n_pairs"),
            (col("__match") / col("n_pairs") >= 0.8).as("match_rate_ok"))
      },
      // the min-window fingerprint is probabilistic per pair (the
      // minimizing window can fall in the edited region — measured
      // agreement 24/25 at sf0.01, 252/256 at sf0.1), so the gate asserts
      // the aggregate agreement rate; DuckDB recomputes the exact pair
      // count
      Some(ExactNearDupPairsSql +
        """SELECT COUNT(*) AS n_pairs, TRUE AS match_rate_ok
          | FROM p WHERE jaccard >= 0.5""".stripMargin),
      "native codegen'd rolling-hash fingerprint: agreement rate on true " +
        "near-dup pairs asserted vs exact ground truth"),

    "q_dedup_embedding" -> QueryDef(
      (s, dir) => {
        // embedding-cosine near-dup (semantic dedup primitive): the LSH
        // path proposes each probe's nearest semantic neighbor; the gate
        // asserts in-query that the proposed neighbor lands in the exact
        // cosine top-10 for every probe (measured: 50/50, with 49/50
        // hitting the exact top-1). The dedup decision itself is a
        // threshold over this candidate set.
        val emb = T(s, dir, "embeddings")
        // 50 rows, consumed by three subplans (LSH, brute gate, final
        // frame) — checkpointed so the TakeOrdered scan runs once
        val probes = emb.orderBy(col("vec_id")).limit(50).localCheckpoint()
        val nn = Ann.lshTopK(emb, probes, "vec_id", "embedding", k = 1,
          bucketLength = 2.0, numHashTables = 4)
        val brute10 = Ann.bruteForceTopK(emb, probes, "vec_id", "embedding",
          k = 10)
        probes.select(col("vec_id").as("probe_id"))
          .join(
            nn.join(brute10.select(col("probe_id"), col("neighbor_id")),
                Seq("probe_id", "neighbor_id"), "left_semi")
              .select(col("probe_id"), lit(true).as("__in_top10")),
            Seq("probe_id"), "left")
          .select(col("probe_id"),
            coalesce(col("__in_top10"), lit(false)).as("nn_ok"))
          .orderBy(col("probe_id"))
      },
      Some("""SELECT vec_id AS probe_id, TRUE AS nn_ok
             | FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 50) t
             | ORDER BY probe_id""".stripMargin),
      "embedding-cosine near-dup (LSH-bucketed) with exact-top-10 " +
        "containment asserted in-query"),

    "q_minhash_neardup" -> QueryDef(
      (s, dir) =>
        cachedMinHashPairs(s, dir)
          .orderBy(col("id_a"), col("id_b")),
      // full-equality oracle vs exact all-pairs Jaccard: green means the
      // banded LSH candidate generation found EVERY true pair (the
      // synthetic near-dups sit at j>=0.9, where 8-table MinHash miss
      // probability is ~(1-j)^8 ~ 1e-8) and the exact-verify stage agreed
      // bit-for-bit with DuckDB on the Jaccard values
      Some(ExactNearDupPairsSql +
        """SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5
          | ORDER BY id_a, id_b""".stripMargin),
      "MinHash-LSH near-dup pairs, bucket-local join + exact verify " +
        "(completeness-checked vs exact all-pairs)"),

    "q_containment_dedup" -> QueryDef(
      (s, dir) => {
        // full-containment dedup — the inclusion/quotation case Jaccard
        // near-dup misses: a short doc fully embedded in a longer one has
        // tiny Jaccard but containment 1.0. Finds every (A, B) with
        // shingles(A) ⊆ shingles(B) via RAREST-SHINGLE BLOCKING, which is
        // COMPLETE, not approximate: if S_A ⊆ S_B then A's globally
        // rarest shingle (tie-broken (count, shingle) — deterministic)
        // is in B, so the pair surfaces in that shingle's posting list.
        // Candidate volume is Σ_A |posting(rarest(A))| — rarest shingles
        // have the SHORTEST posting lists, the classic record-linkage
        // blocking bound — and the exact verify joins only candidate
        // pairs' shingle sets, never all-pairs. The synthetic corpus has
        // no natural full-subset pairs, so the corpus self-seeds
        // truncated 15-token prefixes (q_dedup_exact_stats convention);
        // prefix 3-grams are a subset of the source doc's by
        // construction. The oracle recomputes the full-subset pair set
        // exactly (all-pairs list_intersect — oracle-side O(n²) is fine
        // at gate scale), so green proves blocking completeness AND
        // exact verification.
        // blocking and verification live in NearDup.containmentSetPairs
        // (64-bit rolling-hash shingles — equality-only downstream, so
        // longs shuffle ~5× less than gram strings; completeness
        // property-tested on random corpora). Round 14 session 2: the
        // collapsed frames come from the session cache shared with
        // q_containment_stats (see cachedSeededContainment) — this query
        // is their member-level expansion, as q_minhash_neardup is for
        // the cached minhash pair set.
        val (members, setPairs) = cachedSeededContainment(s, dir)
        NearDup.containmentExpand(members, setPairs)
          .orderBy(col("id_a"), col("id_b"))
      },
      // duplicate-collapsed truth (round-8, same construction as
      // ExactNearDupPairsSql): the subset check runs once per DISTINCT
      // text — exact, since identical texts have identical shingle sets:
      // a text group's members inherit every cross containment in both
      // directions via the rep != rep join (equal-set different-text
      // pairs included), and within a group every ordered member pair
      // is a mutual containment. Proven pair-for-pair EQUAL to the raw
      // all-pairs form at sf0.01/sf0.1 before the swap; terminates at
      // sf1/sf10 where the raw form is copy-quadratic.
      //
      // Round-8: the subset test itself uses the same sparse count-join
      // as ExactNearDupPairsSql (unnest shingles, equi-join, COUNT(*) =
      // |gs_a ∩ gs_b|) instead of n²/2 list_intersect calls — exact: a
      // contained a shares ALL its (≥1) shingles with b, so every true
      // containment pair appears in the count-join; inter = len(gs_a)
      // is the same subset predicate; equal-set pairs fire both UNION
      // branches, matching the original's both-direction emission.
      Some("""WITH base AS (SELECT doc_id, text FROM documents
             |   UNION ALL
             |   SELECT -doc_id - 1 AS doc_id,
             |     array_to_string((regexp_split_to_array(
             |       trim(lower(text)), '\s+'))[1:15], ' ') AS text
             |   FROM documents
             |   WHERE doc_id < 40 AND len(regexp_split_to_array(
             |     trim(lower(text)), '\s+')) >= 18),
             | grp AS (SELECT text, min(doc_id) AS rep,
             |     list_sort(list(doc_id)) AS ids
             |   FROM base GROUP BY text),
             | t AS (SELECT rep, ids,
             |     regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |   FROM grp),
             | g AS (SELECT rep, ids,
             |     list_distinct(list_transform(
             |       range(1, greatest(len(ts)-2,1)+1),
             |       i -> array_to_string(ts[i:least(i+2, len(ts))], ' ')))
             |       AS gs
             |   FROM t),
             | u AS (SELECT rep, unnest(gs) AS s FROM g),
             | iv AS (SELECT a.rep AS ra, b.rep AS rb, count(*) AS inter
             |   FROM u a JOIN u b ON a.s = b.s AND a.rep < b.rep
             |   GROUP BY a.rep, b.rep),
             | vp AS (SELECT ga.ids AS ids_a, gb.ids AS ids_b
             |     FROM iv JOIN g ga ON ga.rep = iv.ra
             |       JOIN g gb ON gb.rep = iv.rb
             |     WHERE iv.inter = len(ga.gs)
             |   UNION ALL
             |   SELECT gb.ids AS ids_a, ga.ids AS ids_b
             |     FROM iv JOIN g ga ON ga.rep = iv.ra
             |       JOIN g gb ON gb.rep = iv.rb
             |     WHERE iv.inter = len(gb.gs)),
             | p AS (
             |   SELECT ua.ia AS id_a, ub.ib AS id_b
             |   FROM vp CROSS JOIN UNNEST(ids_a) AS ua(ia)
             |     CROSS JOIN UNNEST(ids_b) AS ub(ib)
             |   UNION ALL
             |   SELECT u1.ia AS id_a, u2.ib AS id_b
             |   FROM grp CROSS JOIN UNNEST(ids) AS u1(ia)
             |     CROSS JOIN UNNEST(ids) AS u2(ib)
             |   WHERE u1.ia != u2.ib)
             | SELECT id_a, id_b FROM p ORDER BY id_a, id_b""".stripMargin),
      "full-containment dedup via complete rarest-shingle blocking + " +
        "exact subset verify — the inclusion case Jaccard misses"),

    "q_neardup_pair_stats" -> QueryDef(
      (s, dir) => {
        // The BOUNDED production shape of the near-dup pair list (round-8
        // verdict #6): a jaccard-decile histogram of member-level pair
        // counts, computed ENTIRELY COLLAPSED — LSH banding + exact
        // verify run on distinct texts, and member multiplicities enter
        // as integer weights (cross text-pairs contribute cnt_a·cnt_b,
        // identical-text groups C(cnt,2) at jaccard exactly 1.0). No
        // member-level pair row ever exists in the engine, so cost
        // scales with DISTINCT-text pairs while the exact gates
        // (q_minhash_neardup) stay the full-list contract at gate scale.
        // Output ≤ 6 rows (deciles 5..10).
        // (round-14 session 2 probed a fused single groupBy carrying
        // (count, first(text)) and fused+localCheckpoint here — the
        // two-aggregation form below stays FASTEST on same-JVM minima
        // (1.31 vs 1.58 vs 1.85 s, Probe ndtk_*): the skinny count
        // aggregate never carries text, and dragging it through a First
        // buffer costs more than the second exchange saves.)
        val docs = T(s, dir, "documents")
        val fp = xxhash64(col("text"))
        val counts = docs.groupBy(fp.as("__fp"))
          .agg(count(lit(1)).as("__cnt"))
        val dist = docs.select(fp.as("__fp"), col("text"))
          .dropDuplicates("__fp")
        // round-14: call the distinct-text core directly — this frame is
        // already one row per fingerprint, so the minHashPairs wrapper's
        // members checkpoint / re-dedup / identity joins / empty
        // within-branch were pure overhead (its id_a = least(fa,fb) = fa
        // here, since __fa < __fb by construction). Bit-identical pairs.
        val cross = NearDup.minHashFpPairs(dist, "text", minJaccard = 0.5)
          .select(col("__fa").as("id_a"), col("__fb").as("id_b"),
            col("jaccard"))
          .join(counts.select(col("__fp").as("id_a"),
            col("__cnt").as("__ca")), Seq("id_a"))
          .join(counts.select(col("__fp").as("id_b"),
            col("__cnt").as("__cb")), Seq("id_b"))
          .select(col("jaccard"), (col("__ca") * col("__cb")).as("__w"))
        val within = counts.filter(col("__cnt") >= 2)
          .select(lit(1.0d).as("jaccard"),
            expr("__cnt * (__cnt - 1) DIV 2").as("__w"))
        cross.unionByName(within)
          .groupBy(floor(col("jaccard") * 10).cast("int").as("j_decile"))
          .agg(sum(col("__w")).as("n_pairs"))
          .orderBy(col("j_decile"))
      },
      // truth buckets the exact member-level pair set; decile edges are
      // IEEE-double floor(j*10) on bit-identical jaccard values (the
      // full-value q_minhash_neardup gate proves both engines agree)
      Some(ExactNearDupPairsSql +
        """SELECT CAST(FLOOR(jaccard * 10) AS INT) AS j_decile,
          |   COUNT(*) AS n_pairs
          | FROM p WHERE jaccard >= 0.5
          | GROUP BY 1 ORDER BY j_decile""".stripMargin),
      "bounded near-dup gate: jaccard-decile histogram of pair counts, " +
        "computed collapsed (weights, never member pairs)"),

    "q_neardup_topk_pairs" -> QueryDef(
      (s, dir) => {
        // Deterministic top-k SAMPLE of the near-dup pair list (round-8
        // verdict #6): the top 20 distinct-text pairs by (jaccard desc,
        // rep_a, rep_b), each with the member-pair count it stands for —
        // what a curation dashboard shows instead of the O(copies²)
        // list. Representatives are min member doc_id per text group, so
        // the output is engine-independent; TakeOrderedAndProject keeps
        // the sort a per-partition top-k + driver merge of 20 rows, not
        // a total order.
        // (two-aggregation shape deliberately kept — see the
        // q_neardup_pair_stats probe note; Probe ndtk_* pins this form
        // fastest against fused and fused+checkpoint)
        val docs = T(s, dir, "documents")
        val fp = xxhash64(col("text"))
        val grp = docs.groupBy(fp.as("__fp"))
          .agg(min(col("doc_id")).as("__rep"), count(lit(1)).as("__cnt"))
        val dist = docs.select(fp.as("__fp"), col("text"))
          .dropDuplicates("__fp")
        // round-14: distinct-text core directly (see q_neardup_pair_stats)
        NearDup.minHashFpPairs(dist, "text", minJaccard = 0.5)
          .select(col("__fa").as("id_a"), col("__fb").as("id_b"),
            col("jaccard"))
          .join(grp.select(col("__fp").as("id_a"), col("__rep").as("__ra"),
            col("__cnt").as("__ca")), Seq("id_a"))
          .join(grp.select(col("__fp").as("id_b"), col("__rep").as("__rb"),
            col("__cnt").as("__cb")), Seq("id_b"))
          .select(least(col("__ra"), col("__rb")).as("rep_a"),
            greatest(col("__ra"), col("__rb")).as("rep_b"),
            col("jaccard"),
            (col("__ca") * col("__cb")).as("n_member_pairs"))
          .orderBy(col("jaccard").desc, col("rep_a"), col("rep_b"))
          .limit(20)
      },
      Some("""WITH grp AS (SELECT text, min(doc_id) AS rep,
             |     count(*) AS cnt
             |   FROM documents GROUP BY text),
             | t AS (SELECT rep, cnt,
             |   regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |   FROM grp),
             | g AS (SELECT rep, cnt,
             |   list_distinct(list_transform(range(1, greatest(len(ts)-2,1)+1),
             |     i -> array_to_string(ts[i:least(i+2, len(ts))], ' '))) AS gs
             |   FROM t),
             | u AS (SELECT rep, unnest(gs) AS s FROM g),
             | iv AS (SELECT a.rep AS ra, b.rep AS rb, count(*) AS inter
             |   FROM u a JOIN u b ON a.s = b.s AND a.rep < b.rep
             |   GROUP BY a.rep, b.rep),
             | vp AS (SELECT iv.ra AS rep_a, iv.rb AS rep_b,
             |     CAST(iv.inter AS DOUBLE)
             |       / (len(ga.gs) + len(gb.gs) - iv.inter) AS jaccard,
             |     CAST(ga.cnt * gb.cnt AS BIGINT) AS n_member_pairs
             |   FROM iv JOIN g ga ON ga.rep = iv.ra
             |     JOIN g gb ON gb.rep = iv.rb)
             | SELECT rep_a, rep_b, jaccard, n_member_pairs FROM vp
             | WHERE jaccard >= 0.5
             | ORDER BY jaccard DESC, rep_a, rep_b LIMIT 20""".stripMargin),
      "bounded near-dup gate: deterministic top-20 representative pairs " +
        "with member-pair weights (dashboard shape, no list expansion)"),

    "q_containment_stats" -> QueryDef(
      (s, dir) => {
        // The BOUNDED production shape of containment dedup (round-8
        // verdict #6): a containers-per-document histogram, computed
        // ENTIRELY COLLAPSED on the distinct-shingle-set frames. Every
        // member of set a has the same container count — Σ cnt_b over
        // strict supersets b, plus (cnt_a - 1) mutual containments
        // inside its own equal-set group — so the histogram is a keyed
        // agg over set-level pairs; no member-level pair row ever
        // exists. Same self-seeded corpus as q_containment_dedup.
        // round 14 session 2: collapsed frames from the session cache
        // shared with q_containment_dedup (see cachedSeededContainment)
        val (members, setPairs) = cachedSeededContainment(s, dir)
        val sizes = members.groupBy(col("__did"))
          .agg(count(lit(1)).as("__cnt"))
        val strict = setPairs
          .join(sizes.select(col("__did").as("__db"),
            col("__cnt").as("__cb")), Seq("__db"))
          .groupBy(col("__da").as("__did"))
          .agg(sum(col("__cb")).as("__strict"))
        sizes.join(strict, Seq("__did"), "left")
          .select((coalesce(col("__strict"), lit(0L)) + col("__cnt") -
            lit(1L)).as("n_containers"), col("__cnt"))
          .filter(col("n_containers") > 0)
          .groupBy(col("n_containers"))
          .agg(sum(col("__cnt")).as("n_docs"))
          .orderBy(col("n_containers"))
      },
      // truth: per-contained-doc container counts from the exact
      // member-level containment pair set (same construction as the
      // q_containment_dedup oracle), then histogram
      Some("""WITH base AS (SELECT doc_id, text FROM documents
             |   UNION ALL
             |   SELECT -doc_id - 1 AS doc_id,
             |     array_to_string((regexp_split_to_array(
             |       trim(lower(text)), '\s+'))[1:15], ' ') AS text
             |   FROM documents
             |   WHERE doc_id < 40 AND len(regexp_split_to_array(
             |     trim(lower(text)), '\s+')) >= 18),
             | grp AS (SELECT text, min(doc_id) AS rep,
             |     list_sort(list(doc_id)) AS ids
             |   FROM base GROUP BY text),
             | t AS (SELECT rep, ids,
             |     regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |   FROM grp),
             | g AS (SELECT rep, ids,
             |     list_distinct(list_transform(
             |       range(1, greatest(len(ts)-2,1)+1),
             |       i -> array_to_string(ts[i:least(i+2, len(ts))], ' ')))
             |       AS gs
             |   FROM t),
             | u AS (SELECT rep, unnest(gs) AS s FROM g),
             | iv AS (SELECT a.rep AS ra, b.rep AS rb, count(*) AS inter
             |   FROM u a JOIN u b ON a.s = b.s AND a.rep < b.rep
             |   GROUP BY a.rep, b.rep),
             | vp AS (SELECT ga.ids AS ids_a, gb.ids AS ids_b
             |     FROM iv JOIN g ga ON ga.rep = iv.ra
             |       JOIN g gb ON gb.rep = iv.rb
             |     WHERE iv.inter = len(ga.gs)
             |   UNION ALL
             |   SELECT gb.ids AS ids_a, ga.ids AS ids_b
             |     FROM iv JOIN g ga ON ga.rep = iv.ra
             |       JOIN g gb ON gb.rep = iv.rb
             |     WHERE iv.inter = len(gb.gs)),
             | p AS (
             |   SELECT ua.ia AS id_a, ub.ib AS id_b
             |   FROM vp CROSS JOIN UNNEST(ids_a) AS ua(ia)
             |     CROSS JOIN UNNEST(ids_b) AS ub(ib)
             |   UNION ALL
             |   SELECT u1.ia AS id_a, u2.ib AS id_b
             |   FROM grp CROSS JOIN UNNEST(ids) AS u1(ia)
             |     CROSS JOIN UNNEST(ids) AS u2(ib)
             |   WHERE u1.ia != u2.ib),
             | pc AS (SELECT id_a, COUNT(*) AS n_containers FROM p
             |   GROUP BY id_a)
             | SELECT n_containers, COUNT(*) AS n_docs FROM pc
             | GROUP BY n_containers ORDER BY n_containers""".stripMargin),
      "bounded containment gate: containers-per-doc histogram from the " +
        "collapsed set-level frames (no member-pair expansion)"),

    "q_neardup_incremental" -> QueryDef(
      (s, dir) => {
        // ingest-time near-dup: an incoming batch (odd doc_ids) dedups
        // against the standing corpus (even doc_ids) — candidates come
        // only from cross-shard band-bucket collisions, never
        // corpus x corpus (see NearDup.minHashPairsAcross). The
        // completeness gate mirrors q_minhash_neardup: DuckDB recomputes
        // the exact cross-pair set, so green means banding found EVERY
        // true cross pair and the Jaccards agree bit-for-bit.
        val d = T(s, dir, "documents")
        val corpus = d.filter(pmod(col("doc_id"), lit(2)) === 0)
        val batch = d.filter(pmod(col("doc_id"), lit(2)) === 1)
        NearDup.minHashPairsAcross(corpus, batch, "doc_id", "text",
            minJaccard = 0.5)
          .select(col("id_a").as("corpus_id"), col("id_b").as("batch_id"),
            col("jaccard"))
          .orderBy(col("corpus_id"), col("batch_id"))
      },
      Some(ExactNearDupPairsSql +
        """SELECT CASE WHEN id_a % 2 = 0 THEN id_a ELSE id_b END
          |     AS corpus_id,
          |   CASE WHEN id_a % 2 = 0 THEN id_b ELSE id_a END AS batch_id,
          |   jaccard
          | FROM p
          | WHERE jaccard >= 0.5 AND (id_a % 2 = 0) != (id_b % 2 = 0)
          | ORDER BY corpus_id, batch_id""".stripMargin),
      "incremental cross-shard near-dup: batch-vs-corpus band-bucket " +
        "candidates only, exact verify, completeness vs exact truth"),

    "q_simhash_neardup" -> QueryDef(
      (s, dir) => {
        // SimHash as candidate generator + exact n-gram Jaccard verify —
        // the production near-dup shape for the simhash path. 8×8-bit
        // banding is pigeonhole-complete for hamming <= 7; measured
        // true-pair hammings reach 11, and pairs at 8-11 still share a
        // chunk in practice. Gate: DuckDB recomputes the exact true pair
        // count; recall_ok asserts the banded+verified pipeline recovered
        // >= 90% of it.
        // simhash over 3-gram shingles (the Jaccard feature set) — unigram
        // simhash collapses on this template-heavy corpus (68% of sf0.1
        // pairs within hamming 16, half the corpus in one band bucket);
        // shingle simhash puts unrelated docs ~32 bits apart and ALL true
        // pairs at <= 11, so the hamming <= 16 pre-cut leaves a tiny exact
        // verify set (~900 pairs at sf0.1 vs 4M with unigrams)
        // Round-8 sf10 finding (the round-7 copy-quadratic lesson,
        // finishing the job): candidate GENERATION was already
        // duplicate-collapsed, but the exact-Jaccard VERIFY still ran on
        // member-expanded pairs — at 100 copies per distinct text that
        // is 4 992 × C(100,2) ≈ 24.7 M array intersections whose answers
        // are all copies of each other (measured 170 s/rep at sf10,
        // stable, zero stall). The verify now runs at DISTINCT-TEXT
        // grain and member counts expand arithmetically: a passing
        // cross-text pair contributes cnt_a × cnt_b member pairs, and
        // identical-text member pairs (jaccard exactly 1 ≥ 0.5, always
        // found) contribute C(cnt, 2) directly.
        // round-14 session 2: the candidate generator is the
        // distinct-frame core simHashFpPairs — the simHashPairs wrapper
        // re-fingerprinted, re-deduped and identity-joined a frame that
        // is already one row per fingerprint (probe: core 1.11 vs
        // wrapper 1.20 s; pair set pinned [0,0] by Probe simh_core_diff).
        // (A fused single groupBy for counts+dist was probed and REJECTED
        // — see the q_neardup_pair_stats note.)
        val docs = T(s, dir, "documents")
        val fp = xxhash64(col("text"))
        val counts = docs.groupBy(fp.as("__fp"))
          .agg(count(lit(1)).as("__cnt"))
        val dist = docs.select(fp.as("__fp"), col("text"))
          .dropDuplicates("__fp")
        val cand = NearDup.simHashFpPairs(dist, "text",
            maxHamming = 16, numBands = 8, shingleN = 3)
          .select(col("id_a"), col("id_b"))
        val passing = NearDup.hashJaccard(dist, "__fp", "text", cand,
            n = 3)
          .filter(col("jaccard") >= 0.5)
        // found ⊆ truth up to 64-bit shingle-hash collisions
        // (~1e-15/pair — see hashJaccard), so recall = |found| / |truth|;
        // truth via the minhash path, whose own gate row proves it
        // equals the exact pair set
        val crossFound = passing
          .join(counts.select(col("__fp").as("id_a"),
            col("__cnt").as("__ca")), Seq("id_a"))
          .join(counts.select(col("__fp").as("id_b"),
            col("__cnt").as("__cb")), Seq("id_b"))
          .agg(coalesce(sum(col("__ca") * col("__cb")), lit(0L))
            .as("__cross"))
        // DIV (integer division), not `/` (double): cnt*(cnt-1) is even so
        // the value is identical, but `/` would make the pair count a
        // double — exact only below 2^53, a silent precision cliff for a
        // copy-heavy corpus at scale
        val withinFound = counts
          .agg(coalesce(sum(expr("__cnt * (__cnt - 1) DIV 2")),
            lit(0L)).as("__within"))
        val truth = cachedMinHashPairs(s, dir)
        crossFound.crossJoin(withinFound)
          .select((col("__cross") + col("__within")).as("__found"))
          .crossJoin(truth.agg(count(lit(1)).as("n_true_pairs")))
          .select(col("n_true_pairs"),
            (col("__found") / col("n_true_pairs") >= 0.9).as("recall_ok"))
      },
      Some(ExactNearDupPairsSql +
        """SELECT COUNT(*) AS n_true_pairs, TRUE AS recall_ok
          | FROM p WHERE jaccard >= 0.5""".stripMargin),
      "SimHash near-dup: pigeonhole-banded candidates + exact verify, " +
        "recall vs exact truth asserted in-query"),

    "q_ann_brute_topk" -> QueryDef(
      (s, dir) => {
        val emb = T(s, dir, "embeddings")
        val probes = emb.orderBy(col("vec_id")).limit(5)
        Ann.bruteForceTopK(emb, probes, "vec_id", "embedding", k = 10)
      },
      // full-value oracle: neighbor ids, ranks AND cosines hash-compared —
      // DuckDB list_dot_product accumulates sequentially in double, which
      // is bit-identical to the native fused-loop CosineSimilarity
      Some("""WITH d AS (SELECT vec_id,
             |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |   FROM embeddings),
             | p AS (SELECT vec_id, v FROM d ORDER BY vec_id LIMIT 5),
             | s AS (SELECT p.vec_id AS probe_id, d.vec_id AS neighbor_id,
             |   list_dot_product(p.v, d.v)
             |     / (sqrt(list_dot_product(p.v, p.v))
             |      * sqrt(list_dot_product(d.v, d.v))) AS cosine
             |   FROM p JOIN d ON d.vec_id <> p.vec_id),
             | r AS (SELECT probe_id, neighbor_id, cosine,
             |   ROW_NUMBER() OVER (PARTITION BY probe_id
             |     ORDER BY cosine DESC, neighbor_id ASC) AS rank
             |   FROM s)
             | SELECT probe_id, neighbor_id, cosine, rank FROM r
             | WHERE rank <= 10 ORDER BY probe_id, rank""".stripMargin),
      "exact cosine top-k, broadcast probes (ANN baseline, full-value oracle)"),

    "q_negative_sample" -> QueryDef(
      (s, dir) => {
        // hard-negative mining for contrastive training: per anchor,
        // sample k candidates that are NOT semantic neighbors —
        // deterministically (rank non-neighbors by md5(anchor:cand)),
        // so the training set is reproducible with no RNG state. The
        // neighbor exclusion reuses the exact top-10 (the proven
        // brute-force path); the hash ranking is the same uniform-hash
        // construction as the sampling family. At 100 TB the anchor
        // set is the small broadcast side and negatives come from the
        // ANN-bucketed candidate structure rather than the full corpus.
        val emb = T(s, dir, "embeddings")
        val anchors = emb.orderBy(col("vec_id")).limit(10)
        val neighbors = Ann.bruteForceTopK(emb, anchors, "vec_id",
            "embedding", k = 10)
          .select(col("probe_id").as("anchor_id"), col("neighbor_id"))
        val cands = emb.select(col("vec_id").as("cand_id"))
          .crossJoin(broadcast(
            anchors.select(col("vec_id").as("anchor_id"))))
          .filter(col("cand_id") =!= col("anchor_id"))
          .join(neighbors.withColumnRenamed("neighbor_id", "cand_id"),
            Seq("anchor_id", "cand_id"), "left_anti")
        val w = Window.partitionBy(col("anchor_id")).orderBy(
          md5(concat(col("anchor_id").cast("string"), lit(":"),
            col("cand_id").cast("string"))), col("cand_id"))
        cands.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 5)
          .select(col("anchor_id"), col("cand_id").as("neg_id"),
            col("rk").cast("long").as("rk"))
          .orderBy(col("anchor_id"), col("rk"))
      },
      Some("""WITH d AS (SELECT vec_id,
             |   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
             |   FROM embeddings),
             | a AS (SELECT vec_id, v FROM d ORDER BY vec_id LIMIT 10),
             | s AS (SELECT a.vec_id AS anchor_id, d.vec_id AS cand_id,
             |   list_dot_product(a.v, d.v)
             |     / (sqrt(list_dot_product(a.v, a.v))
             |      * sqrt(list_dot_product(d.v, d.v))) AS cosine
             |   FROM a JOIN d ON d.vec_id <> a.vec_id),
             | nb AS (SELECT anchor_id, cand_id FROM (
             |     SELECT anchor_id, cand_id,
             |       ROW_NUMBER() OVER (PARTITION BY anchor_id
             |         ORDER BY cosine DESC, cand_id ASC) AS rank
             |     FROM s) t WHERE rank <= 10),
             | c AS (SELECT a.vec_id AS anchor_id, d.vec_id AS cand_id
             |   FROM a CROSS JOIN (SELECT vec_id FROM d) d
             |   WHERE d.vec_id <> a.vec_id
             |     AND NOT EXISTS (SELECT 1 FROM nb
             |       WHERE nb.anchor_id = a.vec_id
             |         AND nb.cand_id = d.vec_id)),
             | r AS (SELECT anchor_id, cand_id,
             |   CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id
             |     ORDER BY md5(CAST(anchor_id AS VARCHAR) || ':'
             |       || CAST(cand_id AS VARCHAR)), cand_id) AS BIGINT)
             |     AS rk
             |   FROM c)
             | SELECT anchor_id, cand_id AS neg_id, rk FROM r
             | WHERE rk <= 5 ORDER BY anchor_id, rk""".stripMargin),
      "hard-negative mining: deterministic hash-ranked non-neighbors " +
        "per anchor, exact-top-10 exclusion (contrastive training data)"),

    "q_ann_lsh_topk" -> QueryDef(
      (s, dir) => {
        // recall-in-query: the gate row itself asserts approximate quality
        // — per probe, the LSH top-10 must recover at least half of the
        // exact top-10 (measured 9-10/10; threshold at half for
        // determinism headroom). A silently-broken LSH path flips
        // recall_ok and fails the hash gate.
        val emb = T(s, dir, "embeddings")
        val probes = emb.orderBy(col("vec_id")).limit(5)
        val brute = Ann.bruteForceTopK(emb, probes, "vec_id", "embedding",
          k = 10)
        val approx = Ann.lshTopK(emb, probes, "vec_id", "embedding", k = 10)
        val hits = brute
          .join(approx.select(col("probe_id"), col("neighbor_id")),
            Seq("probe_id", "neighbor_id"), "left_semi")
          .groupBy(col("probe_id")).agg(count(lit(1)).as("__hits"))
        probes.select(col("vec_id").as("probe_id"))
          .join(hits, Seq("probe_id"), "left")
          .select(col("probe_id"),
            (coalesce(col("__hits"), lit(0L)) >= 5).as("recall_ok"))
          .orderBy(col("probe_id"))
      },
      Some("""SELECT vec_id AS probe_id, TRUE AS recall_ok
             | FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 5) t
             | ORDER BY probe_id""".stripMargin),
      "LSH approximate top-k with per-probe recall-vs-brute asserted in-query"),

    "q_lang_id" -> QueryDef(
      (s, dir) =>
        // marker counts from the fused profile (the declarative form
        // paid four interpreted HOF filters per row)
        T(s, dir, "documents")
          .select(TextStats.profile(col("text")).as("__p"))
          .groupBy(TextStats.langIdFrom(col("__p")).as("lang_pred"))
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
        cachedLangChainComponents(s, dir)
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

    "q_canonical_select" -> QueryDef(
      (s, dir) => {
        // the production dedup DECISION: per near-dup cluster, keep the
        // highest-quality member (argmax quality, doc_id tiebreak) — not
        // just the min id. Components come from the pointer-jumping
        // clusterer; quality is ONE fused TextProfile pass (the
        // multi-pass qualityScore was 3x the cost — round-12 probe,
        // equality spec-pinned in TextProfileSpec); the per-component
        // argmax+count is a groupBy over max(struct(quality, -id))
        // (lexicographic struct max = highest quality, then lowest id),
        // which partial-aggregates map-side where the previous
        // row_number window shuffled and sorted every clustered row
        // (sf10: 11.2 s → 1.3 s with both changes). Everything after
        // clustering shuffles |components| rows only.
        val d = T(s, dir, "documents")
        val comp = cachedLangChainComponents(s, dir)
        val q = d.select(col("doc_id").as("id"),
          TextStats.qualityScoreFrom(TextStats.profile(col("text")))
            .as("quality"))
        comp.join(q, Seq("id"))
          .groupBy(col("component"))
          .agg(max(struct(col("quality"), (-col("id")).as("nid")))
            .as("__b"),
            count(lit(1)).as("n_members"))
          .select(col("component"), (-col("__b.nid")).as("keep_id"),
            col("n_members"), col("__b.quality").as("best_quality"))
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
             | comp AS (SELECT id, MIN(lbl) AS component FROM r GROUP BY id),
             | q AS (SELECT doc_id AS id,
             |   0.5 * (len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |       x -> x IN ('the','a','of','and','to','in','is','it')))
             |     / len(regexp_split_to_array(trim(text), '\s+')))
             |   + 0.3 * (CASE WHEN len(regexp_split_to_array(trim(text), '\s+'))
             |       BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
             |   + 0.2 * (1.0 - LENGTH(regexp_replace(text, '[a-z0-9\s]', '', 'g'))
             |     / LENGTH(text)) AS quality
             |   FROM documents),
             | m AS (SELECT comp.component, comp.id, q.quality,
             |     ROW_NUMBER() OVER (PARTITION BY comp.component
             |       ORDER BY q.quality DESC, comp.id) AS rn,
             |     COUNT(*) OVER (PARTITION BY comp.component) AS n_members
             |   FROM comp JOIN q USING (id))
             | SELECT component, id AS keep_id, n_members,
             |   quality AS best_quality
             | FROM m WHERE rn = 1 ORDER BY component""".stripMargin),
      "canonical selection: keep the highest-quality member per dedup " +
        "cluster (argmax window over components)"),

    "q_incremental_curation" -> QueryDef(
      (s, dir) => {
        // the production incremental-ingest shape, composed end to end:
        // an incoming batch is deduped against the EXISTING corpus via
        // the Bloom pre-filter (corpus scanned once into a bounded
        // sketch, never shuffled), survivors pass the language+quality
        // gate, and the per-source accounting is what the pipeline
        // journals per increment. At 100 TB the corpus-side cost is one
        // sketch scan; the batch side is map-only until the tiny
        // confirmed-key broadcast.
        val d = T(s, dir, "documents")
        val corpus = d.filter(pmod(col("doc_id"), lit(3)) =!= 2)
        val dup = BloomDedup.duplicates(corpus, d,
          TextStats.fingerprintMd5(col("text")),
          expectedItems = 100000L, numBits = 800000L)
        val flagged = d
          .join(dup.select(col("doc_id"), lit(1).as("__dup")),
            Seq("doc_id"), "left")
          .withColumn("__p", TextStats.profile(col("text")))
          .withColumn("__novel", col("__dup").isNull)
          .withColumn("__keep", col("__novel") &&
            TextStats.langIdFrom(col("__p")) === "en" &&
            TextStats.qualityScoreFrom(col("__p")) >= lit(0.5))
        flagged.groupBy(col("source"))
          .agg(count(lit(1)).as("n_incoming"),
            sum(col("__novel").cast("long")).as("n_novel"),
            sum(col("__keep").cast("long")).as("n_kept"),
            sum(when(col("__keep"),
              TextStats.tokenCountFrom(col("__p")).cast("long"))
              .otherwise(0L)).as("kept_tokens"))
          .orderBy(col("source"))
      },
      Some("""WITH corpus AS (SELECT md5(text) AS h FROM documents
             |     WHERE doc_id % 3 <> 2),
             | f AS (SELECT doc_id, source, text,
             |     regexp_split_to_array(trim(lower(text)), '\s+') AS ts,
             |     NOT EXISTS (SELECT 1 FROM corpus c
             |       WHERE c.h = md5(documents.text)) AS novel
             |   FROM documents),
             | s AS (SELECT doc_id, source, novel,
             |     len(list_filter(ts, x -> x IN ('der','die','und','das','ist','nicht','ein','zu'))) AS de,
             |     len(list_filter(ts, x -> x IN ('the','and','of','to','in','is','that','it'))) AS en,
             |     len(list_filter(ts, x -> x IN ('el','la','de','que','y','en','los','una'))) AS es,
             |     len(list_filter(ts, x -> x IN ('le','la','de','et','est','les','une','dans'))) AS fr,
             |     len(regexp_split_to_array(trim(text), '\s+')) AS n_tok,
             |     0.5 * (len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
             |         x -> x IN ('the','a','of','and','to','in','is','it')))
             |       / len(regexp_split_to_array(trim(text), '\s+')))
             |     + 0.3 * (CASE WHEN len(regexp_split_to_array(trim(text), '\s+'))
             |         BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.0 END)
             |     + 0.2 * (1.0 - LENGTH(regexp_replace(text, '[a-z0-9\s]', '', 'g'))
             |       / LENGTH(text)) AS q
             |   FROM f),
             | k AS (SELECT source, novel, n_tok,
             |     novel AND q >= 0.5 AND
             |       greatest(de, en, es, fr) > 0 AND
             |       de < greatest(de, en, es, fr) AND
             |       en = greatest(de, en, es, fr) AS keep
             |   FROM s)
             | SELECT source, COUNT(*) AS n_incoming,
             |   CAST(SUM(CASE WHEN novel THEN 1 ELSE 0 END) AS BIGINT)
             |     AS n_novel,
             |   CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             |     AS n_kept,
             |   CAST(SUM(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT)
             |     AS kept_tokens
             | FROM k GROUP BY source ORDER BY source""".stripMargin),
      "incremental ingest: Bloom dedup vs existing corpus + curation " +
        "gate + per-source accounting, composed"),

    "q_chat_turns" -> QueryDef(
      (s, dir) => {
        // chat/instruction-data processing: parse role-tagged transcripts
        // into turns and account tokens per role — the SFT-data analog of
        // the pretraining token accounting. Transcripts are constructed
        // deterministically from the corpus (user turn = first 12 tokens,
        // assistant turn = next 12), so both engines parse byte-identical
        // input; the parse (split on the role marker + posexplode) and
        // the role assignment (ordinal parity) are map-only.
        val d = T(s, dir, "documents")
        val toks = TextStats.tokens(lower(col("text")))
        val transcript = concat(
          lit("<|user|> "), concat_ws(" ", slice(toks, 1, 12)),
          lit(" <|assistant|> "), concat_ws(" ", slice(toks, 13, 12)),
          lit(" <|user|> "), concat_ws(" ", slice(toks, 25, 12)))
        d.select(col("doc_id"), transcript.as("chat"))
          .select(col("doc_id"),
            posexplode(filter(split(col("chat"), "<\\|(user|assistant)\\|> "),
              t => length(t) > 0)).as(Seq("turn_idx", "turn")))
          .select(col("doc_id"), col("turn_idx"),
            when(col("turn_idx") % 2 === 0, "user").otherwise("assistant")
              .as("role"),
            TextStats.tokenCount(trim(col("turn"))).cast("long")
              .as("turn_tokens"))
          .groupBy(col("role"))
          .agg(count(lit(1)).as("n_turns"),
            sum(col("turn_tokens")).as("tokens"))
          .orderBy(col("role"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |   regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |   FROM documents),
             | chat AS (SELECT doc_id,
             |   '<|user|> ' || COALESCE(array_to_string(ts[1:12], ' '), '')
             |   || ' <|assistant|> '
             |   || COALESCE(array_to_string(ts[13:24], ' '), '')
             |   || ' <|user|> '
             |   || COALESCE(array_to_string(ts[25:36], ' '), '') AS c
             |   FROM t),
             | lf AS (SELECT doc_id, list_filter(
             |     regexp_split_to_array(c, '<\|(user|assistant)\|> '),
             |     x -> length(x) > 0) AS parts FROM chat),
             | turns AS (SELECT doc_id,
             |     generate_subscripts(parts, 1) - 1 AS turn_idx,
             |     unnest(parts) AS turn
             |   FROM lf),
             | roled AS (SELECT
             |     CASE WHEN turn_idx % 2 = 0 THEN 'user'
             |       ELSE 'assistant' END AS role,
             |     len(regexp_split_to_array(trim(turn), '\s+')) AS tt
             |   FROM turns)
             | SELECT role, COUNT(*) AS n_turns,
             |   CAST(SUM(tt) AS BIGINT) AS tokens
             | FROM roled GROUP BY role ORDER BY role""".stripMargin),
      "chat-data turn parsing: role-marker split + per-role token " +
        "accounting, map-only"),

    "q_edit_distance" -> QueryDef(
      (s, dir) => {
        // character-level edit distance as a near-dup verify primitive
        // (complements the token-level Jaccard family): Levenshtein over
        // a bounded prefix on a deterministic candidate pair set.
        // Bounding the prefix caps the O(len^2) DP cost per pair — the
        // production shape, since edit distance only ever runs on
        // already-banded candidates, never all pairs.
        val docs = T(s, dir, "documents")
        val a = docs.select(col("doc_id").as("id_a"),
          substring(col("text"), 1, 80).as("ta"))
        val b = docs.select((col("doc_id") - 1).as("id_a"),
          col("doc_id").as("id_b"), substring(col("text"), 1, 80).as("tb"))
        // Levenshtein ABOVE the sort (round-13 audit): the sort sampler
        // re-executes its child, so the DP below the sort ran twice.
        // 3.52 -> 3.19 s at sf10, edit_diff [0,0].
        //
        // Round-13 optimization session: a same-JVM probe A/B
        // (edit_full vs edit_sortfirst) found a SCALE CROSSOVER — at
        // sf0.1 this sort-first form is 2x faster (0.48 vs 1.05 s: the
        // sampler's re-run pays the double-levenshtein projection), at
        // sf1 the sort-LAST form wins (~1.2 vs 1.9 s, sort-first
        // bimodal) because the range exchange+sort carry both 80-char
        // prefixes. Kept sort-first: the graded bench scale (sf0.1) and
        // the sf10 in-sweep delta both favor it; revisit only if the
        // sf1 point ever becomes the contract.
        a.join(b, Seq("id_a"))
          .orderBy(col("id_a"))
          .select(col("id_a"), col("id_b"),
            levenshtein(col("ta"), col("tb")).as("edit_dist"),
            (levenshtein(col("ta"), col("tb")) <= 20).as("near_dup"))
      },
      Some("""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |   levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80))
             |     AS edit_dist,
             |   levenshtein(substr(a.text, 1, 80), substr(b.text, 1, 80))
             |     <= 20 AS near_dup
             | FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
             | ORDER BY id_a""".stripMargin),
      "edit-distance near-dup verify: bounded-prefix Levenshtein on " +
        "banded candidates, integer-exact"),

    "q_url_normalize" -> QueryDef(
      (s, dir) => {
        // web-corpus URL handling: parse host/path/query, normalize
        // (strip tracking params, lowercase host, drop fragment), and
        // account docs per registered host — the crawl-side dedup key
        // derivation. URLs are constructed deterministically from the
        // corpus so both engines parse byte-identical input; parse +
        // normalize are map-only (parse_url is codegen'd).
        val d = T(s, dir, "documents")
        val url = concat(lit("https://"), col("source"),
          lit(".example.com/docs/"), col("doc_id"),
          lit("?utm_source=feed&page="), pmod(col("doc_id"), lit(7)),
          lit("#frag"))
        d.select(col("doc_id"), url.as("u"))
          .select(col("doc_id"),
            lower(parse_url(col("u"), lit("HOST"))).as("host"),
            parse_url(col("u"), lit("PATH")).as("path"),
            parse_url(col("u"), lit("QUERY"), lit("page")).cast("long")
              .as("page"))
          .withColumn("norm_url",
            concat(lit("https://"), col("host"), col("path"),
              lit("?page="), col("page")))
          .groupBy(col("host"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("norm_url")).as("distinct_urls"),
            sum(col("page")).as("page_sum"))
          .orderBy(col("host"))
      },
      Some("""WITH u AS (SELECT doc_id,
             |   'https://' || source || '.example.com/docs/' || doc_id
             |   || '?utm_source=feed&page=' || (doc_id % 7) || '#frag' AS url
             |   FROM documents),
             | p AS (SELECT doc_id,
             |   lower(regexp_extract(url, 'https://([^/]+)/', 1)) AS host,
             |   regexp_extract(url, 'https://[^/]+(/[^?#]*)', 1) AS path,
             |   CAST(regexp_extract(url, '[?&]page=([0-9]+)', 1) AS BIGINT)
             |     AS page
             |   FROM u)
             | SELECT host, COUNT(*) AS n_docs,
             |   COUNT(DISTINCT 'https://' || host || path || '?page=' || page)
             |     AS distinct_urls,
             |   CAST(SUM(page) AS BIGINT) AS page_sum
             | FROM p GROUP BY host ORDER BY host""".stripMargin),
      "URL parse + normalize (strip tracking/fragment) + per-host " +
        "accounting — the crawl-side dedup key derivation"),

    "q_minhash_estimator" -> QueryDef(
      (s, dir) => {
        // the MinHash ESTIMATOR's quality gate (the near-dup queries use
        // signatures only for candidate generation; this audits the
        // estimate itself): over deterministic adjacent pairs, the
        // fraction of agreeing signature positions estimates Jaccard
        // with stddev sqrt(j(1-j)/k) — mean |error| over 64 hashes must
        // clear a generous 3-sigma-ish bound. Both the estimate and the
        // exact Jaccard compute in-query; the oracle recomputes the
        // exact side and asserts the bound flag.
        val docs = T(s, dir, "documents")
        val sigs = NearDup.minHashSignatures(docs, "doc_id", "text",
          n = 3, numHashes = 64)
        val pairs = docs.select(col("doc_id").as("id_a"),
            (col("doc_id") + 1).as("id_b"))
          .join(docs.select(col("doc_id").as("id_b")), Seq("id_b"))
          .select(col("id_a"), col("id_b"))
        val est = pairs
          .join(sigs.select(col("__id").as("id_a"), col("__sig").as("sa")),
            Seq("id_a"))
          .join(sigs.select(col("__id").as("id_b"), col("__sig").as("sb")),
            Seq("id_b"))
          .select(col("id_a"), col("id_b"),
            (size(filter(zip_with(col("sa"), col("sb"),
              (a, b) => a === b), x => x)).cast("double") / lit(64.0))
              .as("est_j"))
        val exact = NearDup.ngramJaccard(docs, "doc_id", "text", pairs,
          n = 3)
        // ONE aggregate computes all three measures: a previous revision
        // cross-joined a second est⨝exact aggregate for the MAE, which
        // re-executed the whole signature+Jaccard subplan (Catalyst does
        // not share common subplans across a join) — 2x the query's cost
        est.join(exact, Seq("id_a", "id_b"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(floor(col("jaccard") * lit(1e6)).cast("long"))
              .as("exact_j_sum_micro"),
            avg(abs(col("est_j") - col("jaccard"))).as("__mae"))
          .select(col("n_pairs"), col("exact_j_sum_micro"),
            (col("__mae") <= 0.2).as("mae_ok"))
      },
      Some(ExactNearDupPairsAdjacentSql +
        """SELECT COUNT(*) AS n_pairs,
          |   CAST(SUM(CAST(FLOOR(jaccard * 1e6) AS BIGINT)) AS BIGINT)
          |     AS exact_j_sum_micro,
          |   TRUE AS mae_ok
          | FROM p""".stripMargin),
      "MinHash estimator audit: signature-agreement Jaccard estimate " +
        "vs exact, mean-absolute-error bound asserted in-query"),

    "q_corpus_curation" -> QueryDef(
      (s, dir) => {
        // the flagship curation pipeline, oracle-checked end to end:
        // language-ID gate → quality threshold → exact dedup (keep-first
        // by digest) → per-source token accounting. One scan, one window
        // shuffle on the digest, one tiny grouped result. All four text
        // stats derive from ONE fused TextProfile pass (round-8: the
        // stacked declarative trees re-tokenized per stat and were the
        // dominant sf1 cost of this query).
        val d = T(s, dir, "documents")
        val p = TextStats.profile(col("text"))
        val scored = d.select(
            col("doc_id"), col("source"), p.as("__p"),
            TextStats.fingerprintMd5(col("text")).as("__fp"))
          .select(col("doc_id"), col("source"), col("__fp"),
            TextStats.langIdFrom(col("__p")).as("__lang"),
            TextStats.qualityScoreFrom(col("__p")).as("__q"),
            TextStats.tokenCountFrom(col("__p")).as("__tok"))
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

    "q_curation_pipeline" -> QueryDef(
      (s, dir) => {
        // END-TO-END curation gate: the real operator sequence a
        // training-data run executes, chained through one registered
        // query so operator COMPOSITION (schema handoffs, FrameCache
        // reuse across stages, survivor-set threading) is itself
        // oracle-checked — 200 isolated gates can all be green while a
        // composition bug (killing against the wrong survivor set,
        // resampling before dedup) goes unseen. Stages:
        //   1 exact dedup (keep-first per content digest)
        //   2 minhash near-dup kill (greedy keep-smallest-id over the
        //     session's materialized pair set — FrameCache REUSE: the
        //     same frame q_minhash_neardup/q_simhash_neardup read)
        //   3 strict-containment kill (quotation case; rarest-shingle
        //     blocking, also FrameCache'd for any later consumer)
        //   4 quality + Gopher repetition gate (map-only)
        //   5 benchmark decontamination (13-gram protocol)
        //   6 deterministic mixture resample (hash-mod rates)
        //   7 sequence packing of the survivors (shard-parallel)
        // Each stage's kill rule is evaluated against the PREVIOUS
        // stage's survivors (no cascading within a stage) — the
        // deterministic, SQL-expressible convention. Scale shape: one
        // digest shuffle (1), bucket-local pair joins (2, 3), map-only
        // scans (4, 6), one broadcast semi-join (5), shard-partitioned
        // windows (7) — nothing all-pairs, nothing single-task.
        val docs = T(s, dir, "documents")
        val w = Window.partitionBy(TextStats.fingerprintMd5(col("text")))
          .orderBy(col("doc_id"))
        // one fused TextProfile pass carried through the stages feeds
        // the token count (s1/s7) AND the quality/Gopher gate (s4)
        val s1 = docs.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .select(col("doc_id"), col("source"), col("text"),
            TextStats.profile(col("text")).as("__p"))
          .withColumn("__toks",
            TextStats.tokenCountFrom(col("__p")).cast("long"))
        val s1ids = s1.select(col("doc_id"))
        val pairs = cachedMinHashPairs(s, dir) // (id_a < id_b, j >= 0.5)
        val ndVictims = pairs
          .join(s1ids.select(col("doc_id").as("id_a")), Seq("id_a"),
            "left_semi")
          .join(s1ids.select(col("doc_id").as("id_b")), Seq("id_b"),
            "left_semi")
          .select(col("id_b").as("doc_id")).distinct()
        val s2 = s1.join(ndVictims, Seq("doc_id"), "left_anti")
        // strict containment only — round 14 session 3: the STRICT SET
        // pairs are exactly the |S_a| < |S_b| member pairs (distinct
        // digests ⇒ strict subset ⇒ strictly smaller set; the equal-set
        // branch has |S_a| = |S_b| and is the jaccard-1.0 case already
        // dead at stage 2), so the previous per-execution full
        // shingleHashes sizes pass and two size joins were provably
        // redundant — dropped. The cached frame is the member expansion
        // of the strict set pairs (replacing the containment_pairs
        // entry, whose within-branch only ever fed the filtered-out
        // equal-size rows).
        val cross = graft.core.FrameCache.cached(s,
          s"containment_cross:3:$dir") {
          val (m, p) = NearDup.containmentSetPairs(
            docs.select(col("doc_id"), col("text")), "doc_id", "text", 3)
          p.join(m.select(col("__did").as("__da"), col("__id").as("id_a")),
              Seq("__da"))
            .join(m.select(col("__did").as("__db"),
              col("__id").as("id_b")), Seq("__db"))
            .select(col("id_a"), col("id_b"))
        }
        val s2ids = s2.select(col("doc_id"))
        val ctVictims = cross
          .join(s2ids.select(col("doc_id").as("id_a")), Seq("id_a"),
            "left_semi")
          .join(s2ids.select(col("doc_id").as("id_b")), Seq("id_b"),
            "left_semi")
          .select(col("id_a").as("doc_id")).distinct()
        val s3 = s2.join(ctVictims, Seq("doc_id"), "left_anti")
        val s4 = s3.filter(
          TextStats.qualityScoreFrom(col("__p")) >= 0.3 &&
          TextStats.dupTokenFracFrom(col("__p")) <= 0.55 &&
          TextStats.topTokenFracFrom(col("__p")) <= 0.15)
        val toks = split(trim(lower(col("text"))), "\\s+")
        val bench = docs
          .filter(col("doc_id") % 20 === 0 && size(toks) >= 20)
          .select(concat_ws(" ", slice(toks, 5, 16)).as("bench_text"))
        val bg = Decontaminate.benchmarkNgrams(bench, "bench_text", n = 13)
        val contam = Decontaminate
          .contaminated(docs, bg, "doc_id", "text", n = 13)
          .select(col("doc_id"))
        val s5 = s4.join(contam, Seq("doc_id"), "left_anti")
        // TOTAL source-id parse, identical on both engines (round-7
        // advice: substring+cast silently nulls a non-numeric suffix on
        // Spark while CAST hard-errors in DuckDB — they only agreed
        // because corpora use short numeric suffixes): extract the digit
        // run, default 0 when absent, so any source shape gets a rate
        val srcId = coalesce(
          regexp_extract(col("source"), "[0-9]+", 0).cast("int"), lit(0))
        val rate = element_at(
          array(lit(100), lit(50), lit(25), lit(10)),
          (pmod(srcId, lit(4)) + lit(1)).cast("int"))
        val s6 = s5.filter(pmod(col("doc_id"), lit(100)) < rate)
        val wp = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
        s6.select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("shard"),
            col("__toks").as("toks"))
          .withColumn("cum", sum(col("toks")).over(wp))
          .withColumn("bin",
            floor((col("cum") - col("toks")) / lit(512.0)).cast("long"))
          .groupBy(col("shard"), col("bin"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("toks")).as("bin_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc"))
          .orderBy(col("shard"), col("bin"))
      },
      // oracle's near-dup (nd) and containment (ct) kill stages use the
      // sparse count-join form (see ExactNearDupPairsSql scaladoc) — the
      // s1 survivors are already text-distinct, so no grp collapse needed
      Some("""WITH t AS (SELECT doc_id, source, text,
             |     regexp_split_to_array(trim(lower(text)), '\s+') AS lts,
             |     len(regexp_split_to_array(trim(text), '\s+')) AS toks
             |   FROM documents),
             | s1 AS (SELECT doc_id, source, text, lts, toks FROM (
             |     SELECT t.*, ROW_NUMBER() OVER (PARTITION BY md5(text)
             |       ORDER BY doc_id) AS rn FROM t) WHERE rn = 1),
             | g AS (SELECT doc_id,
             |     list_distinct(list_transform(
             |       range(1, greatest(len(lts)-2,1)+1),
             |       i -> array_to_string(lts[i:least(i+2, len(lts))], ' ')))
             |       AS gs
             |   FROM s1),
             | ug AS (SELECT doc_id, unnest(gs) AS s FROM g),
             | ivg AS (SELECT a.doc_id AS ia, b.doc_id AS ib,
             |     count(*) AS inter
             |   FROM ug a JOIN ug b ON a.s = b.s AND a.doc_id < b.doc_id
             |   GROUP BY a.doc_id, b.doc_id),
             | gl AS (SELECT doc_id, len(gs) AS ng FROM g),
             | nd AS (SELECT DISTINCT ivg.ib AS victim
             |   FROM ivg JOIN gl la ON la.doc_id = ivg.ia
             |     JOIN gl lb ON lb.doc_id = ivg.ib
             |   WHERE CAST(ivg.inter AS DOUBLE)
             |       / (la.ng + lb.ng - ivg.inter) >= 0.5),
             | s2 AS (SELECT * FROM s1
             |   WHERE doc_id NOT IN (SELECT victim FROM nd)),
             | ct AS (SELECT DISTINCT CASE WHEN la.ng < lb.ng
             |       THEN ivg.ia ELSE ivg.ib END AS victim
             |   FROM ivg JOIN gl la ON la.doc_id = ivg.ia
             |     JOIN gl lb ON lb.doc_id = ivg.ib
             |   WHERE ivg.ia IN (SELECT doc_id FROM s2)
             |     AND ivg.ib IN (SELECT doc_id FROM s2)
             |     AND ((la.ng < lb.ng AND ivg.inter = la.ng)
             |       OR (lb.ng < la.ng AND ivg.inter = lb.ng))),
             | s3 AS (SELECT * FROM s2
             |   WHERE doc_id NOT IN (SELECT victim FROM ct)),
             | s4 AS (SELECT doc_id, source, lts, toks FROM s3
             |   WHERE 0.5 * (len(list_filter(lts,
             |         x -> x IN ('the','a','of','and','to','in','is','it')))
             |       / toks)
             |     + 0.3 * (CASE WHEN toks BETWEEN 10 AND 1000
             |         THEN 1.0 ELSE 0.0 END)
             |     + 0.2 * (1.0 - LENGTH(regexp_replace(text,
             |         '[a-z0-9\s]', '', 'g')) / LENGTH(text)) >= 0.3
             |     AND 1.0 - CAST(len(list_distinct(lts)) AS DOUBLE)
             |       / CAST(len(lts) AS DOUBLE) <= 0.55
             |     AND CAST((SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt
             |         FROM unnest(lts) AS u(tok) GROUP BY tok)) AS DOUBLE)
             |       / CAST(len(lts) AS DOUBLE) <= 0.15),
             | bench AS (SELECT array_to_string(lts[5:20], ' ') AS btext
             |   FROM t WHERE doc_id % 20 = 0 AND len(lts) >= 20),
             | bt AS (SELECT regexp_split_to_array(btext, '\s+') AS bts
             |   FROM bench),
             | bg AS (SELECT DISTINCT
             |     unnest(list_transform(range(1, greatest(len(bts)-12,1)+1),
             |       i -> array_to_string(bts[i:least(i+12, len(bts))], ' ')))
             |     AS ng
             |   FROM bt),
             | contam AS (SELECT DISTINCT doc_id FROM (
             |     SELECT doc_id, unnest(list_distinct(
             |       list_transform(range(1, greatest(len(lts)-12,1)+1),
             |         i -> array_to_string(lts[i:least(i+12, len(lts))], ' '))))
             |       AS ng FROM t) tg
             |   WHERE ng IN (SELECT ng FROM bg)),
             | s5 AS (SELECT * FROM s4
             |   WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
             | s6 AS (SELECT doc_id, doc_id % 8 AS shard, toks FROM s5
             |   WHERE doc_id % 100 <
             |     ([100, 50, 25, 10])[(COALESCE(TRY_CAST(
             |       regexp_extract(source, '[0-9]+') AS INT), 0) % 4) + 1]),
             | c AS (SELECT doc_id, shard, toks,
             |     SUM(toks) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
             |   FROM s6)
             | SELECT shard, CAST(FLOOR((cum - toks) / 512.0) AS BIGINT) AS bin,
             |   COUNT(*) AS n_docs, CAST(SUM(toks) AS BIGINT) AS bin_tokens,
             |   MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
             | FROM c GROUP BY shard, bin ORDER BY shard, bin""".stripMargin),
      "end-to-end curation pipeline gate: exact dedup -> minhash " +
        "near-dup -> containment -> quality/Gopher -> decontaminate -> " +
        "mixture resample -> seq-pack, one oracle over the packed output"),

    "q_ann_ivf_topk" -> QueryDef(
      (s, dir) => {
        // recall-in-query, aggregated: IVF scans nProbe=3 of 8 cells, so on
        // cluster-free synthetic embeddings expected recall is ~3/8
        // (measured 0.58 aggregate at sf0.01); the gate asserts the
        // aggregate stays >= 0.2 — a broken cell assignment or candidate
        // join drops it to ~0 and fails the hash.
        val emb = T(s, dir, "embeddings")
        val probes = emb.orderBy(col("vec_id")).limit(5)
        val brute = Ann.bruteForceTopK(emb, probes, "vec_id", "embedding",
          k = 10)
        // the coarse quantizer is trained once per session (ModelCache,
        // same policy as the trainer family) — production IVF trains it
        // offline and serves every query from the cached centroids
        val quant = graft.ml.ModelCache.fitted(s, dir, "IVF_QUANT:k=8")(
            Ann.fitIvfQuantizer(emb, "vec_id", "embedding", nCells = 8))
          .asInstanceOf[org.apache.spark.ml.clustering.KMeansModel]
        val approx = Ann.ivfTopK(emb, probes, "vec_id", "embedding", k = 10,
          nCells = 8, nProbe = 3, quantizer = Some(quant))
        brute
          .join(approx.select(col("probe_id"), col("neighbor_id")),
            Seq("probe_id", "neighbor_id"), "left_semi")
          .agg(count(lit(1)).as("__hits"))
          .select(lit(5).as("n_probes"), lit(10).as("k"),
            (col("__hits") >= 10L).as("recall_ok"))
      },
      Some("SELECT 5 AS n_probes, 10 AS k, TRUE AS recall_ok"),
      "IVF approximate top-k (partitioned scale path) with aggregate " +
        "recall-vs-brute asserted in-query"),

    "q_ann_pq_topk" -> QueryDef(
      (s, dir) => {
        // product-quantization ADC top-k (the memory-scale ANN path:
        // corpus stored as 8 sub-space codes per vector, ~32×
        // compression; queries scan a broadcast distance table, never
        // corpus vectors — see Ann.pqTopK). Recall-vs-brute aggregated
        // in-query like the IVF/LSH gates: 8×16 codebooks on
        // cluster-free synthetic embeddings measure ~0.4 recall@10 at
        // sf0.001 (AnnSpec prints it); the gate asserts >= 0.2 — a
        // broken codebook fit, encode join or ADC sum drops it to
        // ~k/n ≈ 0.02 and fails the hash.
        val emb = T(s, dir, "embeddings")
        val probes = emb.orderBy(col("vec_id")).limit(5)
        val brute = Ann.bruteForceTopK(emb, probes, "vec_id",
          "embedding", k = 10)
        // index-side frames (quantized corpus, codebooks, corpus codes)
        // are FrameCache'd per (dir, nSub, nCodes) — the PQ index builds
        // once per session, repeat queries pay only the probe-side ADC
        // table + lookup join (the IVF gate's ModelCache treatment)
        val approx = Ann.pqTopK(emb, probes, "vec_id", "embedding",
          k = 10, nSub = 8, nCodes = 16,
          cacheKey = Some(s"$dir:nSub=8:nCodes=16"))
        brute
          .join(approx.select(col("probe_id"), col("neighbor_id")),
            Seq("probe_id", "neighbor_id"), "left_semi")
          .agg(count(lit(1)).as("__hits"))
          .select(lit(5).as("n_probes"), lit(10).as("k"),
            (col("__hits") >= 10L).as("recall_ok"))
      },
      Some("SELECT 5 AS n_probes, 10 AS k, TRUE AS recall_ok"),
      "PQ/ADC approximate top-k (code-compressed scale path) with " +
        "aggregate recall-vs-brute asserted in-query"),

    "q_mm_decode" -> QueryDef(
      (s, dir) => {
        // multimodal plumbing over opaque binary payloads: batched
        // mapPartitions decode → per-type stats over decoded features.
        // The text-derived payloads are pure ASCII, so the byte stats the
        // decoder computes (length, mean byte value) ARE
        // oracle-expressible — the gate hash-checks the whole decode path
        // end to end, not just that it ran.
        // typed "audio" (stub feature path): text bytes are not images,
        // so typing them "image" would only buy a guaranteed-failing
        // codec probe per row; the real-codec path is gated separately
        // by q_mm_image_decode
        val media = Multimodal.asMedia(
          T(s, dir, "documents").withColumn("payload",
            col("text").cast("binary")),
          "doc_id", "payload", "audio")
        Multimodal.decodeBatched(media)
          .groupBy(col("media_type"))
          .agg(count(lit(1)).as("n"),
            sum(col("n_bytes").cast("long")).as("total_bytes"),
            sum(floor(col("mean_byte") * 1000)).as("mean_byte_milli"))
          .orderBy(col("media_type"))
      },
      Some("""SELECT 'audio' AS media_type, COUNT(*) AS n,
             | CAST(SUM(length(text)) AS BIGINT) AS total_bytes,
             | CAST(SUM(CAST(floor(
             |   (list_aggregate(list_transform(range(1, length(text)+1),
             |      i -> ascii(text[i])), 'sum') / length(text)) * 1000.0)
             |   AS BIGINT)) AS BIGINT) AS mean_byte_milli
             | FROM documents GROUP BY 1 ORDER BY media_type""".stripMargin),
      "multimodal: binary payload + batched partition-local decode " +
        "(byte stats hash-checked)"),

    "q_mm_image_decode" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // real-codec round-trip: deterministic PNGs are ENCODED on
        // executors (synthPng), then DECODED by the javax.imageio batch
        // path — the emitted width/height come from the codec reading
        // actual PNG bytes, and the oracle recomputes the expected
        // dimensions from the seed formula
        val ids = T(s, dir, "documents").filter(col("doc_id") < 64)
          .select(col("doc_id")).as[Long]
        val media = ids.map { id =>
          val w = 16 + (id % 32).toInt
          val h = 12 + (id % 24).toInt
          (id, "image", Multimodal.synthPng(w, h, id))
        }.toDF("media_id", "media_type", "content")
        Multimodal.decodeBatched(media)
          .select(col("media_id"), col("width"), col("height"))
          .orderBy(col("media_id"))
      },
      Some("""SELECT doc_id AS media_id,
             | CAST(16 + doc_id % 32 AS INTEGER) AS width,
             | CAST(12 + doc_id % 24 AS INTEGER) AS height
             | FROM documents WHERE doc_id < 64 ORDER BY media_id""".stripMargin),
      "multimodal: real PNG decode via javax.imageio — codec round-trip " +
        "with dimensions hash-checked"),

    "q_mm_audio_decode" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // real-codec round-trip for audio: deterministic PCM16 WAVs are
        // ENCODED on executors (synthWav), then PARSED by the
        // javax.sound.sampled batch path — emitted sample_rate/n_samples
        // come from the codec reading actual RIFF headers, and the
        // oracle recomputes them from the seed formula
        val ids = T(s, dir, "documents").filter(col("doc_id") < 64)
          .select(col("doc_id")).as[Long]
        val media = ids.map { id =>
          val n = 1000 + (id % 50).toInt * 20
          val rate = 8000 + (id % 4).toInt * 4000
          (id, "audio", Multimodal.synthWav(n, rate, id))
        }.toDF("media_id", "media_type", "content")
        Multimodal.decodeBatched(media)
          .select(col("media_id"), col("sample_rate"), col("n_samples"))
          .orderBy(col("media_id"))
      },
      Some("""SELECT doc_id AS media_id,
             | CAST(8000 + (doc_id % 4) * 4000 AS INTEGER) AS sample_rate,
             | CAST(1000 + (doc_id % 50) * 20 AS BIGINT) AS n_samples
             | FROM documents WHERE doc_id < 64 ORDER BY media_id""".stripMargin),
      "multimodal: real WAV parse via javax.sound — codec round-trip " +
        "with sample rate and frame count hash-checked"),

    "q_mm_video_frames" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        // real-container round-trip for the video path: deterministic
        // animated GIFs are ENCODED on executors (synthGif), then the
        // decode batch WALKS the actual container — frame counts and
        // dimensions come from the codec, oracle recomputes them from
        // the seed formula
        val ids = T(s, dir, "documents").filter(col("doc_id") < 32)
          .select(col("doc_id")).as[Long]
        val media = ids.map { id =>
          val frames = 2 + (id % 6).toInt
          (id, "video",
            Multimodal.synthGif(8 + (id % 8).toInt, 6, frames, id))
        }.toDF("media_id", "media_type", "content")
        Multimodal.decodeBatched(media)
          .select(col("media_id"), col("width"), col("n_frames"))
          .orderBy(col("media_id"))
      },
      Some("""SELECT doc_id AS media_id,
             | CAST(8 + doc_id % 8 AS INTEGER) AS width,
             | CAST(2 + doc_id % 6 AS INTEGER) AS n_frames
             | FROM documents WHERE doc_id < 32 ORDER BY media_id""".stripMargin),
      "multimodal: real animated-GIF container walk — codec-derived " +
        "frame counts hash-checked"),

    "q_mm_frame_sample" -> QueryDef(
      (s, dir) => {
        // frame sampling with metadata-driven frame counts (n_frames from
        // the document's n_chars, so the expected per-bucket frame totals
        // are oracle-expressible): explode is narrow — cost scales with
        // sampled frames, not payload bytes
        val media = T(s, dir, "documents").select(
          col("doc_id").cast("long").as("media_id"),
          lit("video").as("media_type"),
          col("text").cast("binary").as("content"),
          struct(lit(0).cast("int").as("width"),
            lit(0).cast("int").as("height"),
            (pmod(col("n_chars"), lit(240)) + 1).cast("int").as("n_frames"),
            lit(16000).as("sample_rate")).as("meta"))
        Multimodal.frameSample(media, stride = 10)
          .groupBy((col("media_id") % 10).as("bucket"))
          .agg(count(lit(1)).as("frames"))
          .orderBy(col("bucket"))
      },
      Some("""SELECT doc_id % 10 AS bucket,
             | CAST(SUM((n_chars % 240) // 10 + 1) AS BIGINT) AS frames
             | FROM documents GROUP BY 1 ORDER BY bucket""".stripMargin),
      "multimodal: video frame sampling at stride (frame totals " +
        "hash-checked via metadata)"),

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
      "language/source histogram over corpus metadata"),

    "q_decontaminate" -> QueryDef(
      (s, dir) => {
        // benchmark decontamination (the GPT-3/PaLM 13-gram protocol):
        // the "benchmark" is derived in-query as 16-token spans (tokens
        // 5..20) of every 20th doc — eval items quoted verbatim from the
        // corpus, the realistic contamination scenario. Benchmark
        // 13-grams broadcast; the corpus explodes its 13-grams once and
        // semi-joins map-side. Flags the span sources AND any near-dups
        // sharing a 13-token window.
        val docs = T(s, dir, "documents")
        val toks = split(trim(lower(col("text"))), "\\s+")
        val bench = docs
          .filter(col("doc_id") % 20 === 0 && size(toks) >= 20)
          .select(concat_ws(" ", slice(toks, 5, 16)).as("bench_text"))
        val bg = Decontaminate.benchmarkNgrams(bench, "bench_text", n = 13)
        Decontaminate.contaminated(docs, bg, "doc_id", "text", n = 13)
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |     regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |   FROM documents),
             | bench AS (SELECT array_to_string(ts[5:20], ' ') AS btext
             |   FROM t WHERE doc_id % 20 = 0 AND len(ts) >= 20),
             | bt AS (SELECT regexp_split_to_array(btext, '\s+') AS bts
             |   FROM bench),
             | bg AS (SELECT DISTINCT
             |     unnest(list_transform(range(1, greatest(len(bts)-12,1)+1),
             |       i -> array_to_string(bts[i:least(i+12, len(bts))], ' ')))
             |     AS ng
             |   FROM bt),
             | tg AS (SELECT doc_id,
             |     unnest(list_distinct(
             |       list_transform(range(1, greatest(len(ts)-12,1)+1),
             |         i -> array_to_string(ts[i:least(i+12, len(ts))], ' '))))
             |     AS ng
             |   FROM t)
             | SELECT doc_id, COUNT(*) AS n_overlap
             | FROM tg WHERE ng IN (SELECT ng FROM bg)
             | GROUP BY doc_id ORDER BY doc_id""".stripMargin),
      "benchmark decontamination: 13-gram overlap vs a broadcast " +
        "benchmark n-gram set"),

    "q_repetition_filter" -> QueryDef(
      (s, dir) => {
        // Gopher-style repetition quality gate at word level: duplicate-
        // token fraction and top-token fraction, thresholded. One fused
        // TextProfile scan per row (the declarative pair re-tokenized
        // per metric, and topTokenFrac's sort+aggregate lambdas ran
        // interpreted) — still map-only, no explode, no shuffle; the
        // exact integer counts divide once in double on both sides
        val docs = T(s, dir, "documents")
        docs.select(col("doc_id"),
            TextStats.profile(col("text")).as("__p"))
          .select(
            col("doc_id"),
            TextStats.tokenCountFrom(col("__p")).cast("long")
              .as("n_tokens"),
            TextStats.dupTokenFracFrom(col("__p")).as("dup_token_frac"),
            TextStats.topTokenFracFrom(col("__p")).as("top_token_frac"))
          .withColumn("keep",
            col("dup_token_frac") <= 0.55 && col("top_token_frac") <= 0.15)
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |     regexp_split_to_array(trim(lower(text)), '\s+') AS ts
             |   FROM documents),
             | m AS (SELECT doc_id,
             |     CAST(len(ts) AS BIGINT) AS n_tokens,
             |     1.0 - CAST(len(list_distinct(ts)) AS DOUBLE)
             |       / CAST(len(ts) AS DOUBLE) AS dup_token_frac,
             |     CAST((SELECT MAX(cnt) FROM (SELECT COUNT(*) AS cnt
             |         FROM unnest(ts) AS u(tok) GROUP BY tok)) AS DOUBLE)
             |       / CAST(len(ts) AS DOUBLE) AS top_token_frac
             |   FROM t)
             | SELECT doc_id, n_tokens, dup_token_frac, top_token_frac,
             |   dup_token_frac <= 0.55 AND top_token_frac <= 0.15 AS keep
             | FROM m ORDER BY doc_id""".stripMargin),
      "word-level repetition quality gate (duplicate-token + top-token " +
        "fractions), map-only"),

    "q_pii_scrub" -> QueryDef(
      (s, dir) => {
        // PII redaction over the corpus: emails/phones replaced with
        // typed tags, per-doc counts kept for audit. The corpus has no
        // organic PII, so every 10th doc is seeded in-query with a
        // deterministic email+phone (both engines build the identical
        // string); the gate hash-checks counts AND the scrubbed text
        // (via md5). Map-only regexp_replace at any scale.
        val docs = T(s, dir, "documents")
        val seeded = when(col("doc_id") % 10 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or call +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
          .otherwise(col("text"))
        // regex columns ABOVE the sort, not below it: a global sort's
        // range-sampling job re-executes its child, so ordering the
        // regex output paid the whole scrub pass twice (sf10: 20.6 s vs
        // 2.0 s — round-12 probe, output value-identical). Sampling the
        // (doc_id, text) child costs one cheap scan, the regex work runs
        // once post-exchange, and projection preserves the sort order.
        docs.select(col("doc_id"), seeded.as("__t"))
          .orderBy(col("doc_id"))
          .select(
            col("doc_id"),
            TextStats.emailCount(col("__t")).cast("long").as("n_emails"),
            TextStats.phoneCount(col("__t")).cast("long").as("n_phones"),
            md5(TextStats.scrubPii(col("__t")).cast("binary"))
              .as("scrub_digest"))
      },
      Some("""WITH seeded AS (SELECT doc_id,
             |     CASE WHEN doc_id % 10 = 0 THEN text || ' contact user'
             |         || doc_id || '@example.com or call +1-555-'
             |         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             |       ELSE text END AS t
             |   FROM documents)
             | SELECT doc_id,
             |   CAST(len(regexp_extract_all(t,
             |     '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT)
             |     AS n_emails,
             |   CAST(len(regexp_extract_all(t,
             |     '\+1-555-[0-9]{4}')) AS BIGINT) AS n_phones,
             |   md5(regexp_replace(regexp_replace(t,
             |     '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
             |     '\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS scrub_digest
             | FROM seeded ORDER BY doc_id""".stripMargin),
      "PII scrubbing with typed tags + per-doc audit counts " +
        "(self-seeded, scrub output hash-checked)")
  )
}
