package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.core.{QueryDef, QueryModule, Tables}
import graft.functions.UnicodeNorm
import graft.graph.PageRank
import graft.text.Compressibility

/** Corpus-hygiene, layout, and schedule operators a pretraining
  * pipeline runs before/around curation: Unicode normalization, HTML
  * boilerplate stripping, sentence-level exact dedup with document
  * reassembly, deterministic global/per-epoch shuffles, partition-skew
  * profiling, the Gopher rule battery, feature hashing, compression
  * scoring, Z-order layout keys, link-graph PageRank, group-aware
  * splits, and WordPiece tokenization.
  *
  * Extends the reference's preprocess surface (preprocess.py:60-90 is
  * column-level cleaning; these are the text/layout-level analogues a
  * web-scale corpus needs). Scale theme: everything is map-only or a
  * key-hash shuffle — no global windows, no all-pairs joins, nothing
  * driver-side.
  */
object PipelineQueries extends QueryModule {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Mixed-form probe appended to each doc so the normalizer has real
    * work on the (ASCII-only) synthetic corpus: NFC letters, a combining
    * sequence (e + U+0301), marks-on-capitals, and Hangul. The oracle SQL
    * embeds the identical codepoints, so both engines normalize
    * byte-identical input.
    */
  private val AccentProbe = " Café NAÏVE wörld été 가"

  override def defs: Map[String, QueryDef] = Map(

    "q_text_normalize" -> QueryDef(
      (s, dir) => {
        // Unicode normalization battery via the native codegen'd
        // UnicodeNorm expression: NFC canonicalization + accent
        // stripping, gated byte-for-byte against DuckDB's
        // nfc_normalize/strip_accents. norm_was_nfc asserts the
        // already-normal short-circuit path agrees with the oracle's
        // equality check. Map-only; at 100 TB this is a pure scan pass
        // and the isNormalized fast path skips allocation on the
        // (dominant) ASCII fraction.
        val d = T(s, dir, "documents").filter(col("doc_id") < 20)
        val x = concat(substring(col("text"), 1, 80), lit(AccentProbe))
        d.select(
            col("doc_id"),
            UnicodeNorm.unicode_norm(x, "nfc").as("nfc_text"),
            UnicodeNorm.unicode_norm(x, "strip_accents").as("stripped"),
            (UnicodeNorm.unicode_norm(x, "nfc") === x).as("norm_was_nfc"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id,
             |     substr(text, 1, 80) || '$AccentProbe' AS x
             |   FROM documents WHERE doc_id < 20)
             | SELECT doc_id,
             |   nfc_normalize(x) AS nfc_text,
             |   strip_accents(x) AS stripped,
             |   (nfc_normalize(x) = x) AS norm_was_nfc
             | FROM t ORDER BY doc_id""".stripMargin),
      "Unicode normalization (native codegen expression): NFC + " +
        "strip-accents, byte-exact vs DuckDB on mixed-form input"),

    "q_html_strip" -> QueryDef(
      (s, dir) => {
        // HTML boilerplate stripping over deterministically constructed
        // markup (both engines wrap the same corpus text in the same
        // tags, so the gate checks the STRIP, not the construction):
        // tag removal, entity decoding (&amp; last, per the standard
        // double-decode rule), whitespace collapse. All regexp_replace
        // projections — map-only, codegen'd, pushdown-neutral.
        val d = T(s, dir, "documents").filter(col("doc_id") < 40)
        val html = concat(
          lit("<html><body><h1>T</h1><p class=\"x\">"),
          substring(col("text"), 1, 100),
          lit("</p><a href=\"http://e.com?a=1&amp;b=2\">&lt;link&gt;" +
            "</a> &quot;q&quot; &#39;s&#39;</body></html>"))
        val noTags = regexp_replace(html, "<[^>]*>", " ")
        val decoded = regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(regexp_replace(noTags,
            "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
          "&amp;", "&")
        d.select(
            col("doc_id"),
            trim(regexp_replace(decoded, "\\s+", " ")).as("clean_text"),
            regexp_count(html, lit("<[^>]*>")).cast("long").as("n_tags"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |     '<html><body><h1>T</h1><p class="x">'
             |     || substr(text, 1, 100)
             |     || '</p><a href="http://e.com?a=1&amp;b=2">&lt;link&gt;'
             |     || '</a> &quot;q&quot; &#39;s&#39;</body></html>' AS html
             |   FROM documents WHERE doc_id < 40),
             | u AS (SELECT doc_id, html,
             |     regexp_replace(html, '<[^>]*>', ' ', 'g') AS no_tags
             |   FROM t)
             | SELECT doc_id,
             |   trim(regexp_replace(
             |     replace(replace(replace(replace(replace(no_tags,
             |       '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
             |       '&#39;', ''''), '&amp;', '&'),
             |     '\s+', ' ', 'g')) AS clean_text,
             |   CAST(len(regexp_extract_all(html, '<[^>]*>')) AS BIGINT)
             |     AS n_tags
             | FROM u ORDER BY doc_id""".stripMargin),
      "HTML strip: tag removal + entity decode + whitespace collapse " +
        "over identically constructed markup"),

    "q_sentence_dedup" -> QueryDef(
      (s, dir) => {
        // sentence-level exact dedup with document reassembly (the
        // C4-style boilerplate-line removal, at sentence granularity):
        // explode sentences with position, keep each sentence's globally
        // first occurrence (min doc_id, then position), reassemble
        // surviving sentences per document in original order. Two
        // key-hash shuffles (by sentence text, by doc_id); the per-doc
        // collect is bounded by document size. At 100 TB the sentence
        // shuffle is the cost — hash(sentence) partitioning spreads it,
        // and substituting hash64(sentence) for the text key would
        // shrink shuffle bytes without changing semantics.
        val d = T(s, dir, "documents")
        val sents = d.select(col("doc_id"),
          posexplode(split(col("text"), "\\. ")).as(Seq("pos", "sent")))
        val w = Window.partitionBy(col("sent"))
          .orderBy(col("doc_id"), col("pos"))
        val kept = sents.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
        val nSent = sents.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_sent"))
        val reassembled = kept.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_kept"),
            concat_ws(". ",
              transform(
                array_sort(collect_list(struct(col("pos"), col("sent")))),
                x => x.getField("sent"))).as("kept_text"))
        nSent.join(reassembled, Seq("doc_id"), "left")
          .filter(col("doc_id") < 30)
          .select(col("doc_id"), col("n_sent"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("kept_text"), lit("")).as("kept_text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH s AS (SELECT doc_id,
             |     generate_subscripts(string_split(text, '. '), 1) AS pos,
             |     unnest(string_split(text, '. ')) AS sent
             |   FROM documents),
             | k AS (SELECT doc_id, pos, sent,
             |     row_number() OVER (PARTITION BY sent
             |       ORDER BY doc_id, pos) AS rn
             |   FROM s),
             | n AS (SELECT doc_id, COUNT(*) AS n_sent FROM s
             |   GROUP BY doc_id),
             | r AS (SELECT doc_id, COUNT(*) AS n_kept,
             |     string_agg(sent, '. ' ORDER BY pos) AS kept_text
             |   FROM k WHERE rn = 1 GROUP BY doc_id)
             | SELECT n.doc_id, n.n_sent,
             |   COALESCE(r.n_kept, 0) AS n_kept,
             |   COALESCE(r.kept_text, '') AS kept_text
             | FROM n LEFT JOIN r USING (doc_id)
             | WHERE n.doc_id < 30 ORDER BY n.doc_id""".stripMargin),
      "sentence-level exact dedup: keep global first occurrence, " +
        "reassemble docs in original sentence order"),

    "q_global_shuffle" -> QueryDef(
      (s, dir) => {
        // deterministic global shuffle (the pre-training example
        // permutation): order by a salted hash of the key. Seeded, so
        // reruns and both engines agree exactly. The gate samples the
        // head via TakeOrderedAndProject (no global sort materialized);
        // the production write path is repartitionByRange(shuffle_key) +
        // sortWithinPartitions + per-file write — a range shuffle, never
        // a single-partition sort, at any corpus size.
        T(s, dir, "documents")
          .select(
            md5(concat(col("doc_id").cast("string"), lit(":42")))
              .as("shuffle_key"),
            col("doc_id"))
          .orderBy(col("shuffle_key"))
          .limit(20)
      },
      Some("""SELECT md5(CAST(doc_id AS VARCHAR) || ':42')
             |     AS shuffle_key, doc_id
             | FROM documents ORDER BY shuffle_key LIMIT 20""".stripMargin),
      "deterministic global shuffle: salted-hash permutation order, " +
        "head sampled via top-k"),

    "q_skew_profile" -> QueryDef(
      (s, dir) => {
        // partition-skew profiler: per-key group sizes -> heavy-hitter
        // keys with their skew factor (cnt x n_keys / total = ratio of
        // this key's share to the uniform share). The diagnostic you run
        // BEFORE choosing salting/AQE for a join key. One partial+final
        // count by key; the stats row is a broadcast single-row cross
        // join; double division happens once, identically on both sides.
        val cnts = T(s, dir, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("cnt"))
        val stats = cnts.agg(
          count(lit(1)).as("n_keys"),
          sum(col("cnt")).as("total"),
          max(col("cnt")).as("max_cnt"),
          min(col("cnt")).as("min_cnt"))
        cnts.orderBy(col("cnt").desc, col("l_suppkey")).limit(5)
          .crossJoin(broadcast(stats))
          .select(col("l_suppkey"), col("cnt"), col("n_keys"),
            col("total"), col("max_cnt"), col("min_cnt"),
            ((col("cnt") * col("n_keys")).cast(DoubleType) / col("total"))
              .as("skew_factor"))
          .orderBy(col("cnt").desc, col("l_suppkey"))
      },
      Some("""WITH c AS (SELECT l_suppkey, COUNT(*) AS cnt
             |   FROM lineitem GROUP BY l_suppkey),
             | st AS (SELECT COUNT(*) AS n_keys,
             |     CAST(SUM(cnt) AS BIGINT) AS total,
             |     MAX(cnt) AS max_cnt, MIN(cnt) AS min_cnt FROM c)
             | SELECT l_suppkey, cnt, n_keys, total, max_cnt, min_cnt,
             |   CAST(cnt * n_keys AS DOUBLE) / total AS skew_factor
             | FROM (SELECT * FROM c ORDER BY cnt DESC, l_suppkey
             |       LIMIT 5) tc, st
             | ORDER BY cnt DESC, l_suppkey""".stripMargin),
      "join-key skew profiler: heavy keys with share-vs-uniform skew " +
        "factor from one count-by-key pass"),

    "q_pagerank_links" -> QueryDef(
      (s, dir) => {
        // link-graph PageRank (crawl-side quality prior for corpus
        // weighting): 4 iterations of fixed-point integer PageRank over
        // a deterministic 3-out-regular doc graph. Integer micro-unit
        // ranks make the result bit-exact across engines AND across
        // reruns/partitionings — see graph/PageRank.scala. Per
        // iteration: one join by src + one aggregate by dst; with
        // id-bucketed storage at 100 TB the join is shuffle-free.
        val nodes = T(s, dir, "documents").select(col("doc_id"))
        val n = nodes.agg(count(lit(1)).as("__n"))
        val withN = nodes.crossJoin(broadcast(n))
        val edges = Seq((7, 1), (13, 5), (31, 11))
          .map { case (p, c) =>
            withN.select(col("doc_id").as("src"),
              expr(s"(doc_id * $p + $c) % __n").as("dst"))
          }
          .reduce(_.unionByName(_))
        PageRank.run(nodes, edges, "doc_id", "src", "dst",
            iterations = 4,
            edgeCacheKey = Some(s"pagerank_edges:links:$dir"))
          .orderBy(col("rank").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH nn AS (SELECT COUNT(*) AS n FROM documents),
             | nodes AS (SELECT doc_id AS id FROM documents),
             | e AS (
             |   SELECT doc_id AS src, (doc_id*7+1) % n AS dst
             |     FROM documents CROSS JOIN nn
             |   UNION ALL SELECT doc_id, (doc_id*13+5) % n
             |     FROM documents CROSS JOIN nn
             |   UNION ALL SELECT doc_id, (doc_id*31+11) % n
             |     FROM documents CROSS JOIN nn),
             | deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
             | r0 AS (SELECT id, 1000000000000 // n AS rank
             |   FROM nodes CROSS JOIN nn),
             | c1 AS (SELECT e.dst AS id,
             |     CAST(SUM((r.rank * 85 // 100) // d.deg) AS BIGINT) AS m
             |   FROM e JOIN deg d ON e.src = d.src
             |   JOIN r0 r ON e.src = r.id GROUP BY e.dst),
             | r1 AS (SELECT nodes.id,
             |     ((1000000000000 * 15) // 100) // n + COALESCE(c1.m, 0)
             |       AS rank
             |   FROM nodes CROSS JOIN nn LEFT JOIN c1 ON nodes.id = c1.id),
             | c2 AS (SELECT e.dst AS id,
             |     CAST(SUM((r.rank * 85 // 100) // d.deg) AS BIGINT) AS m
             |   FROM e JOIN deg d ON e.src = d.src
             |   JOIN r1 r ON e.src = r.id GROUP BY e.dst),
             | r2 AS (SELECT nodes.id,
             |     ((1000000000000 * 15) // 100) // n + COALESCE(c2.m, 0)
             |       AS rank
             |   FROM nodes CROSS JOIN nn LEFT JOIN c2 ON nodes.id = c2.id),
             | c3 AS (SELECT e.dst AS id,
             |     CAST(SUM((r.rank * 85 // 100) // d.deg) AS BIGINT) AS m
             |   FROM e JOIN deg d ON e.src = d.src
             |   JOIN r2 r ON e.src = r.id GROUP BY e.dst),
             | r3 AS (SELECT nodes.id,
             |     ((1000000000000 * 15) // 100) // n + COALESCE(c3.m, 0)
             |       AS rank
             |   FROM nodes CROSS JOIN nn LEFT JOIN c3 ON nodes.id = c3.id),
             | c4 AS (SELECT e.dst AS id,
             |     CAST(SUM((r.rank * 85 // 100) // d.deg) AS BIGINT) AS m
             |   FROM e JOIN deg d ON e.src = d.src
             |   JOIN r3 r ON e.src = r.id GROUP BY e.dst),
             | r4 AS (SELECT nodes.id,
             |     ((1000000000000 * 15) // 100) // n + COALESCE(c4.m, 0)
             |       AS rank
             |   FROM nodes CROSS JOIN nn LEFT JOIN c4 ON nodes.id = c4.id)
             | SELECT id AS doc_id, CAST(rank AS BIGINT) AS rank
             | FROM r4 ORDER BY rank DESC, id LIMIT 20""".stripMargin),
      "link-graph PageRank: 4 fixed-point integer iterations, " +
        "bit-exact top-20 vs the oracle's unrolled CTE chain"),

    "q_zorder_layout" -> QueryDef(
      (s, dir) => {
        // Z-order (Morton) layout keys: bit-interleave two 10-bit
        // dims (part key, order key) so ONE range-partitioned sort gives locality in BOTH —
        // the standard multi-dim clustering trick (each z-range bucket
        // bounds part AND supplier, so scans filtered on either dim
        // prune files). All integer bit-twiddling (magic-number spread),
        // so the gate is exact. The bucket profile below is the layout
        // planner's output: per z-range row counts + both dims' bounds.
        def spread(c: Column): Column = {
          val a = c.bitwiseAND(lit(1023L))
          val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
          val d2 = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
          val e = d2.bitwiseOR(shiftleft(d2, 2)).bitwiseAND(lit(0x33333333L))
          e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
        }
        val li = T(s, dir, "lineitem")
          .select((col("l_partkey") % 1024).as("x"),
            (col("l_orderkey") % 1024).as("y"))
        li.withColumn("z",
            spread(col("x")).bitwiseOR(shiftleft(spread(col("y")), 1)))
          .withColumn("bucket", shiftright(col("z"), 16))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("x")).as("x_min"), max(col("x")).as("x_max"),
            min(col("y")).as("y_min"), max(col("y")).as("y_max"))
          .orderBy(col("bucket"))
      },
      Some("""WITH b AS (SELECT l_partkey % 1024 AS x,
             |     l_orderkey % 1024 AS y FROM lineitem),
             | s1 AS (SELECT x, y,
             |     ((x | (x << 8)) & 16711935) AS xa,
             |     ((y | (y << 8)) & 16711935) AS ya FROM b),
             | s2 AS (SELECT x, y,
             |     ((xa | (xa << 4)) & 252645135) AS xb,
             |     ((ya | (ya << 4)) & 252645135) AS yb FROM s1),
             | s3 AS (SELECT x, y,
             |     ((xb | (xb << 2)) & 858993459) AS xc,
             |     ((yb | (yb << 2)) & 858993459) AS yc FROM s2),
             | s4 AS (SELECT x, y,
             |     ((xc | (xc << 1)) & 1431655765) AS xd,
             |     ((yc | (yc << 1)) & 1431655765) AS yd FROM s3),
             | z AS (SELECT x, y, (xd | (yd << 1)) AS z FROM s4)
             | SELECT z // 65536 AS bucket, COUNT(*) AS n_rows,
             |   MIN(x) AS x_min, MAX(x) AS x_max,
             |   MIN(y) AS y_min, MAX(y) AS y_max
             | FROM z GROUP BY 1 ORDER BY bucket""".stripMargin),
      "Z-order layout keys: Morton bit-interleave of two dims + " +
        "per-z-range layout profile (exact integer gate)"),

    "q_gopher_rules" -> QueryDef(
      (s, dir) => {
        // the Gopher-style document quality rule battery (word count
        // band, mean word length band, alphabetic-word fraction,
        // symbol density, stopword presence) -> keep decision. One
        // map-only pass over ONE fused TextProfile scan (round-8: the
        // declarative battery paid two regex replaces + two interpreted
        // HOF filters + a split per row); every metric is an integer
        // count divided at most once in double, identical both sides.
        val p = graft.text.TextStats.profile(col("text"))
        T(s, dir, "documents")
          .select(col("doc_id"), p.as("__p"))
          .select(col("doc_id"),
            col("__p.n_tokens").cast("long").as("n_words"),
            (col("__p.nonws_chars").cast("long").cast(DoubleType) /
              col("__p.n_tokens").cast("long")).as("mean_word_len"),
            (col("__p.alpha_tokens").cast("long").cast(DoubleType) /
              col("__p.n_tokens").cast("long")).as("alpha_word_frac"),
            (col("__p.punct_count").cast("long").cast(DoubleType) /
              col("__p.n_tokens").cast("long")).as("symbol_ratio"),
            (col("__p.raw_stop_count") > 0).as("has_stopword"))
          .withColumn("keep",
            col("n_words") >= 50 && col("n_words") <= 100000 &&
              col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0 &&
              col("alpha_word_frac") > 0.8 && col("symbol_ratio") < 0.1 &&
              col("has_stopword"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, text,
             |     regexp_split_to_array(trim(text), '\s+') AS ts
             |   FROM documents),
             | m AS (SELECT doc_id,
             |     CAST(len(ts) AS BIGINT) AS n_words,
             |     CAST(length(regexp_replace(text, '\s', '', 'g'))
             |       AS BIGINT) AS char_len,
             |     CAST(len(list_filter(ts,
             |       x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
             |       AS alpha_words,
             |     CAST(length(regexp_replace(text, '[a-z0-9\s]', '', 'g'))
             |       AS BIGINT) AS symbols,
             |     len(list_filter(ts, x -> x IN ('the', 'a', 'of', 'and',
             |       'to', 'in', 'is', 'it'))) > 0 AS has_stopword
             |   FROM t)
             | SELECT doc_id, n_words,
             |   CAST(char_len AS DOUBLE) / n_words AS mean_word_len,
             |   CAST(alpha_words AS DOUBLE) / n_words AS alpha_word_frac,
             |   CAST(symbols AS DOUBLE) / n_words AS symbol_ratio,
             |   has_stopword,
             |   (n_words >= 50 AND n_words <= 100000
             |     AND CAST(char_len AS DOUBLE) / n_words >= 3.0
             |     AND CAST(char_len AS DOUBLE) / n_words <= 10.0
             |     AND CAST(alpha_words AS DOUBLE) / n_words > 0.8
             |     AND CAST(symbols AS DOUBLE) / n_words < 0.1
             |     AND has_stopword) AS keep
             | FROM m ORDER BY doc_id""".stripMargin),
      "Gopher quality rule battery: word/length/alpha/symbol/stopword " +
        "rules -> keep decision, one map-only pass"),

    "q_topk_per_group" -> QueryDef(
      (s, dir) => {
        // grouped top-k selection (best-of per domain — the curation
        // step that caps any one source's contribution): per
        // (lang, source) keep the 3 largest docs. Partitioned window
        // top-k: parallelism = |groups|, no global sort; at 100 TB
        // group count is large so the shuffle spreads evenly (a skewed
        // group would take the q_skew_profile -> salting route).
        val w = Window.partitionBy(col("lang"), col("source"))
          .orderBy(col("n_chars").desc, col("doc_id"))
        T(s, dir, "documents")
          .select(col("lang"), col("source"), col("doc_id"),
            col("n_chars"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("lang"), col("source"), col("doc_id"),
            col("n_chars"), col("rk").cast("long").as("rk"))
          .orderBy(col("lang"), col("source"), col("rk"))
      },
      Some("""SELECT lang, source, doc_id, n_chars, rk FROM (
             |   SELECT lang, source, doc_id, n_chars,
             |     CAST(row_number() OVER (PARTITION BY lang, source
             |       ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk
             |   FROM documents) t
             | WHERE rk <= 3 ORDER BY lang, source, rk""".stripMargin),
      "grouped top-k: per (lang, source) keep 3 largest docs via " +
        "partitioned window — the per-domain contribution cap"),

    "q_feature_hashing" -> QueryDef(
      (s, dir) => {
        // hashing-trick featurization (HashingTF shape): token ->
        // bucket = uniform_hash(token) % 64, per-doc bucket counts.
        // The hash is the md5-prefix integer both engines compute
        // identically (same construction the sampling family uses).
        // explode + partial/final count by (doc, bucket) — the exact
        // shuffle shape of distributed vectorization; dims are fixed,
        // so output width is bounded regardless of vocabulary size
        // (that boundedness is the entire point of feature hashing at
        // 100 TB: no vocab broadcast, no OOV path).
        val d = T(s, dir, "documents").filter(col("doc_id") < 20)
        d.select(col("doc_id"),
            explode(split(trim(col("text")), "\\s+")).as("tok"))
          .select(col("doc_id"),
            (conv(substring(md5(col("tok")), 1, 8), 16, 10)
              .cast("long") % 64).as("bucket"))
          .groupBy(col("doc_id"), col("bucket"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("doc_id"), col("bucket"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |     unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
             |   FROM documents WHERE doc_id < 20)
             | SELECT doc_id,
             |   CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 64
             |     AS bucket,
             |   COUNT(*) AS cnt
             | FROM t GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin),
      "feature hashing (HashingTF shape): md5-uniform token buckets, " +
        "per-doc bucket counts — fixed-width features, no vocab state"),

    "q_compression_ratio" -> QueryDef(
      (s, dir) => {
        // deflate-based repetitiousness signal (text/Compressibility):
        // the quality filter SQL cannot express, gated on falsifiable
        // invariants the oracle CAN check — exact raw byte counts plus
        // compressibility facts (output nonempty, compresses below
        // raw, the doubled text exposes the repeat, ratio under 0.9 on
        // this small-vocab corpus). comp/comp2 sizes themselves stay
        // Spark-side (zlib output is impl-defined); the booleans are
        // the cross-engine contract.
        val sized = Compressibility.deflateSizes(
          T(s, dir, "documents")
            .filter(col("doc_id") < 100 && col("n_chars") >= 200),
          "doc_id", "text")
        sized.select(col("doc_id"), col("raw_len"),
            (col("comp_len") > 0).as("comp_pos"),
            (col("comp_len") < col("raw_len")).as("comp_lt_raw"),
            (col("comp2_len") < col("comp_len") * 2).as("rep_detected"),
            (col("comp_len").cast(DoubleType) / col("raw_len") < 0.9)
              .as("ratio_lt_09"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |   CAST(octet_length(encode(text)) AS BIGINT) AS raw_len,
             |   TRUE AS comp_pos, TRUE AS comp_lt_raw,
             |   TRUE AS rep_detected, TRUE AS ratio_lt_09
             | FROM documents WHERE doc_id < 100 AND n_chars >= 200
             | ORDER BY doc_id""".stripMargin),
      "compression-ratio quality signal: one deflate pass per doc " +
        "(reused Deflater via mapPartitions), invariant-gated"),

    "q_epoch_schedule" -> QueryDef(
      (s, dir) => {
        // multi-epoch data-order generation: each epoch is an
        // independent deterministic permutation (salt the shuffle hash
        // with the epoch number), so the trainer never replays epoch
        // N's order in epoch N+1 yet every rerun reproduces the same
        // schedule. The gate samples each epoch's first 5 examples via
        // a per-epoch window top-k (3 bounded partitions here); the
        // production write is repartitionByRange(epoch, key) +
        // sortWithinPartitions — range shuffle, no global sort, any
        // corpus size.
        val epochs = s.range(0, 3).select(col("id").as("epoch"))
        T(s, dir, "documents").select(col("doc_id"))
          .crossJoin(broadcast(epochs))
          .withColumn("skey",
            md5(concat(col("doc_id").cast("string"), lit(":"),
              col("epoch").cast("string"), lit(":42"))))
          .withColumn("ord", row_number().over(
            Window.partitionBy(col("epoch")).orderBy(col("skey"))))
          .filter(col("ord") <= 5)
          .select(col("epoch"), col("ord").cast("long").as("ord"),
            col("doc_id"), col("skey"))
          .orderBy(col("epoch"), col("ord"))
      },
      Some("""SELECT epoch, ord, doc_id, skey FROM (
             |   SELECT e.epoch, d.doc_id,
             |     md5(CAST(d.doc_id AS VARCHAR) || ':'
             |       || CAST(e.epoch AS VARCHAR) || ':42') AS skey,
             |     CAST(row_number() OVER (PARTITION BY e.epoch
             |       ORDER BY md5(CAST(d.doc_id AS VARCHAR) || ':'
             |         || CAST(e.epoch AS VARCHAR) || ':42')) AS BIGINT)
             |       AS ord
             |   FROM documents d CROSS JOIN
             |     (SELECT unnest(generate_series(0, 2)) AS epoch) e) t
             | WHERE ord <= 5 ORDER BY epoch, ord""".stripMargin),
      "multi-epoch schedule: per-epoch salted-hash permutations, " +
        "deterministic across reruns, distinct across epochs"),

    "q_group_split" -> QueryDef(
      (s, dir) => {
        // group-aware train/test split (GroupShuffleSplit semantics):
        // the split key is a hash of the GROUP (source), not the row,
        // so every document of a source lands in the same split — the
        // leakage guard for template-heavy corpora, where row-level
        // splits put near-identical docs on both sides. Deterministic
        // (md5-derived), map-only; the gate carries per-split counts
        // AND the leakage audit (sources spanning both splits must be
        // zero), which a row-hash split fails outright.
        val d = T(s, dir, "documents")
        val tagged = d.withColumn("split",
          when(conv(substring(md5(concat(col("source"), lit(":42"))),
              1, 8), 16, 10).cast("long") % 10 < 7, lit("train"))
            .otherwise(lit("test")))
        val counts = tagged.groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("source")).as("n_sources"))
        val leaked = tagged.select(col("source"), col("split")).distinct()
          .groupBy(col("source"))
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n") > 1)
          .agg(count(lit(1)).as("n_leaked_sources"))
        counts.crossJoin(broadcast(leaked))
          .select(col("split"), col("n_docs"), col("n_sources"),
            col("n_leaked_sources"))
          .orderBy(col("split"))
      },
      Some("""WITH t AS (SELECT source,
             |     CASE WHEN CAST('0x' || substr(md5(source || ':42'), 1, 8)
             |       AS BIGINT) % 10 < 7 THEN 'train' ELSE 'test' END
             |       AS split
             |   FROM documents),
             | c AS (SELECT split, COUNT(*) AS n_docs,
             |     COUNT(DISTINCT source) AS n_sources
             |   FROM t GROUP BY split),
             | l AS (SELECT COUNT(*) AS n_leaked_sources FROM (
             |     SELECT source FROM (SELECT DISTINCT source, split FROM t)
             |     GROUP BY source HAVING COUNT(*) > 1))
             | SELECT split, n_docs, n_sources, n_leaked_sources
             | FROM c CROSS JOIN l ORDER BY split""".stripMargin),
      "group-aware split: hash the group key so no source spans both " +
        "splits — gate includes the zero-leakage audit"),

    "q_wordpiece" -> QueryDef(
      (s, dir) => {
        // WordPiece subword tokenization (native codegen expression,
        // functions/WordPieceTokenize): greedy longest-match against a
        // fixed vocab with ## continuations — real token accounting for
        // training budgets. The vocab contains every single character,
        // so [UNK] is impossible and DETOKENIZATION IS EXACT — which
        // gives the gate a falsifiable cross-engine invariant: rebuild
        // the text from the pieces and compare to the (whitespace-
        // collapsed) original in both engines. Map-only at any scale.
        val vocab: Seq[String] = {
          val chars = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
          val words = Seq("the", "a", "of", "and", "to", "in", "is",
            "it", "table", "row", "value", "part", "key", "scan",
            "hash", "sort", "merge", "batch", "line", "fast", "slow")
          val suffixes = Seq("##s", "##ed", "##ing", "##le", "##ow")
          chars ++ chars.map("##" + _) ++ words ++ suffixes
        }
        val d = T(s, dir, "documents").filter(col("doc_id") < 50)
        val toks = graft.functions.WordPieceTokenize
          .wordpiece_tokenize(lower(col("text")), vocab)
        d.select(col("doc_id"), col("text"),
            size(split(trim(lower(col("text"))), "\\s+")).cast("long")
              .as("n_words"),
            toks.as("__toks"))
          .select(col("doc_id"), col("n_words"),
            (size(col("__toks")).cast("long") >= col("n_words"))
              .as("subword_expands"),
            (size(filter(col("__toks"), t => t === "[UNK]")) === 0)
              .as("no_oov"),
            (trim(array_join(transform(col("__toks"),
                t => when(t.startsWith("##"), substring(t, 3, 1000000))
                  .otherwise(concat(lit(" "), t))), "")) ===
              trim(regexp_replace(lower(col("text")), "\\s+", " ")))
              .as("detok_ok"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |   CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
             |     AS BIGINT) AS n_words,
             |   TRUE AS subword_expands, TRUE AS no_oov, TRUE AS detok_ok
             | FROM documents WHERE doc_id < 50
             | ORDER BY doc_id""".stripMargin),
      "WordPiece tokenization (native codegen, greedy longest-match): " +
        "full-char vocab makes detokenization exact — round-trip gated"))
}
