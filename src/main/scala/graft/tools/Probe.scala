// Ablation profiler for the scale-ladder hot spots: times named variants
// of a query with stages removed/substituted, so a high sfN/sf1 ratio can
// be DECOMPOSED into its stages instead of guessed at (the q_l3 treatment
// from round 11, packaged as a tool).
//
//   tools/run_main.sh graft.tools.Probe '<variant regex>' /tmp/sf10
//   PROBE_REPS=3 (default) timed noop-materializations after 1 warmup.
//
// Variants deliberately inline small pieces of the production queries:
// a probe that calls only the public composite can't isolate a stage.
// They are profiling scaffolding, NOT correctness surface — every
// registered query keeps its oracle in SparkEntry.
package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.core.GraftSession
import graft.etl.Skew
import graft.text.{NearDup, TextStats}

object Probe {

  private def T(s: SparkSession, dir: String, name: String) =
    graft.core.Tables.load(s, dir, name)

  /** q_ngram_jaccard's pair set: (doc_id, doc_id+1) for existing ids. */
  private def adjPairs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      .join(docs.select(col("doc_id").as("id_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"))

  /** ngramJaccard's join body (NearDup.ngramJaccard:359) without the
    * final jaccard arithmetic — isolates join+shuffle cost from the
    * array_intersect cost.
    */
  private def ngramJoined(docs: DataFrame): DataFrame = {
    val sh = NearDup.shingles(docs, "text", 3)
      .select(col("doc_id").as("__jid"), col("__shingles"))
    val pairs = adjPairs(docs)
    val a = pairs.join(sh, pairs("id_a") === col("__jid"))
      .withColumnRenamed("__shingles", "__sa").drop("__jid")
    a.join(sh, a("id_b") === col("__jid"))
      .withColumnRenamed("__shingles", "__sb").drop("__jid")
  }

  private def registered(name: String) = SparkEntry.queries(name)

  /** Row-index-preserving frame: rdd.zipWithIndex keeps the frame's
    * row order (partition-major, and the frames under test end in a
    * global sort), so equality of the indexed frames pins VALUES AND
    * ORDER together.
    */
  private def indexed(df: DataFrame): DataFrame = {
    val schema = df.schema.add("__idx", org.apache.spark.sql.types.LongType)
    df.sparkSession.createDataFrame(
      df.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
      schema)
  }

  /** Order-sensitive symmetric difference — must return [0, 0]. */
  private def orderedDiff(a: DataFrame, b: DataFrame): DataFrame = {
    val ai = indexed(a)
    val bi = indexed(b)
    ai.exceptAll(bi).agg(count(lit(1)).as("a_minus_b"))
      .crossJoin(bi.exceptAll(ai).agg(count(lit(1)).as("b_minus_a")))
  }

  private val BuildSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Exact linear-interpolated p25/p50/p75 from a value histogram
    * `(v, cnt)` — `percentile(v, p)` semantics on the expanded multiset
    * (rank r = p*(n-1), v_i + f*(v_{i+1}-v_i)), computed with window math
    * over the tiny histogram. p in {1/4, 1/2, 3/4} and small-integer
    * grained v make every step exact in doubles (the histMedian argument
    * from q_robust_scale, generalized to quartiles).
    */
  private def histPercentiles(hist: DataFrame): DataFrame = {
    val wg = Window.partitionBy(col("__g"))
    val wc = wg.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = hist.withColumn("__g", lit(1))
      .withColumn("__n", sum(col("cnt")).over(wg))
      .withColumn("__cum", sum(col("cnt")).over(wc))
      .withColumn("__cum0", col("__cum") - col("cnt"))
    def vat(i: Column): Column =
      max(when(col("__cum0") <= i && i < col("__cum"),
        col("v").cast("double"))).over(wg)
    def pct(p: Double): Column = {
      val r = lit(p) * (col("__n") - 1).cast("double")
      val i = floor(r).cast("long")
      val f = r - i.cast("double")
      val iu = least(i + 1, col("__n") - 1)
      vat(i) + f * (vat(iu) - vat(i))
    }
    d.withColumn("__p25", pct(0.25)).withColumn("__p50", pct(0.5))
      .withColumn("__p75", pct(0.75))
      .groupBy(col("__g"))
      .agg(first(col("__p25")).as("exact_p25"),
        first(col("__p50")).as("exact_p50"),
        first(col("__p75")).as("exact_p75"))
      .drop("__g")
  }

  val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- q_skyline_pareto (round-13 decomposition) ----------------------
    // splits the price-grain groupBy from the PrefixSum.runningMax
    // two-phase scan (RDD round-trip + persist + localCheckpoint), and
    // times the single-task global-window alternative for reference —
    // the shape runningMax exists to avoid at scale.
    "sky_full" -> registered("q_skyline_pareto"),
    "sky_group" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy((col("l_extendedprice")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast(org.apache.spark.sql.types.LongType).as("price_cents"))
        .agg(max(col("l_quantity")
          .cast(org.apache.spark.sql.types.LongType)).as("qty"))),
    "sky_runmax" -> ((s, dir) =>
      graft.operators.PrefixSum.runningMax(
        variants("sky_group")(s, dir), "price_cents", "qty")),
    // round-14 REJECTED candidate, kept reproducible: the SQL-native
    // bucket-scan runningMax (join-back form) applied to the skyline —
    // measured +6.9%/+10.4%/+13% at sf0.1 and +9% at sf1 in alternating
    // bench A/Bs vs the RDD form (controls ±4%), so q_skyline_pareto
    // keeps the RDD scan; the sum scans keep the SQL-native form where
    // it won. This variant pins the rejected plan shape
    // (plans/r14/q_skyline_pareto_sqlnative_rejected.txt).
    "sky_sqlnative" -> ((s, dir) => {
      val nB = math.max(s.sparkContext.defaultParallelism * 8, 256)
      val g = variants("sky_group")(s, dir)
      val base = g.select(col("price_cents").as("__k"),
        col("qty").as("__v"))
      val st = base.agg(min(col("__k")).as("__kmin"),
        max(col("__k")).as("__kmax"))
      val grid = base.crossJoin(broadcast(st))
        .withColumn("__pfx_b",
          expr(s"(__k - __kmin) div ((__kmax - __kmin) div $nB + 1)"))
        .drop("__kmin", "__kmax")
      val w = Window.partitionBy(col("__pfx_b")).orderBy(col("__k"))
      val local = grid.withColumn("__prevl", max(col("__v")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      val offs = grid.groupBy(col("__pfx_b"))
        .agg(max(col("__v")).as("__bm"))
        .withColumn("__off", coalesce(max(col("__bm")).over(
          Window.orderBy(col("__pfx_b"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(Long.MinValue)))
        .select(col("__pfx_b"), col("__off"))
      local.join(broadcast(offs), Seq("__pfx_b"))
        .filter(col("__v") > greatest(coalesce(col("__prevl"),
          lit(Long.MinValue)), col("__off")))
        .select(col("__k").as("price_cents"), col("__v").as("qty"))
        .orderBy(col("price_cents"))
    }),
    "sky_sqlnative_diff" -> ((s, dir) => orderedDiff(
      variants("sky_sqlnative")(s, dir), variants("sky_full")(s, dir))),
    "sky_window1task" -> ((s, dir) => {
      val w = Window.orderBy(col("price_cents"))
        .rowsBetween(Window.unboundedPreceding, -1)
      variants("sky_group")(s, dir)
        .withColumn("pm", max(col("qty")).over(w))
        .filter(col("pm").isNull || col("qty") > col("pm"))
        .select(col("price_cents"), col("qty"))
        .orderBy(col("price_cents"))
    }),
    // ---- q_max_concurrency (round-14: SQL-native PrefixSum) -------------
    "conc_full" -> registered("q_max_concurrency"),
    // ---- q_chi2_independence (round-14: measure the recorded 100 TB
    // flip under the cluster profile at a larger SF — r13 kept the
    // 4-concurrent-scan form at gate scale and recorded "derived
    // marginals win when the scan is the cost" as prose; this pins it)
    "chi2_full" -> registered("q_chi2_independence"),
    "chi2_derived" -> ((s, dir) => {
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val d = T(s, dir, "documents").select(col("lang"), col("source"))
      val cells = d.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("nij"))
      // marginals derived from the cells table: ONE fact scan total
      val rows = cells.groupBy(col("lang")).agg(sum(col("nij")).as("ri"))
      val cols = cells.groupBy(col("source")).agg(sum(col("nij")).as("cj"))
      val n = cells.agg(sum(col("nij")).as("n"))
      val terms = cells
        .join(broadcast(rows), Seq("lang"))
        .join(broadcast(cols), Seq("source"))
        .select(graft.functions.FixedPoint.scaledDiv(
          col("nij").cast(DecimalType(38, 0)) * col("nij"),
          col("ri").cast(DecimalType(38, 0)) * col("cj"),
          10000000000L).as("term"))
      terms.agg(sum(col("term")).as("t")).crossJoin(broadcast(n))
        .select(col("n"), col("t"))
    }),
    // ---- q_bfs_reach (round-14 decomposition: iteration overhead) -------
    "bfs_full" -> registered("q_bfs_reach"),
    // seed frontier alone: the per-rep lineitem+orders scans
    "bfs_seed" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val o = T(s, dir, "orders")
      li.join(o.filter(col("o_custkey") === 0).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey").as("node")).distinct()
    }),
    // the round-13 production form, kept reproducible after the round-14
    // rewrite: per-hop anti-join pruning against the visited set. The
    // rewrite (now the registered query) labels each k-step neighborhood
    // with k and takes min(hop) per node instead — node set identical
    // (neighbors of already-visited members of hop-set k are ⊆ hop-set
    // k+1's input and min() re-ranks them; bfs_diff pins [0,0]); the
    // anti-join pruning only pays when frontier ≪ visited, which a
    // 2-hop bound never reaches — while each anti-join costs an
    // exchange of BOTH sides and deepens the re-executed lineage.
    "bfs_antijoin" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val o = T(s, dir, "orders")
      val seed = li.join(
          o.filter(col("o_custkey") === 0).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey").as("node")).distinct()
      val edges = graft.core.FrameCache.cached(s,
          s"coorder_edges:bysrc:$dir") {
        li.join(li.select(col("l_orderkey").as("k2"),
              col("l_partkey").as("dst")),
            col("l_orderkey") === col("k2"))
          .filter(col("l_partkey") =!= col("dst"))
          .select(col("l_partkey").as("src"), col("dst"))
          .groupBy(col("src"))
          .agg(collect_set(col("dst")).as("__dsts"))
          .select(col("src"), explode(col("__dsts")).as("dst"))
      }
      var visited = seed.withColumn("hop", lit(0L))
      var frontier = seed
      for (h <- 1 to 2) {
        val next = frontier
          .join(edges, col("node") === col("src"))
          .select(col("dst").as("node")).distinct()
          .join(visited.select(col("node").as("vn")),
            col("node") === col("vn"), "left_anti")
        frontier = next
        visited = visited.unionByName(
          next.withColumn("hop", lit(h.toLong)))
      }
      visited.groupBy(col("hop"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("hop"))
    }),
    "bfs_nounion" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val o = T(s, dir, "orders")
      val seed = li.join(
          o.filter(col("o_custkey") === 0).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_partkey").as("node")).distinct()
      val edges = graft.core.FrameCache.cached(s,
          s"coorder_edges:bysrc:$dir") {
        li.join(li.select(col("l_orderkey").as("k2"),
              col("l_partkey").as("dst")),
            col("l_orderkey") === col("k2"))
          .filter(col("l_partkey") =!= col("dst"))
          .select(col("l_partkey").as("src"), col("dst"))
          .groupBy(col("src"))
          .agg(collect_set(col("dst")).as("__dsts"))
          .select(col("src"), explode(col("__dsts")).as("dst"))
      }
      val n1 = seed.join(edges, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
      val n2 = n1.join(edges, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
      seed.withColumn("hop", lit(0L))
        .unionByName(n1.withColumn("hop", lit(1L)))
        .unionByName(n2.withColumn("hop", lit(2L)))
        .groupBy(col("node")).agg(min(col("hop")).as("hop"))
        .groupBy(col("hop")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("hop"))
    }),
    "bfs_diff" -> ((s, dir) => orderedDiff(
      variants("bfs_nounion")(s, dir), variants("bfs_antijoin")(s, dir))),
    // ---- q_triangle_count (round-14 decomposition) -----------------------
    "tri_full" -> registered("q_triangle_count"),
    // directed edge construction (2 degree joins) up to the checkpoint
    "tri_directed" -> ((s, dir) => {
      // same FrameCache key as MiningQueries.cachedPartPairs, so this
      // probe times the degree joins off the SAME warmed pair cache the
      // registered query uses
      val e = graft.core.FrameCache.cached(s, s"copairs:l_partkey:$dir") {
        graft.operators.CoOccur.pairs(
          T(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_partkey").as("item"))
            .distinct(), "l_orderkey", "item")
      }.filter(col("cab") >= 2).select(col("pa"), col("pb"))
      val nodes = e.select(col("pa").as("v"))
        .unionByName(e.select(col("pb").as("v")))
      val deg = nodes.groupBy(col("v")).agg(count(lit(1)).as("d"))
      val withDeg = e
        .join(deg.select(col("v").as("pa"), col("d").as("da")), Seq("pa"))
        .join(deg.select(col("v").as("pb"), col("d").as("db")), Seq("pb"))
      val aFirst = (col("da") < col("db")) ||
        (col("da") === col("db") && col("pa") < col("pb"))
      withDeg.select(
        when(aFirst, col("pa")).otherwise(col("pb")).as("src"),
        when(aFirst, col("pb")).otherwise(col("pa")).as("dst"),
        when(aFirst, col("db")).otherwise(col("da")).as("dd"))
    }),
    // directed edges INCLUDING the localCheckpoint materialization —
    // (tri_ckpt − tri_directed) isolates the checkpoint write,
    // (tri_full − tri_ckpt) isolates the wedge + closure joins
    "tri_ckpt" -> ((s, dir) =>
      variants("tri_directed")(s, dir).localCheckpoint()),
    // the support-filtered edge frame alone (off the warmed pair cache)
    "tri_e" -> ((s, dir) =>
      graft.core.FrameCache.cached(s, s"copairs:l_partkey:$dir") {
        graft.operators.CoOccur.pairs(
          T(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_partkey").as("item"))
            .distinct(), "l_orderkey", "item")
      }.filter(col("cab") >= 2).select(col("pa"), col("pb"))),
    // degree frame alone — (tri_directed − tri_deg − tri_e) ≈ the two
    // degree joins + orientation projection
    "tri_deg" -> ((s, dir) => {
      val e = variants("tri_e")(s, dir)
      e.select(col("pa").as("v"))
        .unionByName(e.select(col("pb").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
    }),
    // ---- q_ngram_jaccard ------------------------------------------------
    "ngram_full" -> registered("q_ngram_jaccard"),
    "ngram_noorder" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      NearDup.ngramJaccard(docs, "doc_id", "text", adjPairs(docs), n = 3)
    }),
    "ngram_nojacc" -> ((s, dir) =>
      ngramJoined(T(s, dir, "documents"))
        .select(col("id_a"), col("id_b"),
          (size(col("__sa")) + size(col("__sb"))).as("sz"))),
    "ngram_shingles" -> ((s, dir) =>
      NearDup.shingles(T(s, dir, "documents"), "text", 3)
        .agg(sum(size(col("__shingles"))).as("n"))),
    // candidate A: current join shape + localCheckpoint of the skinny
    // result before the global sort (the sort's range-sampling pass then
    // scans the 24-byte rows instead of re-executing joins+intersect)
    "ngram_ckpt" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val j = ngramJoined(docs)
        .withColumn("__inter",
          size(array_intersect(col("__sa"), col("__sb"))).cast("double"))
        .withColumn("jaccard",
          col("__inter") /
            (size(col("__sa")) + size(col("__sb")) - col("__inter")))
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .localCheckpoint()
      j.orderBy(col("id_a"))
    }),
    // candidate B: single-shuffle pair assembly — each doc's shingle
    // array is tagged to the two adjacent pairs it serves and grouped by
    // pair id (ONE exchange of 2 arrays/doc; the join shape moves arrays
    // ~3x and computes shingles twice)
    "ngram_grouped" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val sh = NearDup.shingles(docs, "text", 3)
        .select(col("doc_id"), col("__shingles"))
      val tagged = sh.select(explode(array(
        struct(col("doc_id").as("pid"), lit(0).as("role"),
          col("__shingles").as("arr")),
        struct((col("doc_id") - 1).as("pid"), lit(1).as("role"),
          col("__shingles").as("arr")))).as("x"))
        .select(col("x.pid"), col("x.role"), col("x.arr"))
      val g = tagged.groupBy(col("pid"))
        .agg(first(when(col("role") === 0, col("arr")), ignoreNulls = true)
          .as("__sa"),
          first(when(col("role") === 1, col("arr")), ignoreNulls = true)
            .as("__sb"))
        .filter(col("__sa").isNotNull && col("__sb").isNotNull)
      val skinny = g.withColumn("__inter",
          size(array_intersect(col("__sa"), col("__sb"))).cast("double"))
        .select(col("pid").as("id_a"), (col("pid") + 1).as("id_b"),
          (col("__inter") /
            (size(col("__sa")) + size(col("__sb")) - col("__inter")))
            .as("jaccard"))
        .localCheckpoint()
      skinny.orderBy(col("id_a"))
    }),
    // ---- q_canonical_select ---------------------------------------------
    "canon_full" -> registered("q_canonical_select"),
    "canon_quality" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(TextStats.qualityScore(col("text")).as("q"))
        .agg(sum(col("q")).as("sq"))),
    "canon_quality_fused" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(TextStats.profile(col("text")).as("__p"))
        .select(TextStats.qualityScoreFrom(col("__p")).as("q"))
        .agg(sum(col("q")).as("sq"))),
    // the candidate rewrite: fused quality pass + groupBy argmax
    // (map-side combine) instead of two windows over all rows
    "canon_fused_agg" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val comp = graft.core.FrameCache.cached(s,
        s"langchain_components:$dir") {
        val dd = d.select(col("doc_id"), col("lang"))
        val a = dd.select(col("doc_id").as("id_a"), col("lang").as("la"))
        val b = dd.select((col("doc_id") - 1).as("id_a"),
          col("doc_id").as("id_b"), col("lang").as("lb"))
        NearDup.connectedComponents(
          a.join(b, Seq("id_a")).filter(col("la") === col("lb"))
            .select(col("id_a"), col("id_b")))
      }
      val q = d.select(col("doc_id").as("id"),
        TextStats.qualityScoreFrom(TextStats.profile(col("text")))
          .as("quality"))
      comp.join(q, Seq("id"))
        .groupBy(col("component"))
        .agg(max(struct(col("quality"), (-col("id")).as("nid"))).as("__b"),
          count(lit(1)).as("n_members"))
        .select(col("component"), (-col("__b.nid")).as("keep_id"),
          col("n_members"), col("__b.quality").as("best_quality"))
        .orderBy(col("component"))
    }),
    // ---- q_pii_scrub ----------------------------------------------------
    "pii_full" -> registered("q_pii_scrub"),
    "pii_noorder" -> ((s, dir) => piiBody(s, dir, order = false,
      counts = true, scrub = true)),
    "pii_counts" -> ((s, dir) => piiBody(s, dir, order = true,
      counts = true, scrub = false)),
    "pii_scrubonly" -> ((s, dir) => piiBody(s, dir, order = true,
      counts = false, scrub = true)),
    "pii_scan" -> ((s, dir) => piiBody(s, dir, order = false,
      counts = false, scrub = false)),
    // candidate: range-sort the (doc_id, text) frame FIRST, compute the
    // regex columns ABOVE the sort — the sort's sampling pass then
    // re-executes only the scan+seed (0.4 s at sf10), not the regex work
    "pii_sortfirst" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val seeded = when(col("doc_id") % 10 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(col("text"))
      docs.select(col("doc_id"), seeded.as("__t"))
        .orderBy(col("doc_id"))
        .select(
          col("doc_id"),
          TextStats.emailCount(col("__t")).cast("long").as("n_emails"),
          TextStats.phoneCount(col("__t")).cast("long").as("n_phones"),
          md5(TextStats.scrubPii(col("__t")).cast("binary"))
            .as("scrub_digest"))
    }),
    // equivalence gates for the candidates (must return [0, 0]).
    // ORDER-SENSITIVE (round-12 advice): both frames are zipped with a
    // row index before the symmetric difference, so a rewrite that moves
    // a global sort cannot pass while emitting the right rows in the
    // wrong order — exactly the property the sort-motion candidates risk.
    "pii_diff" -> ((s, dir) => orderedDiff(
      registered("q_pii_scrub")(s, dir),
      variants("pii_sortfirst")(s, dir))),
    "ngram_diff" -> ((s, dir) => orderedDiff(
      registered("q_ngram_jaccard")(s, dir),
      variants("ngram_grouped")(s, dir))),
    // ---- q_join_idx_rejoin (round 13) -----------------------------------
    "idx_full" -> registered("q_join_idx_rejoin"),
    // scan cost alone: both projections of the fact, no join
    "idx_scan" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      li.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .unionByName(li.select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_returnflag") === "R", 1.0).otherwise(0.0)
            .as("l_quantity")))
        .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("sv"))
    }),
    // the bucketed production path (warmup builds the layout; timed reps
    // measure the steady-state zero-exchange rejoin)
    "idx_bucketed" -> registered("q_join_idx_bucketed"),
    // layout build cost in isolation: fresh bucketed write of both
    // halves each rep (unique table names defeat the build-once cache)
    "idx_build" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val n = BuildSeq.incrementAndGet()
      val keys = Seq("l_orderkey", "l_linenumber")
      graft.io.Bucketing.writeBucketed(
        li.select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity")), s"probe_x_$n", keys, 32)
      graft.io.Bucketing.writeBucketed(
        li.select(col("l_orderkey"), col("l_linenumber"),
          when(col("l_returnflag") === "R", 1).otherwise(0).as("label")),
        s"probe_y_$n", keys, 32)
      s.sql(s"DROP TABLE probe_x_$n")
      s.sql(s"DROP TABLE probe_y_$n")
      s.range(1).select(lit(n).as("built"))
    }),
    "idx_diff" -> ((s, dir) => orderedDiff(
      registered("q_join_idx_rejoin")(s, dir),
      registered("q_join_idx_bucketed")(s, dir))),

    // ---- q_dedup_embedding (round 13) -----------------------------------
    "emb_full" -> registered("q_dedup_embedding"),
    "emb_probes" -> ((s, dir) =>
      T(s, dir, "embeddings").orderBy(col("vec_id")).limit(50)),
    "emb_lsh" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val probes = emb.orderBy(col("vec_id")).limit(50).localCheckpoint()
      graft.sim.Ann.lshTopK(emb, probes, "vec_id", "embedding", k = 1,
        bucketLength = 2.0, numHashTables = 4)
    }),
    "emb_brute" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val probes = emb.orderBy(col("vec_id")).limit(50).localCheckpoint()
      graft.sim.Ann.bruteForceTopK(emb, probes, "vec_id", "embedding",
        k = 10)
    }),

    // ---- q_approx_quantiles (round 13) ----------------------------------
    "aq_full" -> registered("q_approx_quantiles"),
    "aq_exact3" -> ((s, dir) =>
      T(s, dir, "lineitem").agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"))),
    "aq_approx3" -> ((s, dir) =>
      T(s, dir, "lineitem").agg(
        expr("approx_percentile(l_quantity, 0.25, 10000)").as("a25"),
        expr("approx_percentile(l_quantity, 0.5, 10000)").as("a50"),
        expr("approx_percentile(l_quantity, 0.75, 10000)").as("a75"))),
    "aq_exact_arr" -> ((s, dir) =>
      T(s, dir, "lineitem").agg(
        expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))")
          .as("ps"))),
    "aq_approx_arr" -> ((s, dir) =>
      T(s, dir, "lineitem").agg(
        expr("approx_percentile(l_quantity, array(0.25D, 0.5D, 0.75D), " +
          "10000)").as("as"))),
    // exact percentiles from a grouped value histogram (codegen'd hash
    // agg scan; interpolation is window math over the ~50-row histogram)
    "aq_hist" -> ((s, dir) => histPercentiles(
      T(s, dir, "lineitem").groupBy(col("l_quantity").as("v"))
        .agg(count(lit(1)).as("cnt")))),

    // ---- q_multi_distinct (round 13) ------------------------------------
    "mdist_full" -> registered("q_multi_distinct"),
    "mdist_one" -> ((s, dir) =>
      T(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("d_parts"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))),
    "mdist_plain" -> ((s, dir) =>
      T(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
        .orderBy(col("l_returnflag"))),
    // two-level pre-agg alternative: dedup (flag, key) pairs first, then
    // count — 3 scans instead of Expand's 1 scan x3 fan-out
    "mdist_preagg" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val dp = li.groupBy(col("l_returnflag"), col("l_partkey")).count()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("d_parts"))
      val ds = li.groupBy(col("l_returnflag"), col("l_suppkey")).count()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("d_supps"))
      val pl = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))
      dp.join(ds, Seq("l_returnflag")).join(pl, Seq("l_returnflag"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- round-13 orderBy-over-expensive-map audit ------------------------
    "pat_full" -> registered("q_pattern_match"),
    // candidate: sort the user-grain journey frame FIRST, regex above —
    // the sort's sampling pass then re-executes only the (shuffle-reused)
    // final agg, not the regex
    "pat_sortfirst" -> ((s, dir) => {
      val j = T(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("ch"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          concat_ws("", transform(
            array_sort(collect_list(
              struct(col("ts"), col("event_id"), col("ch")))),
            x => x.getField("ch"))).as("journey"))
      j.orderBy(col("user_id"))
        .select(col("user_id"), col("n_events"),
          size(expr("regexp_extract_all(journey, 'vc*p', 0)"))
            .cast("long").as("n_matches"),
          (size(expr("regexp_extract_all(journey, 'vc*p', 0)")) > 0)
            .as("converted"))
    }),
    "pat_diff" -> ((s, dir) => orderedDiff(
      registered("q_pattern_match")(s, dir),
      variants("pat_sortfirst")(s, dir))),
    "edit_full" -> registered("q_edit_distance"),
    // candidate: range-sort the joined 80-char prefixes, Levenshtein
    // above the sort (the q_pii_scrub treatment)
    "edit_sortfirst" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val a = docs.select(col("doc_id").as("id_a"),
        substring(col("text"), 1, 80).as("ta"))
      val b = docs.select((col("doc_id") - 1).as("id_a"),
        col("doc_id").as("id_b"), substring(col("text"), 1, 80).as("tb"))
      a.join(b, Seq("id_a"))
        .orderBy(col("id_a"))
        .select(col("id_a"), col("id_b"),
          levenshtein(col("ta"), col("tb")).as("edit_dist"),
          (levenshtein(col("ta"), col("tb")) <= 20).as("near_dup"))
    }),
    "edit_diff" -> ((s, dir) => orderedDiff(
      registered("q_edit_distance")(s, dir),
      variants("edit_sortfirst")(s, dir))),

    "umelt_full" -> registered("q_unpivot_melt"),
    // the pre-r13 shape: stack() first, 4x row Expand through the agg
    "umelt_expand" -> ((s, dir) =>
      T(s, dir, "lineitem").select(expr(
          "stack(4, 'quantity', l_quantity, " +
            "'extendedprice', l_extendedprice, " +
            "'discount', l_discount, 'tax', l_tax) as (measure, val)"))
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"),
          sum(col("val").cast("decimal(18,2)")).cast("double").as("total"),
          min(col("val")).as("mn"), max(col("val")).as("mx"))
        .orderBy(col("measure"))),
    "umelt_diff" -> ((s, dir) => orderedDiff(
      registered("q_unpivot_melt")(s, dir),
      variants("umelt_expand")(s, dir))),

    // ---- q_stream_sessionize (round 13: parquet sink) --------------------
    "sess_full" -> registered("q_stream_sessionize"),
    "sess_stats" -> registered("q_session_stats"),

    // ---- q_neardup_incremental (round 14, session 2) ---------------------
    // decomposes minHashPairsAcross: the production form localCheckpoints
    // BOTH member frames (2 eager jobs), dedups each side separately (2
    // exchanges), SIGNS each side separately (2 shingle+minhash passes),
    // and re-dedups the union for the verify (3rd exchange). The rewrite
    // candidate signs ONE side-flagged distinct frame once and bands it
    // twice by flag filter.
    "ninc_full" -> registered("q_neardup_incremental"),
    // the pre-round-14-session-2 minHashPairsAcross body, kept
    // reproducible for the before/after A/B and the row-exact diff
    "ninc_prev" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val corpus = d.filter(pmod(col("doc_id"), lit(2)) === 0)
      val batch = d.filter(pmod(col("doc_id"), lit(2)) === 1)
      val fp = xxhash64(col("text"))
      val cMembers = corpus.select(fp.as("__fa"), col("doc_id").as("__cid"))
        .localCheckpoint()
      val bMembers = batch.select(fp.as("__fb"), col("doc_id").as("__bid"))
        .localCheckpoint()
      val cDist = corpus.select(fp.as("__fp"), col("text"))
        .dropDuplicates("__fp")
      val bDist = batch.select(fp.as("__fp"), col("text"))
        .dropDuplicates("__fp")
      def banded(df: DataFrame, as: String) =
        NearDup.minHashSignatures(df, "__fp", "text", 3, 8, 42L)
          .select(col("__id"), posexplode(col("__sig"))
            .as(Seq("__band", "__h")))
          .select(col("__band"), col("__h"), col("__id").as(as))
      val cand = banded(cDist, "__fa")
        .join(banded(bDist, "__fb"), Seq("__band", "__h"))
        .select(col("__fa"), col("__fb"))
        .dropDuplicates("__fa", "__fb")
      val union = cDist.unionByName(bDist).dropDuplicates("__fp")
      val fpPairs = NearDup.hashJaccard(union, "__fp", "text",
          cand.select(col("__fa").as("id_a"), col("__fb").as("id_b")),
          3, 42L)
        .filter(col("jaccard") >= 0.5)
        .select(col("id_a").as("__fa"), col("id_b").as("__fb"),
          col("jaccard"))
      fpPairs
        .join(cMembers, Seq("__fa"))
        .join(bMembers, Seq("__fb"))
        .select(col("__cid").as("corpus_id"), col("__bid").as("batch_id"),
          col("jaccard"))
        .orderBy(col("corpus_id"), col("batch_id"))
    }),
    "ninc_diff" -> ((s, dir) => orderedDiff(
      registered("q_neardup_incremental")(s, dir),
      variants("ninc_prev")(s, dir))),

    // ---- q_simhash_neardup (round 14, session 2) --------------------------
    // the caller already passes a one-row-per-fingerprint frame, yet
    // simHashPairs re-fingerprints it into a checkpointed member frame,
    // re-dedups it, and identity-joins members back (the minHashPairs
    // wrapper overhead, simhash edition). simh_pairs isolates the
    // candidate machinery; simh_core is the distinct-frame core.
    "simh_full" -> registered("q_simhash_neardup"),
    "simh_pairs" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val dist = docs.select(xxhash64(col("text")).as("__fp"), col("text"))
        .dropDuplicates("__fp")
      NearDup.simHashPairs(dist, "__fp", "text",
        maxHamming = 16, numBands = 8, shingleN = 3)
    }),
    "simh_core" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val dist = docs.select(xxhash64(col("text")).as("__fp"), col("text"))
        .dropDuplicates("__fp")
      NearDup.simHashFpPairs(dist, "text",
        maxHamming = 16, numBands = 8, shingleN = 3)
    }),
    "simh_core_diff" -> ((s, dir) => orderedDiff(
      variants("simh_pairs")(s, dir).select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b")),
      variants("simh_core")(s, dir).select(col("id_a"), col("id_b"))
        .orderBy(col("id_a"), col("id_b")))),
    // fused counts+dist: ONE groupBy carrying (cnt, text) vs the two
    // aggregations (count agg + dropDuplicates) every collapsed-group
    // consumer pays today
    "simh_twoagg" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val fp = xxhash64(col("text"))
      val counts = docs.groupBy(fp.as("__fp"))
        .agg(count(lit(1)).as("__cnt"))
      val dist = docs.select(fp.as("__fp"), col("text"))
        .dropDuplicates("__fp")
      dist.join(counts, Seq("__fp"))
        .agg(count(lit(1)).as("n"), sum(col("__cnt")).as("m"),
          sum(length(col("text"))).as("b"))
    }),
    "simh_oneagg" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val g = docs.groupBy(xxhash64(col("text")).as("__fp"))
        .agg(count(lit(1)).as("__cnt"), first(col("text")).as("text"))
      g.agg(count(lit(1)).as("n"), sum(col("__cnt")).as("m"),
        sum(length(col("text"))).as("b"))
    }),

    // ---- q_containment_dedup / q_containment_stats (round 14, session 2) --
    // stage decomposition of containmentSetPairs over the seeded corpus:
    // contd_g = the fused tokenize+hash+digest pass alone; contd_sh = +
    // set-collapse to the exploded distinct-set shingle frame (both
    // checkpoints); contd_set = full set-level pairs (blocking + subset
    // verify); contd_full/conts_full = the registered queries.
    "contd_full" -> registered("q_containment_dedup"),
    "conts_full" -> registered("q_containment_stats"),
    "contd_g" -> ((s, dir) =>
      NearDup.shingleHashes(seededDocs(s, dir), "text", 3)
        .select(col("doc_id").as("__id"),
          col("__shingle_hashes").as("__hs"))
        .withColumn("__did", xxhash64(col("__hs")))
        .select(col("__did"), col("__id"))),
    "contd_sh" -> ((s, dir) =>
      NearDup.shingleHashes(seededDocs(s, dir), "text", 3)
        .select(col("doc_id").as("__id"),
          col("__shingle_hashes").as("__hs"))
        .withColumn("__did", xxhash64(col("__hs")))
        .groupBy(col("__did")).agg(min(col("__hs")).as("__hs"))
        .select(col("__did"), explode(col("__hs")).as("__sh"))),
    "contd_set" -> ((s, dir) => {
      val (_, setPairs) =
        NearDup.containmentSetPairs(seededDocs(s, dir), "doc_id", "text", 3)
      setPairs
    }),

    // ---- q_neardup_topk_pairs grouping-shape bake-off --------------------
    // three shapes of the (rep, cnt, text) pre-collapse: the r14s1
    // two-aggregation form, the fused single groupBy (registered), and
    // fused + localCheckpoint — bench A/Bs were noise-bound (±15%), so
    // the call is made on same-JVM minima
    "ndtk_fused" -> registered("q_neardup_topk_pairs"),
    "ndtk_twoagg" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val fp = xxhash64(col("text"))
      val grp = docs.groupBy(fp.as("__fp"))
        .agg(min(col("doc_id")).as("__rep"), count(lit(1)).as("__cnt"))
      val dist = docs.select(fp.as("__fp"), col("text"))
        .dropDuplicates("__fp")
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
    }),
    "ndtk_ckpt" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val g = docs.groupBy(xxhash64(col("text")).as("__fp"))
        .agg(min(col("doc_id")).as("__rep"), count(lit(1)).as("__cnt"),
          first(col("text")).as("text"))
        .localCheckpoint()
      val grp = g.select(col("__fp"), col("__rep"), col("__cnt"))
      val dist = g.select(col("__fp"), col("text"))
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
    }),

    // ---- q_fingerprint_rolling (round 14, session 2) ----------------------
    // fpr_pairs isolates the fresh minHashPairs build the query pays per
    // execution; the same frame is already session-materialized as
    // FrameCache["minhash_pairs:3:8:0.5:<dir>"] for q_minhash_neardup /
    // q_simhash_neardup / q_curation_pipeline.
    "fpr_full" -> registered("q_fingerprint_rolling"),
    "fpr_pairs" -> ((s, dir) =>
      NearDup.minHashPairs(T(s, dir, "documents"), "doc_id", "text",
          minJaccard = 0.5)
        .select(col("id_a"), col("id_b"))),
    "fpr_fps" -> ((s, dir) =>
      T(s, dir, "documents").select(col("doc_id"),
        graft.functions.RollingFingerprint
          .rolling_fingerprint(col("text")).as("__fp"))),

    // ---- q_m2_smote (round 14, session 2) ---------------------------------
    // passes-over-prep decomposition: the SMOTE transform consumes the
    // prep pipeline's output THREE times per execution (fused stats
    // collect, minority slab checkpoint, final union scan) — smote_prep
    // times one full prep-transform pass; smote_stats the fused stats
    // aggregation; smote_full the registered query.
    "smote_full" -> registered("q_m2_smote"),
    // candidate: localCheckpoint the prepped matrix so the transform's
    // three consumers (stats collect, minority slab, final union scan)
    // read a materialization instead of re-running the prep transform
    "smote_ckptprep" -> ((s, dir) => {
      val prepped = preppedM2(s, dir).localCheckpoint()
      new graft.ml.Smote().setStrategy("smote").setK(3).transform(prepped)
        .groupBy(col("label")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("label"))
    }),
    "smote_plain" -> ((s, dir) =>
      new graft.ml.Smote().setStrategy("smote").setK(3)
        .transform(preppedM2(s, dir))
        .groupBy(col("label")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("label"))),
    "smote_prep" -> ((s, dir) => preppedM2(s, dir)),
    "smote_stats" -> ((s, dir) =>
      preppedM2(s, dir).groupBy(col("label"))
        .agg(count(lit(1)).as("__n"),
          first(col(graft.ml.PrepPipeline.FeaturesCol)).as("__sample"))
        .select(col("label"), col("__n"),
          // reference __sample so the noop sink cannot prune the vector
          // out of the aggregate being measured
          org.apache.spark.ml.functions.vector_to_array(col("__sample"))
            .getItem(0).as("__s0"))),

    // ---- keep-first dedup shape: window row_number vs min_by ------------
    // q_corpus_curation / q_curation_pipeline s1 dedup with a
    // partitionBy(fingerprint) row_number window — every copy of a
    // duplicate text crosses the exchange, then sorts. min_by collapses
    // copies map-side (one survivor per fingerprint per partition crosses)
    // — the §2.3 aggregate-before-you-shuffle shape; r13's q_centroid
    // probe says min_by plans SortAggregate, so the win (if any) is
    // shuffle volume vs the sort's cost.
    "curc_full" -> registered("q_corpus_curation"),
    "curc_minby" -> ((s, dir) => {
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
      scored.groupBy(col("__fp"))
        .agg(min_by(struct(col("source"), col("__tok")), col("doc_id"))
          .as("__m"))
        .groupBy(col("__m.source").as("source"))
        .agg(count(lit(1)).as("kept_docs"),
          sum(col("__m.__tok").cast("long")).as("kept_tokens"))
        .orderBy(col("source"))
    }),
    "curc_diff" -> ((s, dir) => orderedDiff(
      registered("q_corpus_curation")(s, dir),
      variants("curc_minby")(s, dir))),
    "curp_full" -> registered("q_curation_pipeline"),
    // s1 in isolation, both shapes (materializes survivor profiles)
    "curp_s1" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val w = Window.partitionBy(TextStats.fingerprintMd5(col("text")))
        .orderBy(col("doc_id"))
      docs.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("doc_id"), col("source"),
          TextStats.profile(col("text")).as("__p"))
        .select(col("doc_id"), col("source"),
          TextStats.tokenCountFrom(col("__p")).cast("long").as("__toks"))
    }),
    "curp_s1minby" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      docs.groupBy(TextStats.fingerprintMd5(col("text")).as("__fp"))
        .agg(min_by(struct(col("doc_id"), col("source"), col("text")),
          col("doc_id")).as("__m"))
        .select(col("__m.doc_id").as("doc_id"),
          col("__m.source").as("source"),
          TextStats.profile(col("__m.text")).as("__p"))
        .select(col("doc_id"), col("source"),
          TextStats.tokenCountFrom(col("__p")).cast("long").as("__toks"))
    }),
    "curp_s1diff" -> ((s, dir) => orderedDiff(
      variants("curp_s1")(s, dir).orderBy(col("doc_id")),
      variants("curp_s1minby")(s, dir).orderBy(col("doc_id")))),

    // ---- q_q16_supplier_count (round 14, session 3) -----------------------
    // the pre-r14s3 form kept reproducible: an explicit (partkey,
    // suppkey) distinct — a FULL fact exchange — fed an aggregation
    // whose countDistinct ALREADY dedups (group, suppkey) in its
    // map-side partial stage; production dropped it (3 exchanges -> 2,
    // strictly fewer shuffled bytes, -27% same-JVM, diff [0,0])
    "q16_full" -> registered("q_q16_supplier_count"),
    "q16_prev" -> ((s, dir) => {
      val ps = T(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val excluded = T(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      val p = T(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#4" && col("p_size") <= 20)
        .select(col("p_partkey"), col("p_brand"), col("p_type"),
          col("p_size"))
      ps.join(broadcast(excluded),
          ps("l_suppkey") === excluded("s_suppkey"), "left_anti")
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
          col("p_size"))
    }),
    "q16_diff" -> ((s, dir) => orderedDiff(
      registered("q_q16_supplier_count")(s, dir),
      variants("q16_prev")(s, dir))),

    // ---- q_join_salted --------------------------------------------------
    "salted_full" -> registered("q_join_salted"),
    "salted_plain" -> ((s, dir) => {
      val o = T(s, dir, "orders")
        .select(col("o_custkey").as("custkey"), col("o_totalprice"))
      val c = T(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      o.join(c, Seq("custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("total_price"))
        .orderBy(col("c_mktsegment"))
    }),
    "salted_hot" -> ((s, dir) => {
      val o = T(s, dir, "orders")
        .select(col("o_custkey").as("custkey"), col("o_totalprice"))
      val c = T(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
      Skew.hotSaltedJoin(o, c, "custkey", buckets = 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("total_price"))
        .orderBy(col("c_mktsegment"))
    })
  )

  /** The self-seeded corpus of q_containment_dedup / q_containment_stats:
    * documents plus truncated 15-token prefixes of the first 40 docs.
    */
  private def seededDocs(s: SparkSession, dir: String): DataFrame = {
    val d = T(s, dir, "documents")
    val toks = split(trim(lower(col("text"))), "\\s+")
    d.select(col("doc_id"), col("text")).unionByName(
      d.filter(col("doc_id") < 40 && size(toks) >= 18)
        .select((-col("doc_id") - 1).as("doc_id"),
          array_join(slice(toks, 1, 15), " ").as("text")))
  }

  /** q_m2_smote's prepared modeling frame (label, features) — one full
    * prep-pipeline transform pass over lineitem.
    */
  private def preppedM2(s: SparkSession, dir: String): DataFrame = {
    val featureCols =
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val df = T(s, dir, "lineitem").select(
      when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("label"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"))
    val prep = graft.ml.ModelCache.fitted(s, dir, "PREP:full")(
      graft.ml.PrepPipeline.fit(df, featureCols))
      .asInstanceOf[org.apache.spark.ml.PipelineModel]
    prep.transform(df)
      .select(col("label"), col(graft.ml.PrepPipeline.FeaturesCol))
  }

  private def piiBody(s: SparkSession, dir: String, order: Boolean,
      counts: Boolean, scrub: Boolean): DataFrame = {
    val docs = T(s, dir, "documents")
    val seeded = when(col("doc_id") % 10 === 0,
      concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@example.com or call +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .otherwise(col("text"))
    val base = docs.select(col("doc_id"), seeded.as("__t"))
    val cols = Seq(col("doc_id")) ++
      (if (counts) Seq(
        TextStats.emailCount(col("__t")).cast("long").as("n_emails"),
        TextStats.phoneCount(col("__t")).cast("long").as("n_phones"))
       else Nil) ++
      (if (scrub) Seq(md5(TextStats.scrubPii(col("__t")).cast("binary"))
        .as("scrub_digest"))
       else Seq(length(col("__t")).as("len")))
    val sel = base.select(cols: _*)
    if (order) sel.orderBy(col("doc_id")) else sel
  }

  def main(args: Array[String]): Unit = {
    val pattern = args.headOption.getOrElse(".*").r
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt.max(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_PROFILE=cluster: probe under clusterDefaults() (same
    // contract as Bench/Verify) — this is how the recorded "flips at
    // cluster scale" claims get their measurement instead of staying
    // prose: 2000 shuffle partitions AQE-coalesces down from, skew join
    // on, Kryo, 64 MiB broadcast.
    val cluster = sys.env.get("SPARK_GRAFT_PROFILE").contains("cluster")
    val base0 =
      SparkSession.builder().master(s"local[$cpus]").appName("graft-probe")
    val spark = (if (cluster)
        GraftSession.benchScratch(GraftSession.clusterDefaults(base0))
      else GraftSession.benchScratch(GraftSession.configure(base0))
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    GraftSession.tuneScanSplits(spark)
    spark.sparkContext.setLogLevel("ERROR")
    // PROBE_SPLIT=0: undo the session's scan-split tuning, for A/Bs of
    // the pre-round-12 split behavior (4 MiB openCost, default
    // minPartitionNum — tiny compressed files land in one CPU task)
    if (sys.env.get("PROBE_SPLIT").contains("0")) {
      spark.conf.set("spark.sql.files.openCostInBytes", 4194304L)
      spark.conf.unset("spark.sql.files.minPartitionNum")
    }
    val fmt = new java.text.DecimalFormat("0.###")
    variants.toSeq.sortBy(_._1)
      .filter(v => pattern.findFirstIn(v._1).isDefined)
      .foreach { case (name, fn) =>
        try {
          // PROBE_EXPLAIN=1: print the formatted plan instead of timing —
          // lets rejected-candidate variants pin their plan shape into
          // the committed evidence dumps without a bench run.
          if (sys.env.get("PROBE_EXPLAIN").contains("1")) {
            println(s"\n========== $name ==========")
            fn(spark, dir).explain("formatted")
          } else if (name.endsWith("_diff")) {
            println(s"$name: " + fn(spark, dir).collect().mkString(" "))
          } else {
            System.gc()
            fn(spark, dir).write.format("noop").mode("overwrite").save()
            val xs = (1 to reps).map { _ =>
              System.gc()
              val t0 = System.nanoTime()
              fn(spark, dir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            }
            println(s"$name: reps=[" + xs.map(fmt.format).mkString(", ") +
              s"] min=${fmt.format(xs.min)}")
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            println(s"$name: FAILED ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
