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

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val variants: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    // equivalence gates for the candidates (must return [0, 0])
    "pii_diff" -> ((s, dir) => {
      val a = registered("q_pii_scrub")(s, dir)
      val b = variants("pii_sortfirst")(s, dir)
      a.exceptAll(b).agg(count(lit(1)).as("a_minus_b"))
        .crossJoin(b.exceptAll(a).agg(count(lit(1)).as("b_minus_a")))
    }),
    "ngram_diff" -> ((s, dir) => {
      val a = registered("q_ngram_jaccard")(s, dir)
      val b = variants("ngram_grouped")(s, dir)
      a.exceptAll(b).agg(count(lit(1)).as("a_minus_b"))
        .crossJoin(b.exceptAll(a).agg(count(lit(1)).as("b_minus_a")))
    }),
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
    val spark = GraftSession.benchScratch(GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("graft-probe")))
      .config("spark.sql.shuffle.partitions", cpus)
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
          if (name.endsWith("_diff")) {
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
