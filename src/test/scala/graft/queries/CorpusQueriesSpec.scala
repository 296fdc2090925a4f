package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.TextStats

/** Edge-case hardening for the batch-assembly/retrieval operators: the
  * oracle gate proves them right on the synthetic corpus; these pin the
  * boundary behaviors the corpus never exercises (empty inputs, constant
  * vectors, sub-window documents).
  */
class CorpusQueriesSpec extends SparkSpec {

  import spark.implicits._

  test("quantize: constant vector takes the zero-scale branch, code 0") {
    val df = Seq((1L, Array(0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val mn = array_min(col("embedding")).cast("double")
    val mx = array_max(col("embedding")).cast("double")
    val codes = transform(col("embedding"), x =>
      when(mx === mn, lit(0))
        .otherwise(round((x.cast("double") - mn) /
          ((mx - mn) / lit(255.0))).cast("int")))
    val out = df.select(codes.as("codes")).head().getSeq[Int](0)
    assert(out === Seq(0, 0, 0))
  }

  test("packing: a doc longer than the context window still lands in " +
      "exactly one bin (the one where its first token falls)") {
    // 3 docs on one shard: 600 tokens (straddles bin 0->1), then 10, 10
    val docs = Seq((0L, 600L), (8L, 10L), (16L, 10L)).toDF("doc_id", "toks")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(0)).orderBy(col("doc_id"))
    val binned = docs
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("bin",
        floor((col("cum") - col("toks")).cast("double") / lit(512.0))
          .cast("long"))
    val bins = binned.select(col("doc_id"), col("bin")).as[(Long, Long)]
      .collect().toMap
    assert(bins === Map(0L -> 0L, 8L -> 1L, 16L -> 1L))
  }

  test("BM25 query registry entry yields empty (not error) when no doc " +
      "matches, and tokenizer agrees with TextStats") {
    val docs = Seq((1L, "zz yy xx")).toDF("doc_id", "text")
    val matched = docs
      .select(col("doc_id"),
        explode(TextStats.tokens(lower(col("text")))).as("tok"))
      .filter(col("tok").isin("spark", "join", "window"))
    assert(matched.count() === 0)
  }

  test("registered corpus queries run on sf0.001 and stay non-degenerate") {
    // packing covers every doc exactly once; mixture keeps <= total;
    // upsert actions partition the merged keyspace
    val dir = sf0001
    val packed = graft.SparkEntry.queries("q_seq_packing")(spark, dir)
    val nDocs = graft.core.Tables.load(spark, dir, "documents").count()
    assert(packed.agg(sum("n_docs")).head().getLong(0) === nDocs)
    val mix = graft.SparkEntry.queries("q_mixture_resample")(spark, dir)
      .agg(sum("kept_docs").as("k"), sum("n_docs").as("n")).head()
    assert(mix.getLong(0) > 0 && mix.getLong(0) <= mix.getLong(1))
    val up = graft.SparkEntry.queries("q_corpus_upsert")(spark, dir)
      .select("action", "n_rows").as[(String, Long)].collect().toMap
    assert(up.keySet === Set("keep", "insert", "update"))
    assert(up("insert") === 20)
  }

  test("centroid classify: purity is high on the labeled clusters " +
      "(diagonal dominates the confusion)") {
    val conf = graft.SparkEntry.queries("q_centroid_classify")(spark, sf0001)
      .select(col("label").cast("long"), col("predicted").cast("long"),
        col("n"))
      .as[(Long, Long, Long)].collect()
    val total = conf.map(_._3).sum
    val diag = conf.filter(c => c._1 == c._2).map(_._3).sum
    val labels = conf.map(_._1).distinct.length
    // the synthetic label<->embedding association is weak (measured
    // purity 0.374 at sf0.001 over 10 labels); the assertion is that the
    // centroids recover it at >= 3x the 1/|labels| random baseline, not
    // that the fixture is cleanly separable
    assert(diag.toDouble / total >= 3.0 / labels,
      s"diagonal $diag of $total over $labels labels — centroid " +
        "assignment should beat the random baseline 3x")
  }
}
