package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.ml.param.{IntParam, LongParam, Param, ParamMap}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable,
  Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** M2 — SMOTE minority-class rebalancing as a custom spark.ml Transformer
  * (the one genuinely novel distributed component, SURVEY §7.3/7.4;
  * reference /root/reference/src/train.py:70-71 `SMOTE(random_state=42)`).
  *
  * Two strategies:
  *   - "oversample": exact-count duplication of minority rows (cheap
  *     fallback; no vector math).
  *   - "smote": true SMOTE semantics — each synthetic sample interpolates
  *     between a minority row and one of its k nearest minority neighbors.
  *
  * Neighborhood search is a sorted-projection scheme rather than a pair
  * join: project every minority vector onto a deterministic random unit
  * direction, slab-partition the projection axis, sort within slabs, and
  * take the k window-adjacent rows (lag/lead) as the neighborhood.
  * Projection-adjacent ⇒ near in feature space (Johnson-Lindenstrauss
  * flavored); quality is approximate exactly like LSH-kNN, but the cost is
  * one narrow shuffle + per-slab sort — strictly linear, no candidate-pair
  * blowup, parallel windows (an all-bucket LSH self-join is quadratic
  * within buckets and stalls already at 10⁵ minority rows).
  *
  * Determinism: no RNG state — the projection direction, per-row synthetic
  * copy counts, neighbor choice and interpolation coefficient all derive
  * from xxhash64/seeded arithmetic, so two runs on identical data produce
  * identical output (asserted in SmoteSpec).
  *
  * Output schema is (labelCol, featuresCol): like the reference, SMOTE
  * operates on the modeling matrix, not the raw table.
  */
class Smote(override val uid: String) extends Transformer
    with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("smote"))

  val labelCol = new Param[String](this, "labelCol", "label column")
  val featuresCol = new Param[String](this, "featuresCol", "features column")
  val seed = new LongParam(this, "seed", "determinism seed")
  val k = new IntParam(this, "k", "neighborhood size for interpolation")
  val strategy = new Param[String](this, "strategy", "oversample | smote")

  setDefault(labelCol -> "label", featuresCol -> PrepPipeline.FeaturesCol,
    seed -> 42L, k -> 5, strategy -> "smote")

  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setK(v: Int): this.type = set(k, v)
  def setStrategy(v: String): this.type = set(strategy, v)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema.filter(f =>
      f.name == $(labelCol) || f.name == $(featuresCol)))

  override def copy(extra: ParamMap): Smote = defaultCopy(extra)

  /** Slab width along the unit projection; features are standardized
    * upstream so the projection is ~N(0,1) and 0.25 keeps slabs populated
    * yet local.
    */
  private val SlabWidth = 0.25

  override def transform(ds: Dataset[_]): DataFrame = {
    val lc = $(labelCol); val fc = $(featuresCol)
    val df = ds.toDF.select(col(lc), col(fc))
    // class histogram is |classes| rows — driver-side collect is exact
    // and cheap at any scale. The per-class sample vector rides along so
    // the feature dimension comes out of the SAME pass (round-9: a
    // separate head() action re-executed the whole upstream prep
    // transform once more per call — measurable when the input is an
    // unpersisted pipeline output).
    val stats = df.groupBy(col(lc))
      .agg(count(lit(1)).as("__n"), first(col(fc)).as("__sample"))
      .collect()
    val counts = stats.map(r => (r.get(0), r.getLong(1)))
    if (counts.length < 2) return df
    val (_, majCount) = counts.maxBy(_._2)
    val (minLabel, minCount) = counts.minBy(_._2)
    val deficit = majCount - minCount
    if (deficit == 0) return df

    val minority = df.filter(col(lc) === lit(minLabel))

    // deterministic unit projection direction from the seed
    val dim = stats.head.getAs[Vector]("__sample").size
    val rng = new scala.util.Random($(seed))
    val raw = Array.fill(dim)(rng.nextGaussian())
    val nrm = math.sqrt(raw.map(x => x * x).sum)
    val u = raw.map(_ / nrm)
    val proj = aggregate(
      zip_with(vector_to_array(col(fc)),
        lit(u), (x, w) => x * w),
      lit(0.0d), (acc, v) => acc + v)

    // localCheckpoint: the slab frame is read TWICE (the offsets collect
    // below and the synthesis job) and its lineage contains the entire
    // upstream prep transform — without truncation each reader
    // re-executes that transform (round-9 profiling: 4 full upstream
    // passes per SMOTE call; 2 after this + the fused stats pass above).
    // Minority-class rows only, so the materialization is the small side
    // by construction.
    val slabbed = minority
      .withColumn("__proj", proj)
      .withColumn("__slab", floor(col("__proj") / SlabWidth))
      .localCheckpoint()
    // slab sizes: tiny driver-side frame → global sid = slab offset + rank,
    // attached via a broadcast join (stays cheap at any slab count)
    val slabSizes = slabbed.groupBy("__slab").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = slabSizes.scanLeft(0L)(_ + _._2).zip(slabSizes)
      .map { case (off, (slab, _)) => (slab, off) }
    val offDf = broadcast(
      ds.sparkSession.createDataFrame(offsets.toSeq)
        .toDF("__slab", "__off"))

    val w = Window.partitionBy(col("__slab"))
      .orderBy(col("__proj"), xxhash64(col(fc).cast("string")))
    val kk = $(k)
    val indexed = slabbed.join(offDf, Seq("__slab"))
      .withColumn("__sid", row_number().over(w) + col("__off"))
    // the k lag/lead vector neighborhoods are only consumed by the
    // interpolating strategy — "oversample" duplicates rows verbatim, so
    // skip shipping k extra vectors per row through the window there
    val ranked = ($(strategy) match {
      case "smote" =>
        // exactly k candidates: alternate lag/lead then truncate (odd k
        // would otherwise yield k+1 — one farther neighbor than asked)
        val neighborCols = (1 to (kk + 1) / 2).flatMap(i =>
          Seq(lag(col(fc), i).over(w), lead(col(fc), i).over(w)))
          .take(kk)
        indexed.withColumn("__nbs",
          filter(array(neighborCols: _*), x => x.isNotNull))
      case _ => indexed
    }).drop("__proj", "__slab", "__off")

    // deterministic per-row synthetic copy counts: spread the deficit
    // round-robin (base copies for all, +1 for the first `rem` sids)
    val base = deficit / minCount
    val rem = deficit % minCount
    val expanded = ranked
      .withColumn("__copies",
        lit(base) + when(col("__sid") <= rem, 1L).otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("__ci", explode(sequence(lit(1L), col("__copies"))))

    val synth = $(strategy) match {
      case "oversample" => expanded.select(col(lc), col(fc))
      case "smote" =>
        // neighbor pick + interpolation coefficient, both hash-derived
        expanded
          .withColumn("__nb", when(size(col("__nbs")) > 0,
            element_at(col("__nbs"),
              (pmod(xxhash64(col("__sid"), col("__ci"), lit($(seed))),
                size(col("__nbs"))) + 1).cast("int"))))
          .withColumn("__t",
            pmod(xxhash64(col("__ci"), col("__sid"), lit($(seed))),
              lit(1000000L)).cast("double") / 1000000.0)
          .select(col(lc),
            when(col("__nb").isNull, col(fc))
              .otherwise(Smote.lerpUdf(col(fc), col("__nb"), col("__t")))
              .as(fc))
      case other =>
        throw new IllegalArgumentException(s"unknown strategy: $other")
    }
    df.unionByName(synth.select(col(lc), col(fc)))
  }
}

object Smote extends DefaultParamsReadable[Smote] {
  /** synthetic = a + t·(b − a), elementwise. */
  private[ml] val lerpUdf =
    udf((a: Vector, b: Vector, t: Double) => {
      val av = a.toArray; val bv = b.toArray
      val out = new Array[Double](av.length)
      var i = 0
      while (i < av.length) { out(i) = av(i) + t * (bv(i) - av(i)); i += 1 }
      Vectors.dense(out): Vector
    })
}
