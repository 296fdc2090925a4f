package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.etl.Preprocess

/** Schema evolution at the storage layer: a corpus written over time
  * gains columns (new metadata fields) and must stay readable as ONE
  * table — the physical-layout counterpart of the reference's
  * heterogeneous union (U2, notebook cells 33-37).
  */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  test("mergeSchema unifies generations; conform pins the serving view") {
    val dir = Files.createTempDirectory("graft-schema-evo").toString
    // generation 1: (doc_id, text)
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/gen=1")
    // generation 2: adds lang + quality
    Seq((3L, "gamma", "en", 0.9), (4L, "delta", "fr", 0.4))
      .toDF("doc_id", "text", "lang", "quality")
      .write.parquet(s"$dir/gen=2")

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ===
      Set("doc_id", "text", "lang", "quality", "gen"))
    assert(merged.count() === 4)
    // old-generation rows surface the new columns as nulls
    assert(merged.filter(col("gen") === 1 && col("lang").isNull)
      .count() === 2)

    // the serving view conforms every generation to one declared schema
    // (tolerant: missing columns null-filled, types cast) — P8 applied
    // to storage evolution
    val serving = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("quality", DoubleType),
      StructField("source", StringType))) // never written: null-filled
    val conformed = Preprocess.conform(merged, serving)
    assert(conformed.schema.fields.map(f => f.name -> f.dataType).toSeq ===
      serving.fields.map(f => f.name -> f.dataType).toSeq)
    assert(conformed.filter(col("source").isNotNull).count() === 0)
    assert(conformed.filter(col("quality").isNotNull).count() === 2)
  }
}
