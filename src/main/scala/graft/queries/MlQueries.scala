package graft.queries

import org.apache.spark.ml.feature.StringIndexer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, QueryModule, Tables}

/** ML-pipeline queries (SURVEY §2.8-2.9). Queries whose semantics are
  * SQL-expressible carry a DuckDB oracle (label encoding); trainer/metric
  * queries over model output are registered rows-only and asserted in
  * ScalaTest (score bounds, determinism under seed).
  */
object MlQueries extends QueryModule {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  def defs: Map[String, QueryDef] = Map(

    "q_f5_label_encode" -> QueryDef(
      (s, dir) => {
        // F5: StringIndexer with frequencyDesc ordering — ties broken
        // alphabetically (documented), which the oracle mirrors with
        // ROW_NUMBER OVER (ORDER BY cnt DESC, lang ASC).
        val docs = T(s, dir, "documents")
        val model = new StringIndexer()
          .setInputCol("lang").setOutputCol("lang_code")
          .setStringOrderType("frequencyDesc")
          .fit(docs)
        val mapping = model.labelsArray(0).zipWithIndex.toSeq
        s.createDataFrame(mapping).toDF("lang", "code_raw")
          .select(col("lang"), col("code_raw").cast(IntegerType).as("code"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang,
             | CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, lang ASC) - 1 AS INTEGER) AS code
             | FROM (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang) t
             | ORDER BY lang""".stripMargin),
      "F5: label encoding via StringIndexer (notebook cell 23)")
  )
}
