package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.text.TextStats

class CorpusLayoutSpec extends SparkSpec {

  test("parquetCorpus: partition pruning + within-file sort round-trip") {
    val docs = Tables.load(spark, sf0001, "documents")
      .withColumn("fp", TextStats.fingerprintMd5(col("text")))
    val out = Files.createTempDirectory("graft-corpus").toString
    Sinks.parquetCorpus(docs, out, partitionCols = Seq("lang"),
      sortCols = Seq("fp"), maxRecordsPerFile = 100000L)

    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    // partition layout: lang=<value> directories exist
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).toSet
    val langs = docs.select("lang").distinct().collect()
      .map(r => s"lang=${r.getString(0)}").toSet
    assert(dirs === langs)
    // a lang predicate becomes a partition filter (no data read for
    // other partitions): the filtered count comes back right
    val one = langs.head.stripPrefix("lang=")
    assert(back.filter(col("lang") === one).count() ===
      docs.filter(col("lang") === one).count())
  }

  test("csvWithBadRecords routes malformed lines to the dead-letter side") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-badcsv")
    val f = dir.resolve("data.csv")
    Files.write(f, java.util.Arrays.asList(
      "id,score",
      "1,10.5",
      "2,not_a_number",
      "3,7.25"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("score", DoubleType)))
    val split =
      Sources.csvWithBadRecords(spark, f.toString, schema, "utf-8")
    try {
      assert(split.good.count() === 2)
      assert(split.good.select(sum("id")).head().getLong(0) === 4L)
      val badLines = split.bad.collect().map(_.getString(0))
      assert(badLines.length === 1)
      assert(badLines.head.contains("not_a_number"))
    } finally split.release()
  }
}
