package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class ZOrderSpec extends SparkSpec {

  test("interleave is the Morton curve: bijective and bit-exact") {
    import spark.implicits._
    val pairs = for (a <- 0L to 7L; b <- 0L to 7L) yield (a, b)
    val got = pairs.toDF("a", "b")
      .withColumn("z", ZOrder.interleave(col("a"), col("b"), bits = 3))
      .as[(Long, Long, Long)].collect()
    def morton(a: Long, b: Long): Long =
      (0 until 3).map(i =>
        (((a >> i) & 1L) << (2 * i + 1)) | (((b >> i) & 1L) << (2 * i)))
        .reduce(_ | _)
    got.foreach { case (a, b, z) => assert(z === morton(a, b), s"($a,$b)") }
    assert(got.map(_._3).distinct.length === pairs.length) // bijective
  }

  test("z-ordered layout narrows per-file spans on BOTH dimensions " +
      "(vs linear sort, which only helps the leading one)") {
    val events = Tables.load(spark, sf0001, "events")
      .select(col("user_id"), col("value"))
    val nFiles = 8

    def spans(path: String): (Double, Double) = {
      // mean per-file fraction of the global span, per dimension —
      // the file-skipping proxy: a filter on a dimension reads only
      // files whose [min,max] intersects it
      val byFile = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
          min("value").as("vlo"), max("value").as("vhi"))
      val g = events.agg(
        (max("user_id") - min("user_id")).cast("double").as("uspan"),
        (max("value") - min("value")).as("vspan")).head()
      val rows = byFile.collect()
      val u = rows.map(r => (r.getLong(2) - r.getLong(1)).toDouble)
        .sum / rows.length / g.getDouble(0)
      val v = rows.map(r => r.getDouble(4) - r.getDouble(3))
        .sum / rows.length / g.getDouble(1)
      (u, v)
    }

    val zDir = Files.createTempDirectory("graft-zorder").toString
    ZOrder.writeZOrdered(events, zDir, "user_id", "value", nFiles)
    val (zu, zv) = spans(zDir)

    val linDir = Files.createTempDirectory("graft-linear").toString
    events.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.mode("overwrite").parquet(linDir)
    val (lu, lv) = spans(linDir)

    // linear layout: tight on user_id, near-useless on value (measured
    // 0.77 of the global span at sf0.001/8 files)
    assert(lu < 0.5, s"linear leading-dim span $lu")
    assert(lv > 0.6, s"linear second-dim span $lv")
    // z-order: BOTH dims well under the full span, and the second dim
    // strictly better than the linear layout left it
    assert(zu < 0.6, s"z-order user_id span $zu")
    assert(zv < 0.6, s"z-order value span $zv")
    assert(zv < 0.8 * lv, s"z-order value span $zv !< 0.8 * linear $lv")
  }
}
