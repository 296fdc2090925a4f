package graft.etl

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** P1/P2/P4/P5/P7/P8 on a CICIDS-shaped fixture: leading-space headers,
  * ±inf rate columns, BENIGN labels (mirrors reference
  * preprocess.py:60-90 semantics).
  */
class PreprocessSpec extends SparkSpec {

  private def fixture = {
    val schema = StructType(Seq(
      StructField(" Flow Duration", DoubleType),
      StructField("Flow Bytes/s", DoubleType),
      StructField(" Label", StringType)))
    val rows = Seq(
      Row(1.0, Double.PositiveInfinity, "BENIGN"),
      Row(2.0, 5.5, "DDoS"),
      Row(3.0, Double.NegativeInfinity, "BENIGN"),
      Row(4.0, Double.NaN, "PortScan"),
      Row(4.0, Double.NaN, "PortScan"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
  }

  test("P1 trimHeaders strips leading/trailing whitespace") {
    val df = Preprocess.trimHeaders(fixture)
    assert(df.columns.toSeq ===
      Seq("Flow Duration", "Flow Bytes/s", "Label"))
  }

  test("P4 deriveLabel maps benign to 1, attack to 0") {
    val df = Preprocess.deriveLabel(
      Preprocess.trimHeaders(fixture), "Label", "BENIGN", "state")
    val got = df.groupBy("state").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === Map(1 -> 2, 0 -> 3))
  }

  test("P5 infToNull nulls +inf, -inf and NaN, keeps finite values") {
    val df = Preprocess.trimHeaders(fixture)
    val cleaned = Preprocess.infToNull(df, Seq("Flow Bytes/s"))
    val vals = cleaned.select("Flow Bytes/s").collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(vals.count(_.isEmpty) === 4)
    assert(vals.flatten.toSeq === Seq(5.5))
  }

  test("P2 dropTolerant ignores missing columns") {
    val df = Preprocess.trimHeaders(fixture)
    val out = Preprocess.dropTolerant(df, Seq("Label", "no_such_col"))
    assert(out.columns.toSeq === Seq("Flow Duration", "Flow Bytes/s"))
  }

  test("P8 conform keeps/casts matching cols, null-fills missing, orders") {
    val target = StructType(Seq(
      StructField("Flow Duration", StringType),
      StructField("Missing Feature", DoubleType)))
    val out = Preprocess.conform(Preprocess.trimHeaders(fixture), target)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq === Seq(
      ("Flow Duration", StringType), ("Missing Feature", DoubleType)))
    val first = out.orderBy("Flow Duration").head()
    assert(first.getString(0) === "1.0" && first.isNullAt(1))
  }

  test("P7 duplicateRows finds only repeated full rows") {
    val dups = Preprocess.duplicateRows(Preprocess.trimHeaders(fixture))
      .collect()
    assert(dups.length === 1)
    assert(dups.head.getLong(dups.head.length - 1) === 2L)
  }

  test("A1/A2/A3 column stats over fixture") {
    val df = Preprocess.trimHeaders(fixture)
    val nulls = ColumnStats.nullCounts(
      Preprocess.infToNull(df, Seq("Flow Bytes/s")), Seq("Flow Bytes/s"))
      .head().getLong(0)
    assert(nulls === 4)
    val distinct = ColumnStats.distinctCounts(df, Seq("Label"))
      .head().getLong(0)
    assert(distinct === 3)
    // BENIGN and PortScan both occur twice: deterministic tie-break picks
    // the smaller value
    val m = ColumnStats.modeOf(df, "Label").head()
    assert(m.getString(0) === "BENIGN")
  }
}
