package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.RollingFingerprint.rolling_fingerprint

class RollingFingerprintSpec extends SparkSpec {

  import spark.implicits._

  test("codegen and interpreted paths agree") {
    val texts = Seq("", "a", "short", "the quick brown fox " * 10)
    val viaPlan = texts.toDF("t")
      .select(rolling_fingerprint(col("t"))).collect().map(_.getLong(0))
    val viaEval = texts.map(t =>
      RollingFingerprint(
        org.apache.spark.sql.GraftColumnBridge.expression(lit(t)))
        .nullSafeEval(UTF8String.fromString(t)).asInstanceOf[Long])
    assert(viaPlan.toSeq === viaEval)
  }

  test("equal text ⇒ equal fingerprint; different text ⇒ different") {
    val df = Seq((1L, "identical document body"),
      (2L, "identical document body"),
      (3L, "a completely unrelated piece of text")).toDF("id", "t")
    val fps = df.select(col("id"), rolling_fingerprint(col("t")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("documents sharing bulk content usually share the min window") {
    val core = "the shared central passage of this document is long enough " +
      "to dominate the minimum rolling window hash selection process"
    val df = Seq((1L, s"prefix one $core"), (2L, s"$core suffix two"))
      .toDF("id", "t")
    val fps = df.select(rolling_fingerprint(col("t"))).collect()
      .map(_.getLong(0))
    assert(fps(0) === fps(1))
  }

  test("null input yields null") {
    val df = Seq[Option[String]](None, Some("x")).toDF("t")
    val got = df.select(rolling_fingerprint(col("t"))).collect()
    assert(got(0).isNullAt(0))
    assert(!got(1).isNullAt(0))
  }
}
