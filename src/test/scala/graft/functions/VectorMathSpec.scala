package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.core.GraftExtensions
import graft.sim.Ann

class VectorMathSpec extends SparkSpec {

  import spark.implicits._

  test("native cosine is bit-identical to the zip_with/aggregate HOF form") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-5.0f, 5.0f))
    val pairs = (0 until 40).flatMap { i =>
      for {
        a <- vecGen(Gen.Parameters.default, Seed(i * 2L))
        b <- vecGen(Gen.Parameters.default, Seed(i * 2L + 1))
        if a.exists(_ != 0f) && b.exists(_ != 0f)
      } yield (a.toArray, b.toArray)
    }
    val rows = pairs.toDF("a", "b").select(
      Ann.cosine(col("a"), col("b")),
      Ann.cosineHof(transform(col("a"), _.cast("double")),
        transform(col("b"), _.cast("double"))))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("interpreted eval agrees with codegen") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val viaDf = Seq((a, b)).toDF("a", "b")
      .select(Ann.cosine(col("a"), col("b"))).head().getDouble(0)
    // interpreted path: nullSafeEval via the expression directly
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val expr = CosineSimilarity(
      Literal.create(a, ArrayType(FloatType)),
      Literal.create(b, ArrayType(FloatType)))
    val interp = expr.eval(null).asInstanceOf[Double]
    assert(java.lang.Double.doubleToLongBits(viaDf) ===
      java.lang.Double.doubleToLongBits(interp))
  }

  test("double arrays, identical vectors → 1.0; orthogonal → 0.0") {
    val df = Seq((Array(3.0, 4.0), Array(3.0, 4.0), Array(-4.0, 3.0)))
      .toDF("a", "b", "o")
    val r = df.select(
      Ann.cosine(col("a"), col("b")),
      Ann.cosine(col("a"), col("o"))).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("null input → null; length mismatch → NaN; null element → NaN") {
    val df = Seq((Some(Array(1.0, 2.0)), None: Option[Array[Double]]))
      .toDF("a", "b")
    assert(df.select(Ann.cosine(col("a"), col("b"))).head().isNullAt(0))
    val mm = Seq((Array(1.0, 2.0), Array(1.0, 2.0, 3.0))).toDF("a", "b")
    assert(mm.select(Ann.cosine(col("a"), col("b"))).head()
      .getDouble(0).isNaN)
    val ne = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b")
    assert(ne.select(Ann.cosine(col("a"), col("b"))).head()
      .getDouble(0).isNaN)
  }

  test("native sq_dist_long equals the zip_with/aggregate HOF form " +
      "and survives codegen-off") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1000000L, 1000000L))
    val pairs = (0 until 40).flatMap { i =>
      for {
        a <- vecGen(Gen.Parameters.default, Seed(100 + i * 2L))
        b <- vecGen(Gen.Parameters.default, Seed(101 + i * 2L))
      } yield (a.toArray, b.toArray)
    }
    val df = pairs.toDF("a", "b")
    def check(): Unit = {
      val rows = df.select(
        VectorMath.sq_dist_long(col("a"), col("b")),
        aggregate(zip_with(col("a"), col("b"),
          (x, y) => (x - y) * (x - y)), lit(0L), (acc, x) => acc + x))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    }
    check()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check()
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("registered as a SQL function via GraftExtensions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val d = spark.sql(
      "SELECT sq_dist_long(array(3L, 0L), array(0L, 4L)) AS d")
      .head().getLong(0)
    assert(d === 25L)
  }
}
