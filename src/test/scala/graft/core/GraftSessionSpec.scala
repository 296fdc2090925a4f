package graft.core

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {

  test("canonical session invariants hold (timezone, AQE, nanos)") {
    val spark = GraftSession.local(2, "graft-session-spec")
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    assert(
      spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "true")
  }

  test("clusterDefaults composes on any builder without clobbering") {
    // getOrCreate on a shared JVM returns the existing session, so only
    // the builder composition itself is assertable here; the applied
    // values are covered by the canonical invariants above
    val b = GraftSession.clusterDefaults(SparkSession.builder())
    assert(b != null)
  }
}
