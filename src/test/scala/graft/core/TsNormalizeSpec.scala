package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The timestamp-unit normalization contract (Tables.tsToMicrosSql):
  * whatever unit a testdata generation stores (s/ms/µs/ns), the loaded
  * `ts` is canonical microseconds. The unit has already changed once
  * between driver data drops — this pins the guard that absorbed it.
  */
class TsNormalizeSpec extends SparkSpec {

  private val instantUs = 1704067798778549L // 2024-01-01T00:09:58.778549

  test("magnitude ladder maps s/ms/us/ns representations to micros") {
    import spark.implicits._
    val raw = Seq(
      instantUs / 1000000L,       // seconds (fractional part floors away)
      instantUs / 1000L,          // millis
      instantUs,                  // micros
      instantUs * 1000L)          // nanos
    val out = raw.toDF("ts")
      .select(expr(Tables.tsToMicrosSql).as("us"))
      .collect().map(_.getLong(0))
    assert(out(2) === instantUs)
    assert(out(3) === instantUs)
    assert(out(1) === instantUs / 1000L * 1000L)
    assert(out(0) === instantUs / 1000000L * 1000000L)
  }

  test("era guard: in-era values pass, out-of-ladder instants fail " +
      "loudly instead of normalizing 1000x wrong") {
    import spark.implicits._
    val ok = Seq(instantUs, instantUs * 1000L, instantUs / 1000L).toDF("ts")
      .select(expr(Tables.tsToMicrosGuardedSql).as("us"))
      .collect().map(_.getLong(0))
    assert(ok.forall(u => u >= Tables.tsEraLoUs && u <= Tables.tsEraHiUs))
    // null passes through
    assert(Seq(Option.empty[Long]).toDF("ts")
      .select(expr(Tables.tsToMicrosGuardedSql)).head().isNullAt(0))
    // a 1971 µs instant falls in the ladder's seconds band -> year 33k
    // after rescale -> must raise, not silently corrupt
    val e = intercept[Exception] {
      Seq(31536000000000L).toDF("ts")
        .select(expr(Tables.tsToMicrosGuardedSql)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("normalizes outside the 1990-2100 era")),
      msgs(e).mkString(" | "))
  }

  test("loaded events.ts is micros and event_time lands in the data era") {
    val ev = Tables.load(spark, sf0001, "events")
    val r = ev.agg(min(col("ts")), max(col("ts")),
      min(col("event_time")).cast("string")).head()
    // 2001-09-09 .. 2286-11-20 in µs — any unit slip lands outside
    assert(r.getLong(0) > 1000000000000000L && r.getLong(1) < 10000000000000000L)
    assert(r.getString(2).startsWith("20"))
  }
}
