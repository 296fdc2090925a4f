package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Gate on the oracle SQL itself, not just its answers: every registered
  * oracle must bind in DuckDB AND produce an output schema the driver's
  * pandas-based harness can hash against a Spark parquet dump.
  *
  * The bug class this kills: DuckDB types `SUM(BIGINT)` as HUGEINT
  * (int128); pandas renders that float64 ("1.4e+11") while Spark emits
  * int64 ("143984402176"), so the driver's value-hash diverges even when
  * the answers are identical. It shipped twice (q_q12 round 3,
  * q_interval_union round 5) because nothing linted new oracles. Now
  * `tools/lint_oracles.py` DESCRIBEs all oracles (bind-only, no
  * execution, ~seconds) and this spec fails the build on any offender.
  *
  * Skips (ScalaTest `assume`) when python3/duckdb are unavailable, so the
  * library build does not hard-depend on the driver-side toolchain.
  */
class OracleLintSpec extends AnyFunSuite {

  test("no oracle output column types as HUGEINT / DECIMAL(>18)") {
    val py = new ProcessBuilder("python3", "-c", "import duckdb")
      .redirectErrorStream(true).start()
    assume(py.waitFor() == 0, "python3+duckdb not available; lint skipped")

    val json = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(json, Verify.oracleJson)
    val lint = new ProcessBuilder(
      "python3", "tools/lint_oracles.py", json.toString,
      "/root/testdata/sf0.001").redirectErrorStream(true).start()
    val out = new String(lint.getInputStream.readAllBytes())
    val code = lint.waitFor()
    Files.deleteIfExists(json)
    assert(code == 0, s"oracle lint failed:\n$out")
  }
}
