package graft

import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-side twin of [[OutputContractSpec]] (VERDICT r16 #2): the
  * Spark-side type contract was gated in round 14, but round 15 still
  * shipped two oracles whose window-SUM columns silently widened to
  * HUGEINT in DuckDB (`compaction_plan.bin_id`, `yuen_test.n0/n1`) —
  * bit-green on local replay, hash-red in the driver, because the
  * Python value CLASS DuckDB fetches for HUGEINT differs from the
  * parquet int64 fetch. `scripts/oracle_type_gate.py` DESCRIBEs every
  * registered oracle in DuckDB and fails on any output column outside
  * the driver-stable set; this spec makes `sbt test` run it, so the
  * failure class reds out BEFORE the driver artifact, not after.
  *
  * DuckDB lives in the container's driver-side python (a verification
  * tool only — never a library dependency); if that toolchain is
  * absent the test CANCELS loudly rather than passing vacuously.
  * DESCRIBE is analysis-only, so the whole 400+-query registry gates
  * in seconds against the smallest scale factor.
  */
class OracleTypeGateSpec extends AnyFunSuite {

  private val script = "scripts/oracle_type_gate.py"

  private def gate(json: String): (Int, String) = {
    val f = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(f, json)
    val err = new StringBuilder
    val out = new StringBuilder
    val code = Seq("python3", script, f.toString, "/root/testdata/sf0.001")
      .!(ProcessLogger(out.append(_).append('\n'), err.append(_).append('\n')))
    Files.deleteIfExists(f)
    (code, out.toString + err.toString)
  }

  private lazy val toolchain: Boolean =
    Files.exists(Paths.get(script)) &&
      (Seq("python3", "-c", "import duckdb").! == 0)

  test("every registered oracle DESCRIBEs to driver-stable DuckDB types") {
    assume(toolchain, "python3+duckdb verification toolchain unavailable")
    val (code, log) = gate(Verify.oracleJson)
    assert(code == 0, s"oracle_type_gate.py failed:\n$log")
  }

  test("a planted un-CAST window SUM (HUGEINT) reds the gate") {
    assume(toolchain, "python3+duckdb verification toolchain unavailable")
    val planted =
      """{"planted_hugeint": "SELECT l_orderkey, SUM(l_orderkey) OVER () AS s FROM lineitem"}"""
    val (code, log) = gate(planted)
    assert(code != 0, "gate must reject an un-CAST window SUM")
    assert(log.contains("TYPE-GATE FAIL planted_hugeint.s"),
      s"expected a named offender line, got:\n$log")
  }
}
