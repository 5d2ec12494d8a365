package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 gate: results must be invariant between codegen'd and
  * INTERPRETED execution.
  *
  * Every custom Expression with a `doGenCode` (VectorDot, Hash60,
  * PointInPoly, NfcNormalize) is two implementations of one semantics,
  * and Spark's own builtins have the same duality; codegen fallbacks
  * (wide schemas, huge methods) make the interpreted path a production
  * path at scale. [[InterpCheck]] runs the expression-risk suite under
  * `spark.sql.codegen.factoryMode=NO_CODEGEN` + `wholeStage=false` and
  * pins exact fingerprint parity with the compiled run, proving the
  * regime flip via the `*(n)` markers in the executed flagship plan.
  * The full-surface runs (interp 227/227, AQE-off 227/227 via the
  * `noaqe` mode) are the recorded audits in BENCH_NOTES; this spec
  * keeps the quick subset green in CI.
  */
class InterpSpec extends AnyFunSuite {

  test("expression-risk suite: interpreted == codegen, byte-identical, regime proven") {
    val r = GateLauncher.run("graft.InterpCheck",
      Seq("/root/testdata/sf0.001", "quick"), "interp_parity")
    assert(r.line.contains("\"mismatched\":[]"), r.line)
    assert(r.line.contains("\"failed\":[]"), r.line)
    assert(r.line.contains("\"regime_ok\":true"), r.line)
  }
}
