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

  /** minhash_array has two genuinely separate execution paths —
    * `nullSafeEval` (interpreted) and `doGenCode` (a compiled call into
    * the static helper, including the UnaryExpression null plumbing the
    * generator emits around it). The quick parity gate above covers it
    * end-to-end (dd14/dd2 sit in ClusterCheck.Suite); this test names
    * the expression explicitly and flips both paths in-process,
    * including the null-input branch the end-to-end queries never hit
    * (shingles are non-null by construction). */
  test("minhash_array: interpreted eval == codegen'd projection, incl. null input") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String

    assert(ClusterCheck.Suite.contains("dd14_minhash_production"),
      "the parity suites must keep exercising minhash_array end-to-end")

    val e = graft.functions.MinHashArray(
      BoundReference(0, StringType, nullable = true), 128)
    val codegen = GenerateMutableProjection.generate(Seq(e))
    for (s <- Seq("", "a", "w1 w2", "shingle text é®¬", null)) {
      val row = InternalRow(if (s == null) null else UTF8String.fromString(s))
      val interp = e.eval(row)
      val gen = codegen(row)
      if (s == null) {
        assert(interp == null, "interpreted null input must yield null")
        assert(gen.isNullAt(0), "codegen null input must yield null")
      } else {
        val ia = interp.asInstanceOf[ArrayData].toLongArray()
        val ga = gen.getArray(0).toLongArray()
        assert(ia.sameElements(ga), s"paths diverge for input '$s'")
        assert(ia.length == 128)
      }
    }
  }
}
