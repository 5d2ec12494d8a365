package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 gate: results must be invariant under FORCED SPILLING.
  *
  * At 100 TB the spill path is the common path, but on the fixtures
  * every sort/window/SMJ/aggregate fits in memory, so the disk-backed
  * merge code (UnsafeExternalSorter spills, ExternalAppendOnlyUnsafeRow-
  * Array, hash-agg sort-based fallback) had never executed in any gate.
  * [[SpillCheck]] flips Spark's public row-count spill thresholds so
  * that machinery engages after a few hundred rows, runs a 15-query
  * spill-prone suite, and pins each order-independent exact fingerprint
  * equal to the normal-session run — and requires the task-metrics
  * spill counter to be nonzero, so a renamed threshold can't silently
  * turn the gate into a no-op.
  */
class SpillSpec extends AnyFunSuite {

  test("15-query spill surface: forced-spill == in-memory, byte-identical, spills real") {
    val r = GateLauncher.run("graft.SpillCheck",
      Seq("/root/testdata/sf0.001"), "spill_parity")
    assert(r.line.contains("\"mismatched\":[]"), r.line)
    assert(r.line.contains("\"failed\":[]"), r.line)
    assert(r.line.contains(s""""matched":${SpillCheck.Suite.size}"""), r.line)
    assert(!r.line.contains("\"spilled_bytes\":0,"), s"no spills recorded: ${r.line}")
  }
}
