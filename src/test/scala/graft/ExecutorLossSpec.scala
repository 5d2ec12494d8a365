package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 gate: results must survive EXECUTOR LOSS byte-identically.
  *
  * RetryCheck (round 11) covers task-level failures; this covers the
  * harder path — an executor JVM SIGKILLed mid-query takes its shuffle
  * map outputs with it (no external shuffle service), so reducers hit
  * FetchFailed, the DAGScheduler resubmits the lost map partitions, and
  * the standalone worker relaunches a replacement executor that
  * re-registers from scratch. [[ExecutorLossCheck]] choreographs exactly
  * one kill per query (after a stage has completed, so the victim owns
  * outputs someone needs) over a 5-query multi-stage suite and pins
  * exact fingerprint parity with the undisturbed run; the gate fails if
  * no kill landed or the loss was never felt (no lost task AND no
  * resubmitted stage).
  *
  * Subprocess for the usual one-context-per-JVM reason — and because
  * the killer must see the executor backends as ITS process descendants.
  */
class ExecutorLossSpec extends AnyFunSuite {

  test("5-query suite: executor SIGKILL mid-query, results byte-identical") {
    val r = GateLauncher.run("graft.ExecutorLossCheck",
      Seq("/root/testdata/sf0.01"), "executor_loss_parity")
    assert(r.line.contains("\"mismatched\":[]"), r.line)
    assert(r.line.contains("\"failed\":[]"), r.line)
    assert(r.line.contains(s""""matched":${ExecutorLossCheck.Suite.size}"""), r.line)
    assert(!r.line.contains("\"kills\":0,"), s"no executor was killed: ${r.line}")
  }
}
