package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-13 gate: stateful streaming queries must survive a MID-BATCH
  * process SIGKILL and recover from their checkpoint byte-identically.
  *
  * ExecutorLossCheck covers batch shuffle recovery; st13 covers planned
  * stop/resume. [[StreamCrashCheck]] closes the remaining axis —
  * exactly-once through state-store recovery: a child JVM running each
  * stateful shape (mapGroupsWithState, append-mode session windows,
  * dedup-within-watermark, foreachBatch CDC upsert, watermark-closed
  * tumbling windows) is SIGKILLed while a micro-batch is in flight
  * (proven from the checkpoint: offsets ahead of commits), restarted
  * against the same checkpoint, and its converged result pinned exactly
  * equal to an undisturbed run's.
  *
  * Subprocess launch (via the check's own child protocol) because the
  * kill target must be a whole JVM, not a thread.
  */
class StreamCrashSpec extends AnyFunSuite {

  test("5 stateful shapes: SIGKILL mid-micro-batch, checkpoint recovery byte-identical") {
    val r = GateLauncher.run("graft.StreamCrashCheck",
      Seq("/root/testdata/sf0.001"), "stream_crash_parity")
    assert(r.line.contains("\"mismatched\":[]"), r.line)
    assert(r.line.contains("\"failed\":[]"), r.line)
    assert(r.line.contains("\"not_mid_batch\":[]"),
      s"a kill missed the in-flight batch: ${r.line}")
    assert(r.line.contains(s""""matched":${StreamCrashCheck.Suite.size}"""), r.line)
  }
}
