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
  *
  * Launched as a subprocess for the same reason as LocalClusterSpec:
  * one JVM holds one SparkContext and the sibling suites share a live
  * session; SpillCheck needs two fresh contexts with different confs.
  */
class SpillSpec extends AnyFunSuite {

  test("15-query spill surface: forced-spill == in-memory, byte-identical, spills real") {
    val javaBin = new java.io.File(
      new java.io.File(sys.props("java.home"), "bin"), "java").getAbsolutePath
    val addOpens = Seq(
      "java.lang", "java.lang.invoke", "java.lang.reflect", "java.io",
      "java.net", "java.nio", "java.util", "java.util.concurrent",
      "java.util.concurrent.atomic", "sun.nio.ch", "sun.nio.cs",
      "sun.security.action", "sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"java.base/$p=ALL-UNNAMED"))
    val cmd = (Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx8g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", sys.props("java.class.path"),
      "graft.SpillCheck", "/root/testdata/sf0.001")).toIndexedSeq

    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File("."))
    // stderr to a file, not a pipe: Spark logs megabytes there, and a
    // full 64K pipe buffer would deadlock the child while this thread
    // blocks reading stdout.
    val errFile = java.io.File.createTempFile("graft_spill_check", ".err")
    errFile.deleteOnExit()
    pb.redirectError(errFile)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    val exit = proc.waitFor()
    val errTail = scala.util.Try(
      scala.io.Source.fromFile(errFile)(scala.io.Codec.UTF8).getLines()
        .toSeq.takeRight(15).mkString("\n")).getOrElse("")
    val line = out.linesIterator.toSeq.reverse
      .find(_.contains("\"metric\":\"spill_parity\""))
      .getOrElse(fail(s"no parity line in output; exit=$exit\nstderr tail:\n$errTail"))
    assert(exit == 0, s"SpillCheck exit=$exit\n$line\nstderr tail:\n$errTail")
    assert(line.contains("\"mismatched\":[]"), line)
    assert(line.contains("\"failed\":[]"), line)
    assert(line.contains(s""""matched":${SpillCheck.Suite.size}"""), line)
    assert(!line.contains("\"spilled_bytes\":0,"), s"no spills recorded: $line")
  }
}
