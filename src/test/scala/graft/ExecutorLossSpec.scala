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
  * no kill landed or the scheduler never observed a lost task.
  *
  * Subprocess for the usual one-context-per-JVM reason — and because
  * the killer must see the executor backends as ITS process descendants.
  */
class ExecutorLossSpec extends AnyFunSuite {

  test("5-query suite: executor SIGKILL mid-query, results byte-identical") {
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
      "graft.ExecutorLossCheck", "/root/testdata/sf0.01")).toIndexedSeq

    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File("."))
    pb.environment().put("SPARK_HOME",
      sys.env.getOrElse("SPARK_HOME", "/opt/spark"))
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    val errFile = java.io.File.createTempFile("graft_executor_loss", ".err")
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
      .find(_.contains("\"metric\":\"executor_loss_parity\""))
      .getOrElse(fail(s"no parity line in output; exit=$exit\nstderr tail:\n$errTail"))
    assert(exit == 0, s"ExecutorLossCheck exit=$exit\n$line\nstderr tail:\n$errTail")
    assert(line.contains("\"mismatched\":[]"), line)
    assert(line.contains("\"failed\":[]"), line)
    assert(line.contains(s""""matched":${ExecutorLossCheck.Suite.size}"""), line)
    assert(!line.contains("\"kills\":0,"), s"no executor was killed: $line")
  }
}
