package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 gate: results must be invariant between codegen'd and
  * INTERPRETED execution.
  *
  * Every custom Expression with a `doGenCode` (VectorDot, Hash60) is two
  * implementations of one semantics, and Spark's own builtins have the
  * same duality; codegen fallbacks (wide schemas, huge methods) make the
  * interpreted path a production path at scale. [[InterpCheck]] runs the
  * expression-risk suite under `spark.sql.codegen.factoryMode=NO_CODEGEN`
  * + `wholeStage=false` and pins exact fingerprint parity with the
  * compiled run, proving the regime flip via the `*(n)` markers in the
  * executed flagship plan. The full-surface run (225/225 at sf0.001) is
  * the recorded audit in BENCH_NOTES; this spec keeps the quick subset
  * green in CI. Subprocess for the same one-context-per-JVM reason as
  * LocalClusterSpec/SpillSpec.
  */
class InterpSpec extends AnyFunSuite {

  test("expression-risk suite: interpreted == codegen, byte-identical, regime proven") {
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
      "graft.InterpCheck", "/root/testdata/sf0.001", "quick")).toIndexedSeq

    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File("."))
    pb.environment().put("SPARK_HOME",
      sys.env.getOrElse("SPARK_HOME", "/opt/spark"))
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    val errFile = java.io.File.createTempFile("graft_interp_check", ".err")
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
      .find(_.contains("\"metric\":\"interp_parity\""))
      .getOrElse(fail(s"no parity line in output; exit=$exit\nstderr tail:\n$errTail"))
    assert(exit == 0, s"InterpCheck exit=$exit\n$line\nstderr tail:\n$errTail")
    assert(line.contains("\"mismatched\":[]"), line)
    assert(line.contains("\"failed\":[]"), line)
    assert(line.contains("\"regime_ok\":true"), line)
  }
}
