package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-12 gate: the query surface must survive MULTI-JVM execution.
  *
  * Everything before this round ran in one JVM (local[*]), where task
  * closures, Aggregator buffers, custom Expressions, DSv2 reader
  * factories and broadcasts never actually cross a process boundary.
  * [[ClusterCheck]] runs a 26-query representative suite (one query per
  * serialization mechanism) under `local-cluster[2,4,2048]` — two real
  * forked executor JVMs — and pins each result's order-independent
  * exact fingerprint equal to the in-process `local[8]` run.
  *
  * Launched as a subprocess because one JVM can hold only one
  * SparkContext, and this suite's sibling specs share a live local[4]
  * context. The subprocess inherits this JVM's (absolutized) classpath;
  * SPARK_HOME/SPARK_SCALA_VERSION must reach the Spark launcher or
  * executor command construction fails ("Cannot find any build
  * directories" — see tools/graft_java.sh).
  */
class LocalClusterSpec extends AnyFunSuite {

  test("26-query serialization surface: local-cluster == local, byte-identical") {
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
      "graft.ClusterCheck", "/root/testdata/sf0.01")).toIndexedSeq

    val pb = new ProcessBuilder(cmd: _*)
    pb.directory(new java.io.File("."))
    pb.environment().put("SPARK_HOME",
      sys.env.getOrElse("SPARK_HOME", "/opt/spark"))
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    // stderr to a file, not a pipe: Spark logs megabytes there, and a
    // full 64K pipe buffer would deadlock the child while this thread
    // blocks reading stdout.
    val errFile = java.io.File.createTempFile("graft_cluster_check", ".err")
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
      .find(_.contains("\"metric\":\"cluster_parity\""))
      .getOrElse(fail(s"no parity line in output; exit=$exit\nstderr tail:\n$errTail"))
    assert(exit == 0, s"ClusterCheck exit=$exit\n$line\nstderr tail:\n$errTail")
    assert(line.contains("\"mismatched\":[]"), line)
    assert(line.contains("\"failed\":[]"), line)
    assert(line.contains(s""""matched":${ClusterCheck.Suite.size}"""), line)
  }
}
