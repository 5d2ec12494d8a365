ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tileprocessorspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses the ONE JSON line graft.Bench prints from a bounded
// stdout tail. With the default LoggedOutput strategy sbt re-logs the
// forked process's stdout as "[info] {...}" and stderr as "[error] ...",
// and then appends its own "[success] Total time..." line — the wrapped
// JSON has never been recovered by the driver's parser (PERF_r18.json:
// prev/now_bench_ok false despite rc=0). StdoutOutput passes the child's
// stdout/stderr through verbatim, and showSuccess drops the trailing
// [success] line, so the JSON line Bench prints last IS the final stdout
// line. (Bench also writes the identical line to BENCH_LINE.json.)
run / outputStrategy := Some(StdoutOutput)
showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — the
// unused-key lint doesn't see that
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
