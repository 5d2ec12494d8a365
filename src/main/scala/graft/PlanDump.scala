package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-round plan capture: writes `plans/<tag>/<query>_<suffix>.txt`
  * with the `.explain("formatted")` output (and, when `--exec` is passed,
  * the post-AQE executed plan after one count()) for each named query.
  *
  * Usage: PlanDump <sfDir> <outDir> <suffix> [--exec] q1 q2 ...
  * Runs under the same session shape as Bench (local[cpus], AQE on,
  * shuffle.partitions = cpus) so the captured plans are the ones the
  * bench actually executes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val pos = args.filterNot(_.startsWith("--"))
    // Validate BEFORE building the session: a missing positional or a
    // typo'd query name mid-list used to throw after minutes of session
    // time, losing the earlier (partially written) outputs.
    require(pos.length >= 4,
      "usage: PlanDump <sfDir> <outDir> <suffix> [--exec] <query> [query ...]")
    val sfDir = pos(0)
    val outDir = pos(1)
    val suffix = pos(2)
    val names = pos.drop(3)
    val unknownNames = names.filterNot(SparkEntry.queries.contains)
    require(unknownNames.isEmpty,
      s"unknown query name(s): ${unknownNames.mkString(", ")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_${ProcessHandle.current.pid}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val sb = new StringBuilder
      sb.append(s"== $name @ $sfDir (local[$cpus]) ==\n\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      if (flags("--exec")) {
        df.count()
        sb.append("\n\n== executed plan (post-AQE, after one count()) ==\n\n")
        sb.append(df.queryExecution.executedPlan.toString)
      }
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        sb.toString.getBytes(StandardCharsets.UTF_8))
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    graft.sources.Cached.releaseAll()
    spark.stop()
  }
}
