package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query execution-metrics audit main: wall time plus the task
  * metrics a scale claim needs numbers for — spilled bytes, shuffle
  * read/write bytes, and max per-task peak execution memory — one JSON
  * line per (query, rep).
  *
  * Why reps: the queries that build a persistent artifact once per
  * (process, corpus) — g6's bucketed edge layout, nn15's partitioned
  * serving layout — have a build-vs-iterate split that a single
  * measurement conflates. Rep 1 pays the build; rep 2+ measures the
  * steady state the operator's cost model claims. Comparing the two
  * lines IS the split.
  *
  * Executes `count()` like [[Bench]], so wall numbers are comparable
  * with BENCH_FULL records.
  *
  * The dir argument accepts a comma-separated list: all dirs run in ONE
  * process (same JIT/heap/storage state), which is what a controlled
  * scale step needs — the round-14 heap-tier A/B (LshScaleCheck at
  * 48 GB over sf10+sf30) is the pattern, generalized here to any
  * registered query.
  *
  * Usage: runMain graft.MetricsCheck <sfDir[,sfDir2,...]> <q1,q2,...> [reps=2]
  */
object MetricsCheck {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MetricsCheck <sfDir[,sfDir2,...]> <q1,q2,...> [reps]")
    val sfDirs = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 2) args(2).toInt else 2
    val unknown = names.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"not in the registry: ${unknown.toSeq.sorted.mkString(", ")}")

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Same knob as LshScaleCheck: past gen-sf30 a fixed 32-partition
    // layout carries per-task sorts too big for the box's disk, and
    // AQE can only merge initial partitions, never split them —
    // scaling the initial count with the corpus is the faithful
    // cluster emulation (and what made gen-sf100 runnable at all).
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-metrics-check")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_mx_${ProcessHandle.current.pid}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val spill = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufW = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufR = new java.util.concurrent.atomic.AtomicLong(0L)
    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          peak.getAndAccumulate(m.peakExecutionMemory, Math.max(_, _))
        }
      }
    })

    // warmup: codegen/JIT + fs metadata outside the measurements
    spark.range(1000000L).selectExpr("sum(id)").collect()

    def f(d: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))
    val explain = sys.env.contains("SPARK_GRAFT_EXPLAIN")
    var lastDir: String = null
    for (sfDir <- sfDirs; rep <- 1 to reps; name <- names) {
      if (lastDir != null && lastDir != sfDir) {
        // scale step within one process: release the previous corpus's
        // persisted relations so the larger scale isn't measured with
        // its storage memory displaced by the smaller one's caches —
        // the A/B isolates HEAP SIZE, not cache-pressure carryover
        graft.sources.Cached.releaseAll()
      }
      lastDir = sfDir
      Thread.sleep(400) // drain listener from the previous measurement
      spill.set(0); shufW.set(0); shufR.set(0); peak.set(0)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      if (explain) // post-execution: AQE's FINAL plan, ReusedExchange visible
        System.err.println(s"== $name rep $rep ==\n" +
          df.queryExecution.executedPlan.toString.take(30000))
      Thread.sleep(400) // let this measurement's TaskEnd events land
      println(s"""{"metric":"qmetrics","query":${Json.str(name)},"rep":$rep,""" +
        s""""sec":${f(sec)},"rows":$rows,"spill_bytes":${spill.get},""" +
        s""""shuffle_write_bytes":${shufW.get},"shuffle_read_bytes":${shufR.get},""" +
        s""""peak_task_mem":${peak.get},"sf":${Json.str(sfDir)}}""")
    }
    spark.stop()
  }
}
