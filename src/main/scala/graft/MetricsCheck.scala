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
    // SPARK_GRAFT_CONF: semicolon-separated k=v session-conf overrides,
    // for A/B arms that need a runtime knob (e.g. lowering the AQE
    // skew-split thresholds so a toy-box shuffle exercises the code
    // path a 100 TB partition would hit naturally). Runtime-settable
    // confs only — applied after getOrCreate.
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })
    spark.sparkContext.setLogLevel("ERROR")

    val spill = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufW = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufR = new java.util.concurrent.atomic.AtomicLong(0L)
    val peak = new java.util.concurrent.atomic.AtomicLong(0L)
    // SPARK_GRAFT_TASKSTATS: per-(stage, task) shuffle-read sizes, for
    // the skew audit — the question "did one reducer carry the hub key"
    // is a MAX/MEDIAN-per-stage question that the process-wide sums
    // above cannot answer. Gated so default record lines stay identical.
    val taskStats = sys.env.contains("SPARK_GRAFT_TASKSTATS")
    val stageReads = new java.util.concurrent.ConcurrentHashMap[
      Int, java.util.concurrent.ConcurrentLinkedQueue[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          peak.getAndAccumulate(m.peakExecutionMemory, Math.max(_, _))
          if (taskStats)
            stageReads.computeIfAbsent(t.stageId,
              _ => new java.util.concurrent.ConcurrentLinkedQueue[Long]())
              .add(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })

    // The FINAL (post-AQE) plan of what actually ran: df.count() plans
    // its own QueryExecution, so df.queryExecution.executedPlan stays
    // isFinalPlan=false — grepping IT for skew marks (or printing it as
    // "the" plan) reads a plan that never executed. A
    // QueryExecutionListener hands us the count()'s own execution after
    // it finishes; the 400 ms post-run drain already covers the async
    // listener bus.
    @volatile var lastPlanStr = ""
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          lastPlanStr = qe.executedPlan.toString
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
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
      // ContextCleaner deletes a finished query's shuffle files only
      // after its ShuffleDependencies are GC'd on the driver; between
      // back-to-back gen-scale measurements that lag can stack two
      // measurements' shuffle footprints on one scratch-disk budget
      // (the g4 restage lesson — GraphIterCheck sweeps the same way).
      // Forced here, OUTSIDE the timed region, so each measurement
      // starts from a swept scratch dir.
      System.gc()
      Thread.sleep(400) // drain listener from the previous measurement
      spill.set(0); shufW.set(0); shufR.set(0); peak.set(0)
      stageReads.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // let this measurement's TaskEnd events land
      // SNAPSHOT everything the record line reads, post-drain and
      // BEFORE any auxiliary job: the optional rows-emission job below
      // runs its own QueryExecution, whose TaskEnd events and onSuccess
      // callback would otherwise contaminate rep-1 task metrics and
      // replace the measured count()'s final plan with the limit(64)'s.
      // (The explain print reads the snapshot too: the listener bus is
      // async, so reading lastPlanStr before the drain could show the
      // PREVIOUS query's plan.)
      val planStr = lastPlanStr
      val mSpill = spill.get; val mShufW = shufW.get
      val mShufR = shufR.get; val mPeak = peak.get
      if (explain) // the executed count()'s FINAL plan (AQE resolved)
        System.err.println(s"== $name rep $rep ==\n" + planStr.take(30000))
      // skew fields: the hottest shuffle-read STAGE's task-size spread
      // (max/median/task-count) plus the AQE plan's skew-split marks —
      // together they answer "was the hub key split, and how unbalanced
      // did the reducers actually run"
      val skewExtra = if (!taskStats) "" else {
        import scala.jdk.CollectionConverters._
        val stages = stageReads.asScala.map { case (sid, q) =>
          (sid, q.asScala.toSeq.sorted) }.filter(_._2.sum > 0)
        // "skew=true" = SortMergeJoin/ShuffledHashJoin skew-join nodes;
        // "skewed" = AQEShuffleRead readers that split a skewed partition
        // — counted on the plan that actually RAN (listener above)
        val marks = "skew=true|skewed".r.findAllIn(planStr).length
        if (stages.isEmpty) s""","skew_plan_marks":$marks"""
        else {
          val (sid, reads) = stages.maxBy(_._2.sum)
          val med = reads(reads.length / 2)
          s""","skew_plan_marks":$marks,"hot_stage":$sid,""" +
            s""""hot_stage_tasks":${reads.length},""" +
            s""""hot_stage_max_read":${reads.last},""" +
            s""""hot_stage_median_read":$med"""
        }
      }
      println(s"""{"metric":"qmetrics","query":${Json.str(name)},"rep":$rep,""" +
        s""""sec":${f(sec)},"rows":$rows,"spill_bytes":$mSpill,""" +
        s""""shuffle_write_bytes":$mShufW,"shuffle_read_bytes":$mShufR,""" +
        s""""peak_task_mem":$mPeak$skewExtra,"sf":${Json.str(sfDir)}}""")
      // SPARK_GRAFT_ROWS: also emit the result rows (bounded queries
      // only — capped at 64) as their own record line, for measurements
      // whose RESULT is the record (nn11's recall@k values, not just its
      // wall/shuffle). Values rendered as strings: these lines are read
      // by humans and jq, not re-joined numerically. Runs AFTER the
      // qmetrics line is printed from snapshots — its job is invisible
      // to this rep's record, and the next iteration's top-of-loop
      // drain + reset clears whatever it adds.
      if (sys.env.contains("SPARK_GRAFT_ROWS") && rep == 1) {
        val cols = df.columns
        val shown = df.limit(64).collect().map(r =>
          Json.obj(cols.zipWithIndex.map { case (c, i) =>
            c -> String.valueOf(r.get(i)) }))
        println(s"""{"metric":"qrows","query":${Json.str(name)},""" +
          s""""sf":${Json.str(sfDir)},"rows":[${shown.mkString(",")}]}""")
      }
    }
    spark.stop()
  }
}
