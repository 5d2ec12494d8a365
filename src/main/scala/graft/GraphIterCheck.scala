package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.GraphOps
import graft.sources.Tables

/** Per-iteration wall-time audit for the g family (round 15).
  *
  * g5/g6/g1/g4 dominate the bench (~14 s of ~124 at sf0.1) and are all
  * right-planned; what remains is iteration count × a per-round
  * micro-floor that box noise can hide a real regression inside. This
  * main decomposes each query into its build and per-round costs so a
  * future round can tell "g6 regressed" from "the box was busy":
  *
  *  - g5: the EXACT pagerankConverged loop (step → full-outer delta
  *    probe → observe → localCheckpoint — one action per round),
  *    timed per round with the round's delta and shuffle bytes;
  *  - g6: the bucketed-layout BUILD timed separately from three
  *    pagerankStep rounds, each materialized via localCheckpoint (the
  *    build-once/iterate-many split the operator's cost model claims);
  *  - g1: the edge-relation build, then the bench-shaped FUSED
  *    3-step+top20 job as one unit — comparing it against g6's
  *    sum-of-rounds shows what per-round materialization costs;
  *  - g4: bfsHistogram's per-round (frontier-union → min-agg →
  *    checkpoint) cost over its registered seed set.
  *
  * Per-round shuffle bytes come from a TaskEnd listener reset at each
  * round boundary (400 ms drains around each mark, like MetricsCheck).
  *
  * Rep semantics for "bucketed_build": BuildOnce caches the g6 layout
  * process-wide, so only REP 1's line is a real build — rep >= 2
  * measures a count() over the existing table (the build/steady split,
  * same convention as MetricsCheck's rep 1 vs rep 2). Read build costs
  * from rep 1, never min-of-reps.
  *
  * `--g4bucketed` runs ONLY the g4 BFS envelope, restaged for the box's
  * scratch-disk budget (the r16 full audit died on disk in round 3 of 4
  * at gen-sf100 — records/GRAPHITER_gensf100_96g_r16.jsonl): the
  * frontier join reads edges from g6's persisted BUCKETED layout
  * instead of a second 19 GB Cached copy (the [[Cached]] persist made
  * during the layout build is released before the rounds), and stale
  * round shuffles are swept between iterations (each round's
  * localCheckpoint cuts lineage, so dropping the previous frontier and
  * forcing a GC lets ContextCleaner delete its shuffle files — plus
  * spark.cleaner.periodicGC as a backstop). Same BFS recurrence, same
  * per-round lines; parity vs the registered g4 is gated by
  * SPARK_GRAFT_G4_PARITY=1 (run it at a fixture SF, not at gen scale
  * where the registered query would double the measured work).
  *
  * Usage: runMain graft.GraphIterCheck <sfDir> [reps=2] [--g4bucketed]
  */
object GraphIterCheck {

  def main(args: Array[String]): Unit = {
    // flags never occupy a positional slot: `--g4bucketed` as the only
    // argument must not become the sfDir
    val positional = args.filterNot(_.startsWith("--"))
    val sfDir = positional.headOption.getOrElse("/root/testdata/sf0.1")
    val g4Only = args.contains("--g4bucketed")
    val reps = positional.drop(1).headOption.map(_.toInt).getOrElse(2)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-graph-iter")
      // backstop sweeper for --g4bucketed (explicit per-round GC is the
      // primary mechanism); default 30min never fires inside a run
      .config("spark.cleaner.periodicGC.interval",
        if (g4Only) "60s" else "30min")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_gi_${ProcessHandle.current.pid}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shufR = new java.util.concurrent.atomic.AtomicLong(0L)
    val shufW = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    def f(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
    // One timed mark = drain listener, run, drain again, emit one line.
    def mark(query: String, round: String, rep: Int, extra: String = "")(body: => Long): Unit = {
      Thread.sleep(400); shufR.set(0); shufW.set(0)
      val t0 = System.nanoTime()
      val rows = body
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      println(s"""{"metric":"graphiter","query":${Json.str(query)},""" +
        s""""round":${Json.str(round)},"rep":$rep,"sec":${f(sec)},"rows":$rows,""" +
        s""""shuffle_read":${shufR.get},"shuffle_write":${shufW.get}$extra,""" +
        s""""sf":${Json.str(sfDir)}}""")
    }

    // warmup: codegen/JIT + fs metadata outside the measurements
    spark.range(1000000L).selectExpr("sum(id)").collect()

    if (g4Only) {
      // layout build first (rep-1 "bucketed_build" convention), then
      // release the Cached edge relation the build materialized — the
      // BFS rounds must read the ONE on-disk bucketed copy, not keep a
      // second 19 GB persisted relation alive on the same scratch disk
      mark("g4_bfs_hops", "bucketed_build", 1) {
        GraphOps.bucketedTradeEdges(spark, sfDir).count()
      }
      graft.sources.Cached.releaseAll()
      for (rep <- 1 to reps) {
        val edges = GraphOps.bucketedTradeEdges(spark, sfDir)
          .select("src", "dst")
        var dist = Tables.supplier(spark, sfDir)
          .filter(col("s_suppkey") % 10 === 0)
          .select((col("s_suppkey") * 2 + 1).as("node"), lit(0).as("d"))
          .localCheckpoint()
        for (i <- 1 to 4) {
          mark("g4_bfs_hops", s"round_$i", rep) {
            dist = dist.unionByName(
                edges.join(dist.withColumnRenamed("node", "src"), Seq("src"))
                  .select(col("dst").as("node"), (col("d") + 1).as("d")))
              .groupBy("node").agg(min("d").as("d"))
              .localCheckpoint()
            dist.count()
          }
          // sweep the round's now-unreachable shuffles + the previous
          // frontier's checkpoint blocks before the next round starts:
          // lineage is cut at each localCheckpoint, so a GC is enough
          // for ContextCleaner to delete them from local disk
          System.gc()
          Thread.sleep(3000)
        }
        mark("g4_bfs_hops", "histogram", rep) {
          dist.groupBy("d").agg(count(lit(1)).as("n_nodes")).orderBy("d").count()
        }
        if (rep == 1 && sys.env.contains("SPARK_GRAFT_G4_PARITY")) {
          val g4Audit = dist.groupBy("d").agg(count(lit(1)).as("n_nodes"))
            .orderBy("d").collect().map(_.toSeq).toSeq
          val g4Reg = SparkEntry.queries("g4_bfs_hops")(spark, sfDir)
            .collect().map(_.toSeq).toSeq
          require(g4Audit == g4Reg,
            s"g4 bucketed audit drifted from the registered operator:\n" +
              s"audit=$g4Audit\nregistered=$g4Reg")
          System.err.println("[graphiter] parity lock: g4 bucketed-layout " +
            "BFS matches the registered operator")
        }
      }
      spark.stop()
      return
    }

    for (rep <- 1 to reps) {
      // ---- g1: edge build, then the bench-shaped fused 3-step job ----
      graft.sources.Cached.releaseAll()
      mark("g1_pagerank", "edges_build", rep) {
        GraphOps.tradeEdgesDeg(spark, sfDir).count()
      }
      mark("g1_pagerank", "fused_3step_top20", rep) {
        val edgesDeg = GraphOps.tradeEdgesDeg(spark, sfDir)
        var pr = edgesDeg.select(col("src").as("node")).distinct()
          .withColumn("pr", lit(GraphOps.Mass))
        for (_ <- 1 to 3) pr = GraphOps.pagerankStep(edgesDeg, pr)
        pr.orderBy(col("pr").desc, col("node")).limit(20).count()
      }

      // ---- g5: the exact converged loop, one line per round ----
      val edgesDeg = GraphOps.tradeEdgesDeg(spark, sfDir)
      var pr = edgesDeg.select(col("src").as("node")).distinct()
        .withColumn("pr", lit(GraphOps.Mass)).localCheckpoint()
      var iters = 0
      var delta = -1L
      while (iters < 8 && delta != 0L) {
        val obs = org.apache.spark.sql.Observation(s"gi_delta_${rep}_$iters")
        // the line's "rows" field carries the round's max |Δpr|
        mark("g5_pagerank_converged", s"round_${iters + 1}", rep) {
          val next = GraphOps.pagerankStep(edgesDeg, pr)
            .join(pr.select(col("node"), col("pr").as("pr_prev")),
              Seq("node"), "full_outer")
            .observe(obs, max(abs(coalesce(col("pr"), lit(0L)) -
              coalesce(col("pr_prev"), lit(0L)))).as("d"))
            .localCheckpoint()
          delta = Option(obs.get("d")).map(_.asInstanceOf[Long]).getOrElse(0L)
          pr = next.filter(col("pr").isNotNull).drop("pr_prev")
          delta // rows column carries the round's max |Δpr|
        }
        iters += 1
      }

      // ---- g6: build once, then per-round materialized steps ----
      mark("g6_bucketed_pagerank", "bucketed_build", rep) {
        GraphOps.bucketedTradeEdges(spark, sfDir).count()
      }
      val bedges = GraphOps.bucketedTradeEdges(spark, sfDir)
      var bpr = bedges.select(col("src").as("node")).distinct()
        .withColumn("pr", lit(GraphOps.Mass)).localCheckpoint()
      for (i <- 1 to 3) {
        mark("g6_bucketed_pagerank", s"round_$i", rep) {
          bpr = GraphOps.pagerankStep(bedges, bpr).localCheckpoint()
          bpr.count()
        }
      }
      mark("g6_bucketed_pagerank", "top20", rep) {
        bpr.orderBy(col("pr").desc, col("node")).limit(20).count()
      }

      // ---- g4: BFS rounds over the registered seed set ----
      val edges = GraphOps.tradeEdges(spark, sfDir)
      var dist = Tables.supplier(spark, sfDir)
        .filter(col("s_suppkey") % 10 === 0)
        .select((col("s_suppkey") * 2 + 1).as("node"), lit(0).as("d"))
        .localCheckpoint()
      for (i <- 1 to 4) {
        mark("g4_bfs_hops", s"round_$i", rep) {
          dist = dist.unionByName(
              edges.join(dist.withColumnRenamed("node", "src"), Seq("src"))
                .select(col("dst").as("node"), (col("d") + 1).as("d")))
            .groupBy("node").agg(min("d").as("d"))
            .localCheckpoint()
          dist.count()
        }
      }
      mark("g4_bfs_hops", "histogram", rep) {
        dist.groupBy("d").agg(count(lit(1)).as("n_nodes")).orderBy("d").count()
      }

      // Parity lock (rep 1): the g5/g4 round bodies above are
      // re-implementations of the registered operators' loops (the
      // per-round marks cannot thread through the sealed loop), so a
      // future change to the operator would otherwise leave this audit
      // silently measuring the OLD recurrence. Comparing the audit
      // loops' final relations against the registered queries makes
      // the drift a hard failure instead of a wrong record.
      if (rep == 1) {
        val g5Audit = pr.orderBy(col("pr").desc, col("node")).limit(20)
          .withColumn("n_iters", lit(iters))
          .collect().map(_.toSeq).toSeq
        val g5Reg = SparkEntry.queries("g5_pagerank_converged")(spark, sfDir)
          .collect().map(_.toSeq).toSeq
        require(g5Audit == g5Reg,
          s"g5 audit loop drifted from the registered operator:\n" +
            s"audit=$g5Audit\nregistered=$g5Reg")
        val g4Audit = dist.groupBy("d").agg(count(lit(1)).as("n_nodes"))
          .orderBy("d").collect().map(_.toSeq).toSeq
        val g4Reg = SparkEntry.queries("g4_bfs_hops")(spark, sfDir)
          .collect().map(_.toSeq).toSeq
        require(g4Audit == g4Reg,
          s"g4 audit loop drifted from the registered operator:\n" +
            s"audit=$g4Audit\nregistered=$g4Reg")
        System.err.println("[graphiter] parity lock: g5/g4 audit loops " +
          "match the registered operators")
      }
    }
    spark.stop()
  }
}
