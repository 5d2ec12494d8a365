package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.Fingerprint.Fp

/** Executor-LOSS audit main: under `local-cluster[2,4,2048]`, kill one
  * of the two REAL executor JVMs (SIGKILL the CoarseGrainedExecutor-
  * Backend process) in the middle of each gated query, and pin the
  * result exactly equal to the undisturbed run.
  *
  * Why this exists beyond RetryCheck (round 11): RetryCheck injects
  * task-level FAILURES — exceptions a task throws and Spark retries on
  * the same executors. Executor DEATH is a different recovery path: the
  * executor's shuffle map outputs vanish with it (no external shuffle
  * service here, as on many real clusters), so downstream reducers hit
  * FetchFailed, the DAGScheduler resubmits the parent map stage for the
  * lost partitions, and the standalone worker relaunches a fresh
  * executor that must re-register and re-receive every broadcast and
  * task binary. On a 1000-executor cluster this happens daily (spot
  * kills, OOM kills, node failures); a result that shifts under it —
  * a non-deterministic partial re-aggregation, state rebuilt from a
  * side effect, an Aggregator whose re-run diverges — is a silent
  * correctness bug at scale. All gated queries are deterministic by
  * construction (DuckDB-oracled), so exact fingerprint parity is the
  * right contract.
  *
  * Kill choreography per query: a stage-completion listener arms after
  * the FIRST stage of the query's own job completes (so the victim
  * executor owns shuffle outputs some later stage must fetch), then a
  * watcher thread SIGKILLs one live executor backend process. The gate
  * requires (a) at least one kill actually happened while queries ran,
  * and (b) at least one task-end with a non-success reason OR a stage
  * resubmission was observed — proving the loss was felt, not absorbed
  * before any work landed on the victim.
  *
  * Usage: runMain graft.ExecutorLossCheck [sfDir]  (prints one JSON
  * line; ExecutorLossSpec launches it as a subprocess).
  */
object ExecutorLossCheck {

  /** Multi-stage shapes with real shuffle dependencies: iterative
    * PageRank (checkpointed lineage re-registration), the banded dedup
    * join (Cached persist partially lost with the executor), a wide
    * TPC-H agg-join, the priority-dedup window, and the single-pass
    * MinHash Aggregator (buffer re-merge on re-run). */
  val Suite: Seq[String] = Seq(
    "g1_pagerank", "dd2_minhash_lsh", "q18_big_orders",
    "a8_priority_dedup", "dd14_minhash_production")

  /** The executor JVMs forked under this process. ProcessHandle's
    * commandLine() is TRUNCATED on Linux (the giant -cp pushes the main
    * class off the end), so read /proc/<pid>/cmdline directly — the
    * NUL-separated full argv — and match the backend class there. */
  private def executorBackends(): Seq[ProcessHandle] = {
    import scala.jdk.CollectionConverters._
    ProcessHandle.current().descendants().iterator().asScala.filter { ph =>
      scala.util.Try {
        val raw = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(s"/proc/${ph.pid()}/cmdline"))
        new String(raw, java.nio.charset.StandardCharsets.US_ASCII)
          .contains("CoarseGrainedExecutorBackend")
      }.getOrElse(false)
    }.toSeq
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")

    val addOpens = Jvm.addOpensString
    val absClasspath = Jvm.absoluteClasspath

    def session(tag: String): SparkSession = SparkSession.builder()
      .master("local-cluster[2,4,2048]")
      .appName(s"graft-executor-loss-$tag")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.executor.extraClassPath", absClasspath)
      .config("spark.executor.extraJavaOptions", addOpens)
      .config("spark.executor.memory", "2g")
      // lost-shuffle recovery must win within the run: generous retry
      // budget, short locality waits so resubmitted tasks land anywhere
      .config("spark.task.maxFailures", "8")
      .config("spark.stage.maxConsecutiveAttempts", "8")
      .config("spark.locality.wait", "0")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_el_${ProcessHandle.current.pid}_$tag")
      .config("spark.ui.enabled", "false")
      .getOrCreate()

    // ---- Phase 1: undisturbed reference run ----
    val ref = session("ref")
    ref.sparkContext.setLogLevel("ERROR")
    val refErrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val refFps = Suite.flatMap { q =>
      try Some(q -> Fingerprint.of(SparkEntry.queries(q)(ref, sfDir)))
      catch { case e: Throwable =>
        refErrs(q) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        None
      }
    }.toMap
    graft.sources.Cached.releaseAll()
    ref.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // ---- Phase 2: same queries, one executor SIGKILLed mid-query ----
    val spark = session("kill")
    spark.sparkContext.setLogLevel("ERROR")
    val kills = new AtomicInteger(0)
    val nonSuccess = new AtomicInteger(0)
    val resubmits = new AtomicInteger(0)
    val armed = new AtomicBoolean(false)
    // ONE kill per query: the first kill attempt exhausts the budget
    // until the driver re-arms it for the next query — continuous
    // slaughter would murder every relaunched executor and exhaust the
    // stage-attempt budget (the first run of this gate did exactly
    // that: 90 kills, every job dead at 8 attempts).
    val killBudget = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        // a stage attempt beyond 0 is the DAGScheduler resubmitting
        // after lost shuffle output — the other way a felt loss shows
        if (s.stageInfo.attemptNumber() > 0) resubmits.incrementAndGet()
        // arm the killer once a stage has completed: its map outputs
        // now live on the executors, including the victim
        armed.set(true)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (!t.reason.toString.startsWith("Success")) nonSuccess.incrementAndGet()
    })
    val killer = new Thread(() => {
      while (!Thread.currentThread().isInterrupted) {
        try {
          if (armed.getAndSet(false) && killBudget.getAndUpdate(b => math.max(0, b - 1)) > 0) {
            // kill whichever backend is alive; the worker relaunches a
            // replacement, which must re-register from scratch
            executorBackends().headOption.foreach { ph =>
              if (ph.destroyForcibly()) kills.incrementAndGet()
            }
          }
          Thread.sleep(100)
        } catch { case _: InterruptedException => Thread.currentThread().interrupt() }
      }
    }, "graft-executor-killer")
    killer.setDaemon(true)
    killer.start()

    val errs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val killFps = Suite.flatMap { q =>
      armed.set(false)
      killBudget.set(1)
      try Some(q -> Fingerprint.of(SparkEntry.queries(q)(spark, sfDir)))
      catch { case e: Throwable =>
        errs(q) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
        None
      }
    }.toMap
    killer.interrupt()
    graft.sources.Cached.releaseAll()
    spark.stop()

    val mismatched = Suite.filter(q =>
      refFps.get(q).isDefined && killFps.get(q).isDefined &&
        refFps(q) != killFps(q))
    val matched = Suite.count(q =>
      refFps.get(q).isDefined && killFps.get(q) == refFps.get(q))
    val failed = (refErrs.keySet ++ errs.keySet).toSeq.sorted
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val errDetail = Json.obj(scala.collection.mutable.LinkedHashMap(
      (refErrs.map { case (k, v) => s"ref:$k" -> v } ++
        errs.map { case (k, v) => s"kill:$k" -> v }).toSeq: _*))
    // felt = the loss was observable in the scheduler (a lost/failed
    // task OR a resubmitted stage), not a no-op kill
    val felt = nonSuccess.get() > 0 || resubmits.get() > 0
    println(s"""{"metric":"executor_loss_parity","matched":$matched,"total":${Suite.size},"kills":${kills.get()},"non_success_tasks":${nonSuccess.get()},"stage_resubmits":${resubmits.get()},"mismatched":${arr(mismatched)},"failed":${arr(failed)},"errors":$errDetail,"sf":"$sfDir"}""")
    if (mismatched.nonEmpty || failed.nonEmpty || kills.get() == 0 || !felt)
      sys.exit(1)
  }
}
