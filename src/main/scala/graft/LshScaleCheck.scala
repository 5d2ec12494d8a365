package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.DedupOps
import graft.operators.DedupOps.LshConfig
import graft.sources.Tables

/** dd14 scale-profile audit main: instrument every stage of the
  * production MinHash+LSH pipeline (capped shingles → one-pass
  * signatures → band keys → bucket self-join → distinct pairs) with
  * row counts, wall time, and spill/shuffle task metrics, one corpus
  * per line — so a super-linear time step between two scale factors
  * can be attributed to a STAGE and a CAUSE instead of guessed at.
  *
  * Why this exists: the round-13 gen-sf10 sweep measured dd14 at
  * 30.1 s (sf3) → 155.1 s (sf10) while its true input (surviving
  * df-capped doc-shingle rows) grew exactly ×3.33 — a ×1.55
  * super-linear residue in the family whose linearity is the 100 TB
  * headline. Two hypotheses, distinguishable only by instrumentation:
  *
  *  1. *Band-bucket growth* (the dd2-vs-dd7 failure mode one level
  *     up): if bucket populations grew super-linearly, the (band,
  *     bkey) self-join output Σ n² would outgrow the corpus. This is
  *     structurally bounded here — every doc in a bucket shares the
  *     argmin shingle of each of the band's 8 seeds, and df-capped
  *     shingles appear in ≤ MaxDf docs, so bucket size ≤ MaxDf = 10 —
  *     but the bound deserves a measured Σ n² per scale, not a proof
  *     sketch in a doc comment.
  *  2. *Aggregation spill*: [[graft.functions.MinHashSig]] runs under
  *     ObjectHashAggregate, whose in-memory map falls back to
  *     sort-based aggregation at
  *     `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  *     keys (default 128 — i.e. ALWAYS at corpus scale: 500k docs /
  *     32 partitions ≈ 15k keys per partition). In fallback the whole
  *     remaining input externally sorts by doc_id; once that sort no
  *     longer fits the execution-memory share it spills to disk, and
  *     the stage cost steps. The A/B here times the signature stage
  *     twice — default threshold vs one sized to the per-partition
  *     doc count — so the fallback's cost is measured, not inferred.
  *
  * Usage: runMain graft.LshScaleCheck <dir> [dir ...]
  * Prints one JSON line per dir:
  *   {"metric":"lsh_scale","dir":...,"docs":...,"capped_rows":...,
  *    "sig_rows":...,"band_rows":...,"buckets":...,"max_bucket":...,
  *    "join_rows":...,"cand_pairs":...,"t_shingle":...,"t_cap":...,
  *    "t_sig_default":...,"t_sig_bigmap":...,"t_bands":...,
  *    "t_buckets":...,"t_pairs":...,"spill_sig_default":...,
  *    "spill_sig_bigmap":...,"spill_other":...}
  */
object LshScaleCheck {

  private val Cfg = LshConfig.Production

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("testdata_gen/sf1")
    // both | legacy | wide — at gen-sf10 the legacy arm can OOM the
    // whole JVM (ObjectHashAggregate serializing one long[129] buffer
    // per input row), which would take the wide arm's measurement down
    // with it; arm selection lets each record survive the other.
    val arms = sys.env.getOrElse("SPARK_GRAFT_LSH_ARMS", "both")
    val runLegacy = arms != "wide"
    val runWide = arms != "legacy"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Shuffle-partition override for corpora past gen-sf30: a cluster
    // holds per-task rows constant by scaling PARTITION count with the
    // corpus, while this box's default (= cpus = 32) scales per-task
    // rows instead — at gen-sf100 the cap join's per-task sort is then
    // 3.3× the sf30 size, and with AQE coalescing only ever MERGING
    // initial partitions, no setting downstream can split them again.
    // Raising the initial count is the faithful local emulation (AQE
    // still coalesces the small stages back to its 64 MB advisory).
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-lsh-scale-check")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_lsh_${ProcessHandle.current.pid}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Per-phase spill attribution: the listener adds task spill bytes
    // into whatever label `phase` holds. TaskEnd events drain async, so
    // each phase boundary sleeps briefly to let the bus flush — audit
    // precision, not accounting precision.
    val phase = new java.util.concurrent.atomic.AtomicReference[String]("other")
    val spills = scala.collection.concurrent.TrieMap.empty[String, Long]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          val b = m.memoryBytesSpilled + m.diskBytesSpilled
          if (b > 0) spills.updateWith(phase.get()) {
            case Some(x) => Some(x + b); case None => Some(b)
          }
        }
      }
    })
    def timed[A](label: String)(body: => A): (A, Double) = {
      Thread.sleep(300); phase.set(label)
      try {
        val t0 = System.nanoTime()
        val r = body
        val dt = (System.nanoTime() - t0) / 1e9
        (r, dt)
      } finally {
        // finally, not fall-through: if `body` throws (the bigmap arm's
        // caught job abort), the phase label must still reset so spill
        // from the subsequent untimed persist/materialization work is
        // attributed to "other", not to the failed phase.
        Thread.sleep(300); phase.set("other")
      }
    }

    // warmup: codegen + fs metadata outside the timings
    spark.range(1000000L).selectExpr("sum(id)").collect()

    dirs.foreach { dir =>
      spills.clear()
      val docs = Tables.documents(spark, dir)
      val nDocs = docs.count()

      val sh = DedupOps.shinglesOf(docs).persist()
      val (nSh, tSh) = timed("shingle")(sh.count())

      val rare = sh.groupBy("sh").agg(count(lit(1)).as("df"))
        .filter(col("df") <= DedupOps.MaxDf).select("sh")
      val capped = sh.join(rare, Seq("sh")).persist()
      val (nCap, tCap) = timed("cap")(capped.count())
      sh.unpersist(blocking = false)

      // A/B the signature aggregate: default fallback threshold (the
      // registered query's plan) vs a map sized to per-partition keys.
      var (nSigD, tSigD, tSigB) = (-1L, -1.0, -1.0)
      var (nBands, tBands, tBuckets, nPairs, tPairs) = (-1L, -1.0, -1.0, -1L, -1.0)
      var bstats: org.apache.spark.sql.Row = null
      if (runLegacy) {
        val fbKey = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
        val fbDefault = spark.conf.get(fbKey)
        val rd = timed("sig_default")(
          DedupOps.signaturesOnePassOf(capped, Cfg).count())
        nSigD = rd._1; tSigD = rd._2
        // try/catch/finally: the bigmap arm can fail at gen-sf10 (a
        // SparkException when the job aborts; a JVM-level OOM is not
        // survivable and kills the run regardless). Catching the job
        // abort records the arm as failed (-2, distinct from the -1
        // "not run") and lets every LATER dir still measure; the
        // finally guarantees the inflated threshold cannot leak into a
        // later dir's "default" arm either way.
        spark.conf.set(fbKey, "20000000")
        try {
          tSigB = timed("sig_bigmap")(
            DedupOps.signaturesOnePassOf(capped, Cfg).count())._2
        } catch {
          case e: Exception =>
            tSigB = -2.0
            System.err.println(s"[lsh-scale] bigmap arm failed on $dir: " +
              Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        } finally spark.conf.set(fbKey, fbDefault)

        val sig = DedupOps.signaturesOnePassOf(capped, Cfg).persist()
        sig.count() // materialize outside the band timing
        val bands = DedupOps.bandsOf(sig, Cfg).persist()
        val rb = timed("bands")(bands.count()); nBands = rb._1; tBands = rb._2
        val rs = timed("buckets")(
          bands.groupBy("band", "bkey").agg(count(lit(1)).as("n"))
            .agg(count(lit(1)).as("buckets"), max("n").as("max_n"),
              sum(col("n") * col("n")).as("sum_n2"))
            .collect()(0))
        bstats = rs._1; tBuckets = rs._2
        val rp = timed("pairs")(DedupOps.candidatePairs(bands).count())
        nPairs = rp._1; tPairs = rp._2
        sig.unpersist(blocking = false)
        bands.unpersist(blocking = false)
      }

      // The round-14 re-plan: wide 128-min HashAggregate + expression
      // band keys (no TypedImperativeAggregate, no posexplode→
      // collect_list re-aggregation). Timed end-to-end from the same
      // persisted capped relation so the arms are comparable.
      var (nWide, tWide, nPairsW, tPairsW) = (-1L, -1.0, -1L, -1.0)
      if (runWide) {
        val wide = DedupOps.wideSignatureBands(capped, Cfg).persist()
        val rw = timed("wide")(wide.count()); nWide = rw._1; tWide = rw._2
        val rwp = timed("wide_pairs")(DedupOps.candidatePairs(wide).count())
        nPairsW = rwp._1; tPairsW = rwp._2
        wide.unpersist(blocking = false)
      }

      capped.unpersist(blocking = false)

      Thread.sleep(500) // drain listener before reading the counters
      def sp(k: String) = spills.getOrElse(k, 0L)
      def f(d: Double) = f"$d%.2f"
      println(
        s"""{"metric":"lsh_scale","dir":${Json.str(dir)},"docs":$nDocs,""" +
        s""""shingle_rows":$nSh,"capped_rows":$nCap,"sig_rows":$nSigD,""" +
        s""""band_rows":$nBands,""" +
        s""""buckets":${if (bstats != null) bstats.getLong(0) else -1L},""" +
        s""""max_bucket":${if (bstats != null) bstats.getLong(1) else -1L},""" +
        s""""join_rows":${if (bstats != null) bstats.getLong(2) else -1L},""" +
        s""""cand_pairs":$nPairs,""" +
        s""""t_shingle":${f(tSh)},"t_cap":${f(tCap)},""" +
        s""""t_sig_default":${f(tSigD)},"t_sig_bigmap":${f(tSigB)},""" +
        s""""t_bands":${f(tBands)},"t_buckets":${f(tBuckets)},""" +
        s""""t_pairs":${f(tPairs)},""" +
        s""""wide_band_rows":$nWide,"wide_cand_pairs":$nPairsW,""" +
        s""""t_wide":${f(tWide)},"t_wide_pairs":${f(tPairsW)},""" +
        s""""spill_wide":${sp("wide")},"spill_wide_pairs":${sp("wide_pairs")},""" +
        s""""spill_shingle":${sp("shingle")},"spill_cap":${sp("cap")},""" +
        s""""spill_sig_default":${sp("sig_default")},""" +
        s""""spill_sig_bigmap":${sp("sig_bigmap")},""" +
        s""""spill_bands":${sp("bands")},"spill_pairs":${sp("pairs")},""" +
        s""""spill_other":${sp("other")}}""")
    }
    spark.stop()
  }
}
