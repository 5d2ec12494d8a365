package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

import graft.OpModule
import graft.sources.{Sql, Tables}

/** Structured-Streaming incarnation of the reference's resource monitor
  * (SURVEY §2.9): the monitor TSV append loop (recorder.py:50-72,
  * worker.py:724-736) becomes a file-stream source; the downstream pandas
  * batch analytics (recorder.py:75-133) become streaming windowed
  * aggregation and keyed state.
  *
  * Both queries execute a REAL streaming query (memory sink,
  * processAllAvailable) and return the materialized result, so the
  * streaming path is exercised inside the normal correctness gate. The
  * reference has no late data (single process, monotonic clock); the
  * watermark lives in [[windowedAgg]] for the scaled engine.
  */
object MonitorStream extends OpModule {

  private val nameSeq = new AtomicInteger(0)

  private def runToTable(s: SparkSession, df: DataFrame, mode: String): DataFrame = {
    val name = s"graft_stream_${nameSeq.incrementAndGet()}"
    // a stateful streaming query materializes one state store per shuffle
    // partition per batch; at test scale that fixed cost dominates, so run
    // the micro-batch with few partitions (a real deployment sizes this to
    // key cardinality — state is per-key either way)
    val saved = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    } finally s.conf.set("spark.sql.shuffle.partitions", saved)
    s.table(name)
  }

  /** Tumbling 1-hour windows per tile with a watermark (scaled form of
    * recorder.py:102 + plot prep). */
  def windowedAgg(mon: DataFrame): DataFrame =
    mon.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("tile_id"))
      .agg(count(lit(1)).as("n"), max("mem_rss").as("mem_peak"))

  final case class MonSample(tile_id: String, mem_rss: Long)
  final case class TilePeak(tile_id: String, mem_peak: Long)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // windowed streaming aggregation. NOTE: complete output mode is
    // HARNESS-ONLY — it re-emits full state each batch so the memory sink
    // holds the final answer for the oracle compare; an unbounded
    // deployment uses the append-mode + watermark form (see
    // StreamingSpec "append mode emits only windows closed by the
    // watermark"), where state stays bounded by the watermark horizon.
    "st1_stream_monitor_agg" -> ((s, dir) => {
      val mon = Tables.monitorCols(Tables.eventsStream(s, dir))
      runToTable(s, windowedAgg(mon), "complete")
        .select(col("window.start").as("hour"), col("tile_id"),
          col("n"), col("mem_peak"))
    }),

    // streaming dedup: first-seen wins per user_id; the surviving ROW per
    // key depends on processing order, so only the (deterministic) key
    // set is emitted — the streaming arm of the dedup family
    "st3_stream_dedup" -> ((s, dir) => {
      val ev = Tables.eventsStream(s, dir).select("user_id")
      runToTable(s, ev.dropDuplicates("user_id"), "append")
        .select("user_id")
    }),

    // st4 — watermark-BOUNDED streaming dedup: state for a key is evicted
    // once the watermark passes its expiry, so state is O(keys per
    // watermark window) instead of O(all keys ever) — the only dedup form
    // that survives an unbounded stream (st3's plain dropDuplicates keeps
    // state forever). Single-batch execution (one parquet file, one
    // trigger) makes the emitted key set exactly the distinct set.
    "st4_stream_dedup_watermark" -> ((s, dir) => {
      val ev = Tables.eventsStream(s, dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
      runToTable(s, ev, "append").select("user_id", "event_type")
    }),

    // st5 — stream-static enrichment join: each monitor sample joined to
    // the static boundaries dimension (broadcast; no stream state at all
    // — the canonical cheap enrichment at any scale)
    "st5_stream_static_join" -> ((s, dir) => {
      val mon = Tables.monitorCols(Tables.eventsStream(s, dir))
        .select("event_id", "tile_id", "mem_rss")
      val dims = broadcast(Tables.boundaries(s).select("tile_id", "border"))
      runToTable(s, mon.join(dims, Seq("tile_id")), "append")
        .select("event_id", "tile_id", "border", "mem_rss")
    }),

    // st6 — session windows: per-user sessions closed by a 6-hour
    // inactivity gap. In-store state is O(open sessions), not O(events);
    // the complete-mode memory sink below is harness-only (see st1 note)
    // — unbounded deployments emit closed sessions via watermark + append.
    // Exact-boundary semantics (pinned by StreamingSpec): an event at
    // prev_ts + exactly 6h MERGES (windows merge on touch-or-overlap),
    // matching the oracle's strict `> 6h` session break.
    "st6_session_windows" -> ((s, dir) => {
      val ev = Tables.eventsStream(s, dir)
      val sess = ev.groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          // order-independent float sum (streaming partials merge in
          // arrival order — decimal makes the result order-free); see
          // graft.operators.Exact
          round(sum(col("value").cast("decimal(18,4)")), 2).cast("double")
            .as("sum_value"))
      runToTable(s, sess, "complete")
        .select(col("user_id"), col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"), col("sum_value"))
    }),

    // st9 — session windows in APPEND mode: the production form st6's
    // doc points to. Only sessions CLOSED by the watermark are emitted
    // (exactly once, when the watermark REACHES session_end — the
    // boundary is INCLUSIVE: end == watermark already emits, pinned by
    // StreamingSpec's equality test); sessions still open at
    // end-of-stream stay in state and never reach the sink. The oracle
    // mirrors that: gaps-and-islands sessions whose end (last event +
    // gap) is <= the final watermark (max ts - 1 hour).
    "st9_session_append" -> ((s, dir) => {
      val ev = Tables.eventsStream(s, dir).withWatermark("ts", "1 hour")
      val sess = ev.groupBy(session_window(col("ts"), "6 hours"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
      runToTable(s, sess, "append")
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"), col("n_events"))
    }),

    // pp2 — STREAMING ingest pipeline for training data: the arriving
    // document stream passes a stateless quality gate (per-row column
    // expressions only — no aggregation state) and then exact streaming
    // dedup on the content hash. Emits the clean distinct content set.
    // State is one hash per distinct doc; the watermark-bounded variant
    // (st4's dropDuplicatesWithinWatermark) is the unbounded-stream form
    // once documents carry an event time.
    "pp2_stream_ingest" -> ((s, dir) => {
      val docs = Tables.documentsStream(s, dir)
      val words = split(col("text"), " ")
      val clean = docs
        .withColumn("n_tokens", size(filter(words, w => w =!= "")))
        .withColumn("n_stop", size(filter(words,
          w => w.isin("the", "a", "data", "value"))))
        .filter(col("n_tokens") >= 10 &&
          col("n_stop") / col("n_tokens") < 0.5)
        .select(md5(col("text")).as("text_hash"))
        .dropDuplicates("text_hash")
      runToTable(s, clean, "append").select("text_hash")
    }),

    // st7 — foreachBatch FILE sink: each micro-batch lands as parquet
    // through the exactly-once-per-batch hook (K6's durable form — the
    // reference appends monitor samples to a TSV, recorder.py:50-72; at
    // scale the landing zone is a table the next pipeline stage reads).
    // The query returns the read-back of the landed files, so the whole
    // write path sits inside the correctness gate.
    "st7_foreachbatch_sink" -> ((s, dir) => {
      val out = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_st7_${dir.hashCode}").getPath
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      val mon = Tables.monitorCols(Tables.eventsStream(s, dir))
        .select("event_id", "tile_id", "mem_rss")
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = mon.writeStream.outputMode("append")
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            batch.write.mode("append").parquet(out)
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      s.read.parquet(out)
    }),

    // st8 — stream-STREAM interval join: each purchase matched to the
    // same user's clicks in the preceding 30 minutes, both sides
    // watermarked. The time-bound join condition is what makes this
    // survive an unbounded run: Spark evicts click/purchase state once
    // the watermark passes the 30-minute horizon, so state is O(events
    // per watermark window) per side — the attribution join of a live
    // ingest pipeline (w7 is its batch twin). Inner join emits exactly
    // the matched pairs, so the oracle is the plain batch range join.
    "st8_stream_stream_join" -> ((s, dir) => {
      val clicks = Tables.eventsStream(s, dir)
        .filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("c_id"),
          col("ts").as("c_ts"))
        .withWatermark("c_ts", "1 hour")
      val purchases = Tables.eventsStream(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
          col("ts").as("p_ts"))
        .withWatermark("p_ts", "1 hour")
      val joined = clicks.join(purchases,
        col("user_id") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") < col("c_ts") + expr("INTERVAL 30 MINUTES"))
      runToTable(s, joined, "append").select("c_id", "p_id")
    }),

    // keyed running state via mapGroupsWithState: per-tile peak memory
    "st2_stream_peak_state" -> ((s, dir) => {
      import s.implicits._
      val mon = Tables.monitorCols(Tables.eventsStream(s, dir))
        .select(col("tile_id"), col("mem_rss")).as[MonSample]
      val peaks = mon.groupByKey(_.tile_id)
        .mapGroupsWithState[Long, TilePeak](GroupStateTimeout.NoTimeout) {
          (tile, rows, state) =>
            val mx = (rows.map(_.mem_rss) ++ state.getOption.iterator).max
            state.update(mx)
            TilePeak(tile, mx)
        }
      runToTable(s, peaks.toDF(), "update")
        .groupBy("tile_id").agg(max("mem_peak").as("mem_peak"))
    }),

    // st10 — streaming CDC UPSERT: every micro-batch merges latest-wins
    // into a versioned parquet snapshot via foreachBatch (the streaming
    // twin of k12, and the shape Delta-style `MERGE` takes without a
    // table format: read snapshot vN, merge batch, write vN+1 — never
    // overwrite what the job is reading). The events are staged into 4
    // hash-bucketed files and streamed with maxFilesPerTrigger=1, so the
    // merge path is exercised across REAL multiple micro-batches; the
    // latest-wins pick is a semilattice max by (ts, event_id), so the
    // final snapshot is identical for ANY batch slicing — the oracle is
    // batch-boundary-free. At scale the snapshot is key-bucketed and
    // each merge shuffles only the micro-batch.
    "st10_stream_upsert" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val base = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_st10_${dir.hashCode}").getPath
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
      val stage = s"$base/stage"
      val ev = Tables.events(s, dir).select("user_id", "event_id", "ts", "value")
      // 4 deterministic hash buckets, written as separate jobs so the
      // file-stream source sees >= 4 files (=> >= 4 micro-batches)
      (0 until 4).foreach { b =>
        ev.filter(col("event_id") % 4 === b)
          .coalesce(1).write.mode("append").parquet(stage)
      }
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      var cur: Option[String] = None
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val q = s.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).parquet(stage)
          .writeStream.outputMode("append")
          .foreachBatch { (batch: DataFrame, id: Long) =>
            val latestB = batch.withColumn("rn", row_number().over(w))
              .filter(col("rn") === 1).drop("rn")
            val merged = cur match {
              case None => latestB
              case Some(p) => s.read.parquet(p).unionByName(latestB)
                .withColumn("rn", row_number().over(w))
                .filter(col("rn") === 1).drop("rn")
            }
            val next = s"$base/v$id"
            merged.write.mode("overwrite").parquet(next)
            cur = Some(next)
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      // an empty source can yield zero micro-batches → no snapshot version
      cur.map(p => s.read.parquet(p)).getOrElse(ev.limit(0))
        .select("user_id", "value", "ts")
    }),

    // st11 — pipeline-health OBSERVABILITY: Dataset.observe attaches
    // accumulator-backed metrics (rows seen / rows dropped by the
    // quality gate) to the streaming plan itself, so the health report
    // rides along with every micro-batch — at 100 TB there is no second
    // pass to count what the gate dropped, and a metrics-side filter()
    // would double the scan. The observed metrics surface per batch via
    // StreamingQueryProgress.observedMetrics (asserted against the
    // batch ground truth in StreamingSpec); the query RESULT is the
    // gated per-language profile, which the DuckDB oracle checks.
    "st11_stream_observe" -> ((s, dir) => {
      val gated = Tables.documentsStream(s, dir)
        .observe("gate",
          count(lit(1)).as("rows_seen"),
          sum(when(col("n_chars") < 200, 1L).otherwise(0L)).as("rows_dropped"))
        .filter(col("n_chars") >= 200)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      runToTable(s, gated, "complete")
    }),

    // ST12 (extension) — STREAMING DRIFT MONITOR: ds15's per-source KS
    // statistic fed by streaming ingest. The stream maintains only the
    // BOUNDED piece of state — the (source × n_chars) count grid, whose
    // size is value-domain × sources regardless of how much data has
    // flowed — and the KS analytics run as a batch view over the
    // materialized state store (sketch-in-the-stream, analytics-on-the-
    // store: the same split a18 uses for daily HLL sketches). Converges
    // to the batch ds15 answer under ANY micro-batch slicing because
    // counts are associative — which is why the batch oracle can pin it.
    "st12_stream_drift" -> ((s, dir) => {
      val docs = Tables.documentsStream(s, dir).select("source", "n_chars")
      val grid = runToTable(s,
        docs.groupBy("source", "n_chars").count(), "complete")
        .withColumnRenamed("count", "c_sv")
      // Re-base the converged state snapshot on a LogicalRDD: the KS
      // finish self-joins the grid (grid ⋈ its own aggregates), and the
      // memory-sink View is not a MultiInstanceRelation, so the analyzer
      // can't deduplicate its attributes the way it does for file scans.
      graft.operators.SampleOps.ksFromCounts(
        s.createDataFrame(grid.rdd, grid.schema))
    }),

    // ST13 (extension) — INCREMENTAL LAKE INGEST with Trigger.AvailableNow
    // + a durable checkpoint: the "process whatever landed, then stop"
    // batch-of-streams idiom that replaces cron-batch ingestion. Two
    // physical runs: run 1 ingests the even-doc slice, run 2 starts a NEW
    // query against the SAME checkpoint after the odd slice lands — the
    // file-source log makes run 2 read ONLY the new files (incremental
    // cost = new data, exactly-once progress), while the state store
    // carries the per-lang aggregate across runs. The converged result
    // must equal the one-shot batch aggregate — counts are associative,
    // so ANY ingest slicing converges identically, which is what lets a
    // plain batch oracle pin a two-run streaming pipeline.
    "st13_availablenow_ingest" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val base = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_st13_${ProcessHandle.current.pid}_${dir.hashCode}").getPath
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
      val data = s"$base/data"
      val name = s"graft_stream_${nameSeq.incrementAndGet()}"
      val docs = Tables.documents(s, dir).select("doc_id", "lang", "n_chars")
      val saved = s.conf.get("spark.sql.shuffle.partitions")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        def runOnce(): Unit = {
          val q = s.readStream.schema(docs.schema).parquet(data)
            .groupBy("lang")
            .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
            .writeStream.outputMode("complete").format("memory")
            .queryName(name)
            .option("checkpointLocation", s"$base/ckpt")
            .trigger(Trigger.AvailableNow())
            .start()
          try q.awaitTermination() finally q.stop()
        }
        docs.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(data)
        runOnce()
        docs.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(data)
        runOnce()
      } finally s.conf.set("spark.sql.shuffle.partitions", saved)
      s.table(name)
    }),

    // ST14 (extension) — STREAMING DECONTAMINATION at ingest: the
    // exact-hash arm of ds14/ds7 applied before data ever lands. New
    // documents stream in; any doc whose content hash appears in the
    // STATIC reference set (the even-doc half here; in production the
    // benchmark/eval corpus) is dropped by a stream-static LEFT ANTI
    // join. Stateless on the stream side — no watermark, no store: each
    // micro-batch is a broadcast-hash anti probe, so the converged
    // output equals the batch anti-join under ANY slicing, which is what
    // lets the batch oracle pin a streaming admission filter.
    "st14_stream_decontam" -> ((s, dir) => {
      val ref = Tables.documents(s, dir)
        .filter(col("doc_id") % 2 === 0)
        .select(md5(col("text")).as("h")).distinct()
      val stream = Tables.documentsStream(s, dir)
        .filter(col("doc_id") % 2 === 1)
        .withColumn("h", md5(col("text")))
      runToTable(s,
        stream.join(ref, Seq("h"), "left_anti").select("doc_id", "lang"),
        "append")
    })
  )

  def oracles: Map[String, String] = Map(
    // window() aligns to epoch-hour boundaries == date_trunc('hour')
    "st1_stream_monitor_agg" -> Sql.query(Sql.monitor)(
      """SELECT date_trunc('hour', ts) AS hour, tile_id,
        |       COUNT(*) AS n, MAX(mem_rss) AS mem_peak
        |FROM monitor GROUP BY date_trunc('hour', ts), tile_id""".stripMargin),

    "st3_stream_dedup" ->
      "SELECT DISTINCT user_id FROM events",

    "st4_stream_dedup_watermark" ->
      "SELECT DISTINCT user_id, event_type FROM events",

    // the observe() node is metrics-only — it must not change the data
    "st11_stream_observe" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE n_chars >= 200
        |GROUP BY lang""".stripMargin,

    // st12 must converge to the batch ds15 answer — same oracle
    "st12_stream_drift" -> graft.operators.SampleOps.ksOracleSql,

    // st14: the streamed admission filter must equal the batch anti-join
    "st14_stream_decontam" ->
      """SELECT doc_id, lang FROM documents
        |WHERE doc_id % 2 = 1
        |  AND md5(text) NOT IN
        |      (SELECT md5(text) FROM documents WHERE doc_id % 2 = 0)""".stripMargin,

    // st13: slicing-independent — the two-run AvailableNow ingest must
    // land on the one-shot batch aggregate
    "st13_availablenow_ingest" ->
      """SELECT lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY lang""".stripMargin,

    // batch-boundary-free: the converged snapshot is the latest state
    // per user no matter how the stream was sliced into micro-batches
    "st10_stream_upsert" ->
      """SELECT user_id, value, ts FROM (
        |  SELECT user_id, value, ts,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1""".stripMargin,

    "pp2_stream_ingest" ->
      """SELECT DISTINCT md5(text) AS text_hash
        |FROM documents
        |WHERE len(list_filter(string_split(text, ' '), w -> w <> '')) >= 10
        |  AND len(list_filter(string_split(text, ' '),
        |          w -> w IN ('the', 'a', 'data', 'value'))) /
        |      len(list_filter(string_split(text, ' '), w -> w <> '')) < 0.5""".stripMargin,

    "st2_stream_peak_state" -> Sql.query(Sql.monitor)(
      "SELECT tile_id, MAX(mem_rss) AS mem_peak FROM monitor GROUP BY tile_id"),

    "st8_stream_stream_join" ->
      """SELECT c.event_id AS c_id, p.event_id AS p_id
        |FROM events c JOIN events p
        |  ON c.event_type = 'click' AND p.event_type = 'purchase'
        | AND p.user_id = c.user_id
        | AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 30 MINUTE""".stripMargin,

    "st7_foreachbatch_sink" -> Sql.query(Sql.monitor)(
      "SELECT event_id, tile_id, mem_rss FROM monitor"),

    "st5_stream_static_join" -> Sql.query(Sql.monitor, Sql.boundaries)(
      """SELECT m.event_id, m.tile_id, b.border, m.mem_rss
        |FROM monitor m JOIN boundaries b USING (tile_id)""".stripMargin),

    "st9_session_append" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   > INTERVAL 6 HOUR OR
        |              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start,
        |       MAX(ts) + INTERVAL 6 HOUR AS session_end,
        |       COUNT(*) AS n_events
        |FROM sessions GROUP BY user_id, sess_id
        |HAVING MAX(ts) + INTERVAL 6 HOUR <=
        |       (SELECT MAX(ts) FROM events) - INTERVAL 1 HOUR""".stripMargin,

    // session_window == gaps-and-islands: a session break is a >6h gap;
    // window end = last event + gap
    "st6_session_windows" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   > INTERVAL 6 HOUR OR
        |              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts, value,
        |         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                        ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM flagged)
        |SELECT user_id, MIN(ts) AS session_start,
        |       MAX(ts) + INTERVAL 6 HOUR AS session_end,
        |       COUNT(*) AS n_events,
        |       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
        |         AS sum_value
        |FROM sessions GROUP BY user_id, sess_id""".stripMargin
  )
}
