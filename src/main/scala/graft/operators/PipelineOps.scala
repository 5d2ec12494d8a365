package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.OpModule
import graft.model.TileGrid
import graft.sources.{Sql, Tables}

/** Composition layer: the SQL front door and the full training-data
  * pipeline assembled from the individual operators. */
object PipelineOps extends OpModule {

  /** Binned point-in-interval join core (w7): counts `c_ts` points in
    * [p_ts, p_ts + 30 min) per interval row, including zero-point
    * intervals. Cell width equals the window width, so every interval
    * covers at most 2 cells (exploded to both) and every point exactly 1
    * — candidate generation is a pure equi-join on the cell id, and each
    * qualifying pair arises exactly once (a point's single cell is one
    * of the window's two; no distinct pass). Sub-second timestamps are
    * safe: binning truncates to seconds but the residual compares full
    * timestamps, and a window starting at fractional second X.f still
    * only reaches cells floor(X/w) and floor(X/w)+1 (lemma
    * property-tested in PropertySpec over µs-jittered inputs).
    * `p` must have columns (p_event_id, p_ts); `c` must have (c_ts). */
  def binnedWindowCounts(p: DataFrame, c: DataFrame): DataFrame = {
    def cellOf(t: org.apache.spark.sql.Column) =
      floor(unix_timestamp(t) / 1800L)
    val pb = p.withColumn("cell",
      explode(array(cellOf(col("p_ts")), cellOf(col("p_ts")) + 1)))
    val cb = c.withColumn("cell", cellOf(col("c_ts")))
    val counts = pb.join(cb, Seq("cell"))
      .filter(col("c_ts") >= col("p_ts") &&
        col("c_ts") < col("p_ts") + expr("INTERVAL 30 MINUTES"))
      .groupBy("p_event_id").agg(count(lit(1)).as("n_clicks"))
    p.select("p_event_id").join(counts, Seq("p_event_id"), "left")
      .select(col("p_event_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // SQL front door: the reference's native interface is composed SQL
    // (tileconfig.py everywhere); spark.sql over registered views runs
    // the same text-form queries against the same relations
    "v1_sql_frontend" -> ((s, _) => {
      import TileGrid._
      Tables.boundaries(s).createOrReplaceTempView("boundaries_v")
      s.sql(
        s"""SELECT tile_id FROM boundaries_v
           |WHERE xmin <= $ExtentXMax AND xmax >= $ExtentXMin
           |  AND ymin <= $ExtentYMax AND ymax >= $ExtentYMin""".stripMargin)
    }),

    // the reference's J4 query shape pasted AS SQL: ST_Relate + ST_Covers
    // through the injected spatial functions (tileconfig.py:587-593) —
    // proves a reference user can run their coverage query text against
    // this engine's SQL frontend with only the geometry-model rename.
    // Must produce exactly j4_relate_coverage's rows.
    "v2_sql_relate" -> ((s, _) => {
      import s.implicits._
      graft.functions.RectRelate.register(s)
      Tables.boundaries(s).createOrReplaceTempView("boundaries_v")
      TileGrid.uTiles.toDF().createOrReplaceTempView("u_tiles_v")
      s.sql(
        """WITH vcov AS (
          |  SELECT version AS v, MIN(xmin) AS uxmin, MIN(ymin) AS uymin,
          |         MAX(xmax) AS uxmax, MAX(ymax) AS uymax
          |  FROM boundaries_v GROUP BY version),
          |ft AS (
          |  SELECT tile_id, xmin, ymin, xmax, ymax FROM boundaries_v
          |  UNION ALL
          |  SELECT u_id, xmin, ymin, xmax, ymax FROM u_tiles_v)
          |SELECT v.v AS version, f.tile_id,
          |       CASE WHEN st_covers_rect(v.uxmin, v.uymin, v.uxmax, v.uymax,
          |                                f.xmin, f.ymin, f.xmax, f.ymax)
          |            THEN 'covers' ELSE 'relate' END AS matched_by
          |FROM vcov v, ft f
          |WHERE st_relate_rect(v.uxmin, v.uymin, v.uxmax, v.uymax,
          |                     f.xmin, f.ymin, f.xmax, f.ymax, '212101212')
          |   OR st_covers_rect(v.uxmin, v.uymin, v.uxmax, v.uymax,
          |                     f.xmin, f.ymin, f.xmax, f.ymax)""".stripMargin)
    }),

    // dd1's exact-dedup semantics pasted AS SQL through the injected
    // `h60` function (GraftExtensions / Hash60.register): the portable
    // content hash is a first-class SQL citizen, so a user's dedup
    // query TEXT runs unchanged — and binds the same codegen'd
    // Expression the Column API uses (equality pinned in PropertySpec).
    "v3_sql_dedup" -> ((s, dir) => {
      graft.functions.Hash60.register(s)
      Tables.documents(s, dir).createOrReplaceTempView("documents_v3")
      s.sql(
        """SELECT lang, COUNT(*) AS n_docs,
          |       COUNT(DISTINCT h60(concat('v3:', text))) AS n_distinct
          |FROM documents_v3
          |GROUP BY lang
          |ORDER BY lang""".stripMargin)
    }),

    // V5 (extension) — the as-of join through the SQL FRONT DOOR: w6's
    // union-window formulation as pasteable Spark SQL (window `last(x,
    // true)` carries the most recent click forward per user). Proves the
    // one-shuffle as-of shape survives the SQL parser/optimizer intact —
    // same oracle as w6 (DuckDB's native ASOF LEFT JOIN), so all THREE
    // routes (Column API, Spark SQL text, DuckDB ASOF) must agree row
    // for row.
    "v5_sql_asof" -> ((s, dir) => {
      Tables.events(s, dir).createOrReplaceTempView("events_v5")
      s.sql(
        """WITH clicks0 AS (
          |  SELECT user_id, ts, MAX(event_id) AS c_event_id
          |  FROM events_v5 WHERE event_type = 'click' GROUP BY user_id, ts),
          |clicks AS (
          |  SELECT c0.user_id, c0.ts, 0 AS tag, c0.c_event_id,
          |         e.value AS c_value, CAST(NULL AS BIGINT) AS p_event_id
          |  FROM clicks0 c0 JOIN events_v5 e ON e.event_id = c0.c_event_id),
          |purchases AS (
          |  SELECT user_id, ts, 1 AS tag, CAST(NULL AS BIGINT) AS c_event_id,
          |         CAST(NULL AS DOUBLE) AS c_value, event_id AS p_event_id
          |  FROM events_v5 WHERE event_type = 'purchase'),
          |u AS (SELECT * FROM clicks UNION ALL SELECT * FROM purchases),
          |m AS (SELECT *,
          |        last(c_event_id, true) OVER (
          |          PARTITION BY user_id ORDER BY ts, tag
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_id,
          |        last(c_value, true) OVER (
          |          PARTITION BY user_id ORDER BY ts, tag
          |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_val
          |      FROM u)
          |SELECT p_event_id, user_id, m_id AS c_event_id, m_val AS c_value
          |FROM m WHERE tag = 1""".stripMargin)
    }),

    // as-of join (beyond-reference training-pipeline op): each purchase
    // matched to the user's most recent prior-or-simultaneous click.
    // Implementation is the scalable union-window form — tag both
    // streams, one window pass per user carrying the last click forward —
    // a single shuffle on user_id, no range join blowup. The oracle is
    // DuckDB's native ASOF LEFT JOIN: an independent algorithm that must
    // produce the identical matching.
    "w6_asof_join" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
      // dedup clicks to one per (user, ts) so the as-of pick is unique
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("c_event_id"))
        .join(ev.select(col("event_id").as("c_event_id"),
          col("value").as("c_value")), Seq("c_event_id"))
        .select(col("user_id"), col("ts"), lit(0).as("tag"),
          col("c_event_id"), col("c_value"),
          lit(null).cast("bigint").as("p_event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("tag"),
          lit(null).cast("bigint").as("c_event_id"),
          lit(null).cast("double").as("c_value"),
          col("event_id").as("p_event_id"))
      val w = Window.partitionBy("user_id").orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("m_id", last("c_event_id", ignoreNulls = true).over(w))
        .withColumn("m_val", last("c_value", ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("p_event_id"), col("user_id"),
          col("m_id").as("c_event_id"), col("m_val").as("c_value"))
    }),

    // temporal RANGE JOIN (beyond-reference training-pipeline op): count
    // all clicks (any user) inside each purchase's 30-minute attribution
    // window. Spark has no range-join optimizer: the naive theta form
    // becomes a broadcast-nested-loop over |purchases|×|clicks|. The
    // scale form bins time into cells of exactly the window width: every
    // window covers ≤ 2 cells (explode to both), every point exactly 1,
    // so candidate generation is a pure EQUI-join shuffle on the cell id
    // and the residual BETWEEN touches only same-cell pairs — the
    // temporal twin of j10's binned spatial join. Each qualifying pair
    // is matched exactly once (a point's single cell is one of the
    // window's two), so no distinct pass is needed. The oracle is
    // DuckDB's native IEJoin range join — an independent algorithm.
    "w7_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      binnedWindowCounts(
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("p_event_id"), col("ts").as("p_ts")),
        ev.filter(col("event_type") === "click")
          .select(col("ts").as("c_ts")))
    }),

    // W12 (extension) — AS-OF join WITH TOLERANCE (pandas merge_asof
    // tolerance= / kdb wj semantics): each purchase takes the latest
    // preceding click of the same user ONLY if it is at most 10 minutes
    // stale; older matches are dropped to NULL, exactly like a feature
    // store refusing features past their freshness SLA. Same union +
    // per-user window sweep as w6 (one shuffle on user_id, no
    // purchase×click pair relation); the tolerance is a post-window
    // column gate in exact integer microseconds, so the engines can
    // never disagree on a boundary. Oracle: DuckDB's native ASOF join
    // with the staleness CASE applied on top — an independent algorithm.
    "w12_asof_tolerance" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val TolUs = 600000000L // 10 min
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max("event_id").as("c_event_id"))
        .select(col("user_id"), col("ts"), lit(0).as("tag"),
          col("c_event_id"), lit(null).cast("bigint").as("p_event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("tag"),
          lit(null).cast("bigint").as("c_event_id"),
          col("event_id").as("p_event_id"))
      val w = Window.partitionBy("user_id").orderBy("ts", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.unionByName(purchases)
        .withColumn("m_id", last("c_event_id", ignoreNulls = true).over(w))
        .withColumn("m_ts", last(when(col("tag") === 0, col("ts")),
          ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .withColumn("stale_us", unix_micros(col("ts")) - unix_micros(col("m_ts")))
        .select(col("p_event_id"), col("user_id"),
          when(col("stale_us") <= TolUs, col("m_id")).as("c_event_id"),
          when(col("stale_us") <= TolUs, col("stale_us")).as("staleness_us"))
    }),

    // doc-level embedding pipeline: documents ⋈ embeddings → quality
    // gate → IVF assignment (nearest shared centroid, broadcast) →
    // per-(lang, list) corpus profile. The index-build/assign/profile
    // flow of an embedding-curation job: centroids are the nn4 coarse
    // quantizer built over the FULL corpus (the offline index), only
    // gated docs are assigned. At 100 TB the centroid table is O(nlists)
    // — collected to ONE broadcast row of (label, centroid) structs —
    // and assignment is a genuinely map-side argmax (array_max over the
    // per-row scored array; no per-doc window, no doc_id exchange), so
    // the only corpus-wide shuffle is the final profile group-by.
    // Negating the label inside the max struct makes ties (csim DESC,
    // label ASC) match the oracle's ROW_NUMBER ordering.
    "pp3_embed_pipeline" -> ((s, dir) => {
      val e = SimilarityOps.emb(s, dir)
      val gated = Tables.documents(s, dir).filter(col("n_chars") >= 200)
        .join(e, col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("lang"), col("emb"))
      val centArr = SimilarityOps.centroids(e)
        .agg(collect_list(struct(col("label"), col("centroid"))).as("cents"))
      gated.crossJoin(broadcast(centArr))
        .withColumn("best", expr(
          "array_max(transform(cents, c -> " +
          "struct(vector_dot(emb, c.centroid) AS csim, -c.label AS nl)))"))
        .select(col("lang"), (-col("best.nl")).as("c_label"),
          col("best.csim").as("csim"))
        .groupBy("lang", "c_label")
        .agg(count(lit(1)).as("n_docs"),
          // csim is a full-precision double: avg must sum in decimal to
          // be order-independent — see Exact.decAvg
          Exact.decAvg(col("csim"), 6).as("avg_sim"))
    }),

    // batch sessionization — lag-break + cumulative-sum session ids,
    // the batch twin of st6's streaming session_window (and a third
    // independent algorithm against the same gaps-and-islands oracle:
    // streaming merge-on-touch, batch window composition, and DuckDB
    // islands must all agree). Two window passes + the rollup, all
    // partitioned on user_id — one shuffle, no global sort. Ties at
    // equal ts are order-safe: a zero gap never breaks a session, so
    // the session assignment is deterministic regardless of tie order.
    "w8_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .withColumn("prev", lag("ts", 1).over(w))
        .withColumn("brk", when(col("prev").isNull ||
          col("ts") > col("prev") + expr("INTERVAL 6 HOURS"), 1).otherwise(0))
        .withColumn("sess_id", sum("brk").over(cum))
        .groupBy("user_id", "sess_id")
        .agg(min("ts").as("session_start"),
          (max("ts") + expr("INTERVAL 6 HOURS")).as("session_end"),
          count(lit(1)).as("n_events"))
        .select("user_id", "session_start", "session_end", "n_events")
    }),

    // end-to-end pipeline: quality filter → near-dup removal → split
    // assignment → per-split/lang counts. Each stage is the registered
    // operator's logic; this query proves they compose.
    "pp1_training_pipeline" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // stage 1: quality gate (tx2 semantics) over the SHARED token
      // relation — the same persisted frame tx1-tx3 aggregate, so the
      // pipeline never re-explodes the corpus
      val toks = TextOps.tokens(s, dir)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("w").isin("the", "a", "data", "value"), 1).otherwise(0)).as("n_stop"))
      val quality = docs.join(toks, Seq("doc_id"))
        .filter(col("n_tokens") >= 10 && col("n_stop") / col("n_tokens") < 0.5)
      // stage 2: drop LSH+Jaccard-verified near-dups (dd6 keep list)
      val keep = DedupOps.queries("dd6_dedup_filter")(s, dir)
      val deduped = quality.join(keep, Seq("doc_id"), "left_semi")
      // stage 3: deterministic split assignment (ds3 semantics)
      deduped
        .withColumn("bucket", DedupOps.h60("spl:", col("text")) % 100)
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val").otherwise("test"))
        .groupBy("split", "lang").agg(count(lit(1)).as("n"))
    }),

    // pp4 — the FULL modern curation pipeline as one declarative DAG:
    // quality gate → TRANSITIVE dedup (dd9 components: keep each
    // cluster's min-id doc, not dd6's pairwise drop) → split assignment
    // → test-split decontamination against the surviving train side
    // (ds7) → per-split doc/token report. Every corpus-wide relation
    // (tokens, shingles, bands) is the shared Cached frame the
    // individual operators use, so the pipeline adds joins, not
    // re-scans. The stages are exactly ds3/ds7/dd9/tx2's registered
    // semantics — this query proves they COMPOSE.
    "pp4_curation_pipeline" -> ((s, dir) => {
      val tk = TextOps.tokens(s, dir)
        .groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
      // transitive dedup: drop every clustered doc except its keeper
      // (the shared per-session component relation — dd9's computation)
      val dupDrops = DedupOps.components(s, dir)
        .filter(col("doc_id") =!= col("component"))
        .select("doc_id")
      // kept0 and the band tagging feed three downstream joins each —
      // persist once per (session, dir) instead of re-deriving per use
      // (released with every other shared relation by the harness)
      val kept0 = graft.sources.Cached.of(s, s"pp4:kept0:$dir") {
        Tables.documents(s, dir)
          .join(tk, Seq("doc_id"))
          .filter(col("n_tokens") >= 10)
          .join(dupDrops, Seq("doc_id"), "left_anti")
          .withColumn("b", DedupOps.h60("spl:", col("text")) % 100)
          .withColumn("split",
            when(col("b") < 80, "train")
              .when(col("b") < 90, "val").otherwise("test"))
          .select("doc_id", "split", "n_tokens")
      }
      // decontaminate test against the SURVIVING train side
      val bands = graft.sources.Cached.of(s, s"pp4:bands:$dir")(
        DedupOps.lshBands(s, dir).join(kept0, Seq("doc_id")))
      val trainB = bands.filter(col("split") === "train")
        .select("band", "bkey").distinct()
      val cont = bands.filter(col("split") === "test")
        .join(trainB, Seq("band", "bkey"), "left_semi")
        .select("doc_id").distinct()
      kept0.join(cont, Seq("doc_id"), "left_anti")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
    }),

    // PP5 (extension) — INCREMENTAL curation: the daily-increment form
    // of pp4, scanning ONLY the new batch (doc_id % 10 >= 8). Quality
    // gate (map-side length rule) → near-dup probe against the PERSISTED
    // corpus band index (dd13's batch-proportional join — never
    // corpus×corpus) → hash-split of the admitted docs. Output is the
    // per-split admission ledger. This is the steady-state cost model of
    // a production corpus: after the initial build, every day pays for
    // its batch, not for history.
    "pp5_incremental_curation" -> ((s, dir) => {
      val bands = DedupOps.cappedLshBands(s, dir)
      val dupNew = bands.filter(DedupOps.isNewBatch(col("doc_id")))
        .join(bands.filter(DedupOps.isCorpus(col("doc_id")))
          .select("band", "bkey"), Seq("band", "bkey"), "left_semi")
        .select("doc_id").distinct()
      Tables.documents(s, dir)
        .filter(DedupOps.isNewBatch(col("doc_id")) && col("n_chars") >= 100)
        .join(dupNew, Seq("doc_id"), "left_anti")
        .withColumn("b", DedupOps.h60("spl:", col("text")) % 100)
        .withColumn("split",
          when(col("b") < 80, "train")
            .when(col("b") < 90, "val").otherwise("test"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"))
        .orderBy("split")
    }),

    // pp6 — SEQUENCE PACKING: the tokenize-and-pack step every LLM
    // training pipeline runs between curation and the data loader.
    // Semantics are the standard concat-and-cut: documents concatenated
    // in doc_id order into one global token stream, cut every B=512
    // tokens; each doc's ledger row reports its token span and the
    // pack(s) it lands in (a doc crossing a cut boundary spans two).
    // The whole computation reduces to one EXACT GLOBAL PREFIX SUM of
    // per-doc token counts — and a naive `sum().over(Window.orderBy)`
    // puts the entire corpus in ONE window partition, the same
    // single-reducer scale-killer ds13 avoids. Same distributed-exact
    // plan here: (1) repartitionByRange on doc_id (contiguous ranges),
    // (2) per-RANGE-PARTITION running sum (well-distributed window key),
    // (3) per-partition totals -> prefix-sum offsets (|partitions| rows,
    // the only serial step, broadcast back). tok_start = offset + local
    // running sum, exact at any scale. Token rule shared with tx3
    // (whitespace split, empties dropped).
    "pp6_sequence_pack" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val B = 512L
      // |range partitions| = Layout.buckets (knob-or-cores): the offsets
      // relation is |partitions| rows (the only serial step), so it
      // tracks the cluster, not the corpus; the result is partition-
      // count-invariant (PipelineOpsSpec pins equality with the naive
      // form).
      val parts = graft.model.Layout.buckets(s)
      // null text packs as 0 tokens (the explode-based tokens() rule);
      // without the guard, size(split(NULL)) is NULL under default
      // sizeOfNull (and -1 under the legacy flag) — either way a single
      // NULL doc would poison every later tok_start in the running sum,
      // so the explicit 0 covers both settings and matches the oracle's
      // COALESCE
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        when(col("text").isNull, 0L)
          .otherwise(size(filter(split(col("text"), " "), w => w =!= ""))
            .cast("long")).as("n_tokens"))
      val ranged = docs.repartitionByRange(parts, col("doc_id"))
        .withColumn("pid", spark_partition_id())
      // Unpartitioned window BY DESIGN: |partitions| rows, never corpus
      // rows (the bounded-window argument ds13 documents).
      val offW = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
      val offsets = ranged.groupBy("pid").agg(sum("n_tokens").as("toks"))
        .withColumn("off", coalesce(sum("toks").over(offW), lit(0L)))
        .select("pid", "off")
      val localW = Window.partitionBy("pid").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      ranged
        .withColumn("local_before",
          coalesce(sum("n_tokens").over(localW), lit(0L)))
        .join(broadcast(offsets), Seq("pid"))
        .withColumn("tok_start", col("off") + col("local_before"))
        .withColumn("first_pack", expr(s"tok_start div $B"))
        // a zero-token doc stays in its start pack (greatest guards the
        // tok_start-on-a-boundary corner where start-1 div B dips back)
        .withColumn("last_pack", greatest(col("first_pack"),
          expr(s"(tok_start + n_tokens - 1) div $B")))
        .select(col("doc_id"), col("n_tokens"), col("tok_start"),
          col("first_pack"), col("last_pack"),
          (col("last_pack") - col("first_pack") + 1L).as("n_packs"))
    })
  )

  /** w6/v5's shared oracle — DuckDB's native ASOF LEFT JOIN, an
    * independent algorithm both Spark routes must reproduce exactly. */
  private val asofOracleSql: String =
    """WITH clicks0 AS (
      |  SELECT user_id, ts, MAX(event_id) AS c_event_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      |clicks AS (
      |  SELECT c0.user_id, c0.ts, c0.c_event_id, e.value AS c_value
      |  FROM clicks0 c0 JOIN events e ON e.event_id = c0.c_event_id),
      |purchases AS (
      |  SELECT event_id AS p_event_id, user_id, ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.p_event_id, p.user_id, c.c_event_id, c.c_value
      |FROM purchases p
      |ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  def oracles: Map[String, String] = Map(
    // pp5: the same batch-proportional probe + gate + split, recomposed
    // from the capped-band CTE chain
    "pp5_incremental_curation" -> Sql.query(
      (DedupOps.cappedLshCtes :+
        s"""dup_new AS (
           |  SELECT DISTINCT n.doc_id
           |  FROM cbands n JOIN cbands c
           |    ON n.band = c.band AND n.bkey = c.bkey
           |  WHERE ${DedupOps.newBatchSql("n.doc_id")}
           |    AND ${DedupOps.corpusSql("c.doc_id")})""".stripMargin :+
        s"""kept AS (
           |  SELECT doc_id, n_chars,
           |         ${DedupOps.h60Sql("spl:", "text")} % 100 AS b
           |  FROM documents
           |  WHERE ${DedupOps.newBatchSql("doc_id")} AND n_chars >= 100
           |    AND doc_id NOT IN (SELECT doc_id FROM dup_new))""".stripMargin): _*)(
      """SELECT CASE WHEN b < 80 THEN 'train'
        |            WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
        |       COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM kept GROUP BY 1 ORDER BY split""".stripMargin),

    // pp6: the same concat-and-cut ledger, spelled as DuckDB's single
    // global window cumsum (the single-node engine CAN afford the
    // global window; the Spark side must reproduce it exactly without
    // one). Token rule matches tokensSql: whitespace split, '' dropped.
    "pp6_sequence_pack" -> Sql.query(
      """toks AS (
        |  SELECT doc_id,
        |         CAST(COALESCE(len(list_filter(string_split(text, ' '),
        |                                       x -> x <> '')), 0) AS BIGINT) AS n_tokens
        |  FROM documents)""".stripMargin,
      """spans AS (
        |  SELECT doc_id, n_tokens,
        |         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) AS tok_start
        |  FROM toks)""".stripMargin)(
      """SELECT doc_id, n_tokens, CAST(tok_start AS BIGINT) AS tok_start,
        |       CAST(tok_start // 512 AS BIGINT) AS first_pack,
        |       CAST(GREATEST(tok_start // 512,
        |            (tok_start + n_tokens - 1) // 512) AS BIGINT) AS last_pack,
        |       CAST(GREATEST(tok_start // 512,
        |            (tok_start + n_tokens - 1) // 512)
        |            - tok_start // 512 + 1 AS BIGINT) AS n_packs
        |FROM spans""".stripMargin),

    "v1_sql_frontend" -> Sql.query(Sql.boundaries)(
      s"""SELECT tile_id FROM boundaries
         |WHERE xmin <= ${TileGrid.ExtentXMax} AND xmax >= ${TileGrid.ExtentXMin}
         |  AND ymin <= ${TileGrid.ExtentYMax} AND ymax >= ${TileGrid.ExtentYMin}""".stripMargin),

    // same ground truth as the DataFrame formulation: the oracle is the
    // independently-derived closed decomposition of the pattern
    "v2_sql_relate" -> JoinOps.oracles("j4_relate_coverage"),

    "v3_sql_dedup" ->
      s"""SELECT lang, COUNT(*) AS n_docs,
         |       COUNT(DISTINCT ${DedupOps.h60Sql("v3:", "text")}) AS n_distinct
         |FROM documents
         |GROUP BY lang
         |ORDER BY lang""".stripMargin,

    "w6_asof_join" -> asofOracleSql,

    // v5: the SQL-front-door as-of must match the same native ASOF oracle
    "v5_sql_asof" -> asofOracleSql,

    "w12_asof_tolerance" ->
      """WITH clicks0 AS (
        |  SELECT user_id, ts, MAX(event_id) AS c_event_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
        |purchases AS (
        |  SELECT event_id AS p_event_id, user_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |matched AS (
        |  SELECT p.p_event_id, p.user_id, c.c_event_id,
        |         epoch_us(p.ts) - epoch_us(c.ts) AS stale_us
        |  FROM purchases p
        |  ASOF LEFT JOIN clicks0 c
        |    ON p.user_id = c.user_id AND p.ts >= c.ts)
        |SELECT p_event_id, user_id,
        |       CASE WHEN stale_us <= 600000000 THEN c_event_id END
        |         AS c_event_id,
        |       CASE WHEN stale_us <= 600000000 THEN stale_us END
        |         AS staleness_us
        |FROM matched""".stripMargin,

    "w7_range_join" ->
      """WITH p AS (SELECT event_id AS p_event_id, ts AS p_ts
        |           FROM events WHERE event_type = 'purchase'),
        |     c AS (SELECT ts AS c_ts FROM events WHERE event_type = 'click')
        |SELECT p.p_event_id, COUNT(c.c_ts) AS n_clicks
        |FROM p LEFT JOIN c
        |  ON c.c_ts >= p.p_ts AND c.c_ts < p.p_ts + INTERVAL 30 MINUTE
        |GROUP BY p.p_event_id""".stripMargin,

    "pp3_embed_pipeline" -> Sql.query(SimilarityOps.embSql,
      SimilarityOps.centSql,
      """gated AS (
        |  SELECT d.doc_id, d.lang, e.emb
        |  FROM documents d JOIN emb e ON e.vec_id = d.doc_id
        |  WHERE d.n_chars >= 200)""".stripMargin,
      """scored AS (
        |  SELECT g.doc_id, g.lang, c.label AS c_label,
        |         list_dot_product(g.emb, c.centroid) AS csim,
        |         ROW_NUMBER() OVER (PARTITION BY g.doc_id
        |           ORDER BY list_dot_product(g.emb, c.centroid) DESC,
        |                    c.label) AS rn
        |  FROM gated g CROSS JOIN cent c)""".stripMargin)(
      """SELECT lang, c_label, COUNT(*) AS n_docs,
        |       ROUND(CAST(ROUND(SUM(CAST(csim AS DECIMAL(28,12))), 8) AS DOUBLE)
        |             / COUNT(*), 6) AS avg_sim
        |FROM scored WHERE rn = 1
        |GROUP BY lang, c_label""".stripMargin),

    "w8_sessionize" ->
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
        |FROM sessions GROUP BY user_id, sess_id""".stripMargin,

    "pp1_training_pipeline" -> {
      // reuse dd6's CTE chain for the keep list, then apply the quality
      // gate and split assignment on top
      val dd6 = DedupOps.oracles("dd6_dedup_filter")
      val keepCtes = dd6.stripPrefix("WITH ").split("\nSELECT doc_id FROM documents")(0)
      s"""WITH $keepCtes,
         |toks AS (
         |  SELECT doc_id, COUNT(*) AS n_tokens,
         |         SUM(CASE WHEN w IN ('the','a','data','value') THEN 1 ELSE 0 END) AS n_stop
         |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents) t
         |  WHERE w <> '' GROUP BY doc_id),
         |kept AS (
         |  SELECT d.doc_id, d.text, d.lang
         |  FROM documents d
         |  JOIN toks t USING (doc_id)
         |  WHERE t.n_tokens >= 10 AND t.n_stop / t.n_tokens < 0.5
         |    AND d.doc_id NOT IN (SELECT doc_id FROM drops))
         |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |       lang, COUNT(*) AS n
         |FROM (SELECT lang,
         |             ${DedupOps.h60Sql("spl:", "text")} % 100 AS b
         |      FROM kept) k
         |GROUP BY 1, 2""".stripMargin
    },

    // independent recomposition: recursive-CTE components (dd9's oracle
    // algorithm) + the ds3/ds7 split/decontamination SQL, chained
    "pp4_curation_pipeline" ->
      s"""WITH RECURSIVE
         |${TextOps.tokensSql},
         |tk AS (SELECT doc_id, COUNT(*) AS n_tokens FROM tokens GROUP BY doc_id),
         |${DedupOps.lshCtes.mkString(",\n")},
         |${DedupOps.cappedLshCtes.drop(1).mkString(",\n")},
         |${DedupOps.cappedPairsSql},
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM cpairs
         |  UNION ALL SELECT doc_b, doc_a FROM cpairs),
         |reach AS (
         |  SELECT src AS a, dst AS b FROM edges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
         |dup_drops AS (
         |  SELECT a AS doc_id FROM reach GROUP BY a
         |  HAVING LEAST(a, MIN(b)) <> a),
         |kept0 AS (
         |  SELECT d.doc_id,
         |         CASE WHEN ${DedupOps.h60Sql("spl:", "d.text")} % 100 < 80
         |              THEN 'train'
         |              WHEN ${DedupOps.h60Sql("spl:", "d.text")} % 100 < 90
         |              THEN 'val' ELSE 'test' END AS split,
         |         tk.n_tokens
         |  FROM documents d JOIN tk USING (doc_id)
         |  WHERE tk.n_tokens >= 10
         |    AND d.doc_id NOT IN (SELECT doc_id FROM dup_drops)),
         |kb AS (
         |  SELECT b.doc_id, b.band, b.bkey, k.split
         |  FROM bands b JOIN kept0 k USING (doc_id)),
         |trainb AS (SELECT DISTINCT band, bkey FROM kb WHERE split = 'train'),
         |cont AS (
         |  SELECT DISTINCT kb.doc_id
         |  FROM kb JOIN trainb t ON kb.band = t.band AND kb.bkey = t.bkey
         |  WHERE kb.split = 'test')
         |SELECT split, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
         |FROM kept0
         |WHERE doc_id NOT IN (SELECT doc_id FROM cont)
         |GROUP BY split""".stripMargin
  )
}
