package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.OpModule
import graft.model.TileGrid
import graft.sources.{Cached, Sql, Tables}

/** Join suite J1-J8 (SURVEY §2.4).
  *
  * Scale stance: the tile index / border / file-index sides are small
  * dimensions — always `broadcast()`ed, so the big feature/lineitem side
  * never shuffles for them. The one genuinely large-large join (J1,
  * lineitem ⋈ feature index) is left to Catalyst/AQE: at 100 TB it
  * becomes a sort-merge join on the key both sides are already
  * partitioned by. Theta joins (J3/J4) are broadcast-nested-loop over
  * 16-row envelopes — the honest mapping of the reference's per-tile
  * PostGIS calls (SURVEY §2.4 note).
  */
object JoinOps extends OpModule {
  import TileGrid.{ExtentXMin, ExtentYMin, ExtentXMax, ExtentYMax}

  /** Codegen'd scan-side bloom probe: wraps a serialized
    * `org.apache.spark.util.sketch.BloomFilter` in Spark's own
    * `BloomFilterMightContain` — the expression the optimizer's
    * InjectRuntimeFilter rule plants for exactly this semi-join
    * reduction. `might_contain` is not in the public function registry
    * (it is internal to the runtime-filter rewrite), so the Column is
    * built through [[org.apache.spark.sql.GraftColumnBridge]]; the
    * sketch bytes are a foldable Literal, which is the same way the
    * built-in rule delivers its materialized subquery result to the
    * scan. */
  private[graft] def mightContain(bf: org.apache.spark.util.sketch.BloomFilter,
      key: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    GraftColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.Literal(
          out.toByteArray, org.apache.spark.sql.types.BinaryType),
        GraftColumnBridge.expression(key)))
  }

  /** The j12 probe with its degenerate case handled: an EMPTY build side
    * cannot produce a sketch (stat.bloomFilter's aggregate yields null
    * bytes and BloomFilter.readFrom NPEs), and the correct semantics are
    * "nothing can match" — a constant-false filter, which Catalyst folds
    * into an empty scan. fpp 0.003 ≈ 12 bits/key. */
  private[graft] def bloomProbe(build: DataFrame, buildKey: String,
      probeKey: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val n = build.count()
    if (n == 0L) lit(false)
    else mightContain(
      build.stat.bloomFilter(col(buildKey), n, 0.003), probeKey)
  }

  private def selectedTiles(s: SparkSession): DataFrame =
    Tables.boundaries(s)
      .filter(col("xmin") <= ExtentXMax && col("xmax") >= ExtentXMin &&
              col("ymin") <= ExtentYMax && col("ymax") >= ExtentYMin)
      .select("tile_id")

  private val selectedTilesSql =
    s"""selected AS (SELECT tile_id FROM boundaries
       |  WHERE xmin <= $ExtentXMax AND xmax >= $ExtentXMin
       |    AND ymin <= $ExtentYMax AND ymax >= $ExtentYMin)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1 — features ⋈ tile index on the primary key (tileconfig.py:170-176):
    // payload rows tagged with their tile. Large-large equi join → SMJ/AQE.
    "j1_feature_index_join" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.featureIndex(s, dir),
          col("l_orderkey") === col("gid"), "inner")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("tile_id"))),

    // J2 — LEFT JOIN + IS NULL ⇒ anti join: tiles NOT on the version
    // border (tileconfig.py:573-585)
    "j2_border_anti" -> ((s, _) =>
      Tables.boundaries(s)
        .join(broadcast(Tables.borderTiles(s).select("tile_id")),
          Seq("tile_id"), "left_anti")
        .select("tile_id", "version")),

    // J3 — spatial theta join: elevation tiles intersecting one feature
    // tile's envelope (tileconfig.py:640-678; touch counts)
    "j3_theta_intersects" -> ((s, _) => {
      val elev = Tables.boundaries(s)
      val ft = Tables.boundaries(s).filter(col("tile_id") === "t1_1")
        .select(col("xmin").as("f_xmin"), col("ymin").as("f_ymin"),
          col("xmax").as("f_xmax"), col("ymax").as("f_ymax"))
      elev.crossJoin(broadcast(ft))
        .filter(col("xmin") <= col("f_xmax") && col("xmax") >= col("f_xmin") &&
                col("ymin") <= col("f_ymax") && col("ymax") >= col("f_ymin"))
        .select(col("tile_id"), col("version"))
    }),

    // J4 — cross join against the per-version dissolved coverage (A1) with
    // a covers predicate (tileconfig.py:565-594; envelope model)
    "j4_version_coverage" -> ((s, _) => {
      val cov = Tables.boundaries(s).groupBy(col("version").as("v"))
        .agg(min("xmin").as("uxmin"), min("ymin").as("uymin"),
             max("xmax").as("uxmax"), max("ymax").as("uymax"))
      Tables.boundaries(s).crossJoin(broadcast(cov))
        .filter(col("xmin") >= col("uxmin") && col("xmax") <= col("uxmax") &&
                col("ymin") >= col("uymin") && col("ymax") <= col("uymax"))
        .select(col("v").as("version"), col("tile_id"))
    }),

    // J4b — the reference's FULL coverage predicate, exactly:
    // ST_Relate(cov, ft, '212101212') OR ST_Covers(cov, ft)
    // (tileconfig.py:591-592). Rounds 1-5 approximated the relate leg
    // away (envelope covers only — the SURVEY §7.1 delta); for
    // axis-aligned rectangles the DE-9IM matrix is exactly computable
    // (functions/RectRelate), so the delta is closed. The feature side
    // is BOTH grid layouts (identical + offset u-grid): identical-grid
    // tiles match via covers only (shared edges ⇒ BB=1, relate fails),
    // offset u-tiles via relate only (crossing overlap ⇒ BB=0, not
    // contained) — the two predicate legs are distinguishable in the
    // output. Spark evaluates the full 9-cell matrix; the oracle uses an
    // independently-derived closed decomposition of the same pattern.
    "j4_relate_coverage" -> ((s, _) => {
      import graft.functions.RectRelate
      import graft.functions.RectRelate.Rect
      import s.implicits._
      val cov = Tables.boundaries(s).groupBy(col("version").as("v"))
        .agg(min("xmin").as("uxmin"), min("ymin").as("uymin"),
             max("xmax").as("uxmax"), max("ymax").as("uymax"))
      val ft = Tables.boundaries(s)
        .select(col("tile_id"), col("xmin"), col("ymin"), col("xmax"), col("ymax"))
        .unionByName(TileGrid.uTiles.toDF()
          .select(col("u_id").as("tile_id"),
            col("xmin"), col("ymin"), col("xmax"), col("ymax")))
      val covRect = Rect(col("uxmin"), col("uymin"), col("uxmax"), col("uymax"))
      val ftRect = Rect.cols("")
      ft.crossJoin(broadcast(cov))
        .filter(RectRelate.relate(covRect, ftRect, "212101212") ||
                RectRelate.covers(covRect, ftRect))
        .select(col("v").as("version"), col("tile_id"),
          when(RectRelate.covers(covRect, ftRect), lit("covers"))
            .otherwise(lit("relate")).as("matched_by"))
    }),

    // J5 — elevation⋈feature tiles purely by equal ID (tileconfig.py:610-639)
    "j5_id_join" -> ((s, _) =>
      Tables.elevIndex(s)
        .join(broadcast(Tables.boundaries(s).select("tile_id", "version")),
          Seq("tile_id"), "inner")
        .select("tile_id", "path", "dir_version", "version")),

    // J6 — broadcast file-index lookup with missing-file reporting
    // (tileconfig.py:318-335; left + isNull = the warn branch)
    "j6_file_lookup" -> ((s, _) =>
      selectedTiles(s)
        .join(broadcast(Tables.elevIndex(s).filter(col("priority") === 2)
          .select("tile_id", "path")), Seq("tile_id"), "left")
        .select(col("tile_id"), col("path"), col("path").isNull.as("missing"))),

    // J7 — set intersection as join: version-3 tiles ∩ selected tiles
    // (tileconfig.py:343-348)
    "j7_set_intersect" -> ((s, _) =>
      Tables.boundaries(s).filter(col("version") === 3).select("tile_id")
        .intersect(selectedTiles(s))),

    // J8 — semi-join validation + difference report of requested tiles
    // (tileconfig.py:242-249)
    "j8_semi_validate" -> ((s, _) => {
      import s.implicits._
      val req = Seq("t0_0", "t1_1", "t9_9").toDF("tile_id")
      val idx = Tables.boundaries(s).select("tile_id")
      val found = req.join(broadcast(idx), Seq("tile_id"), "left_semi")
        .withColumn("status", lit("found"))
      val missing = req.join(broadcast(idx), Seq("tile_id"), "left_anti")
        .withColumn("status", lit("missing"))
      found.unionByName(missing)
    }),

    // J11 (extension) — ordered event funnel: per user, the earliest
    // view, the earliest click within 6 h after it, the earliest
    // purchase within 6 h after that (the conversion window is what
    // makes the funnel discriminate — over a whole month every user
    // eventually does everything). Three filtered aggregates keyed on user_id
    // feeding left joins on the same key — every shuffle is on user_id,
    // so at cluster scale the stages co-partition and the joins are
    // local (the per-user relations are |users|-sized, a dimension
    // against the events fact). Stage membership is pure timestamp
    // comparison — no floats cross the engine boundary.
    "j11_event_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("user_id", "event_type", "ts")
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t_view"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id")
        .filter(col("ts") > col("t_view") &&
          col("ts") <= col("t_view") + expr("INTERVAL 6 HOURS"))
        .groupBy("user_id").agg(min("ts").as("t_click"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id")
        .filter(col("ts") > col("t_click") &&
          col("ts") <= col("t_click") + expr("INTERVAL 6 HOURS"))
        .groupBy("user_id").agg(min("ts").as("t_buy"))
      v.join(c.select(col("user_id"), lit(1).as("clicked")), Seq("user_id"), "left_outer")
        .join(p.select(col("user_id"), lit(1).as("bought")), Seq("user_id"), "left_outer")
        .select((lit(1) + coalesce(col("clicked"), lit(0)) +
          coalesce(col("bought"), lit(0))).as("stage"))
        .groupBy("stage").agg(count(lit(1)).as("n_users"))
        .orderBy("stage")
    }),

    // J12 (extension) — BLOOM-FILTER SEMI-JOIN REDUCTION: lineitem ⋈
    // urgent orders, with the probe side pre-filtered by a fixed-size
    // Bloom sketch of the build side's keys. The 100 TB shape this
    // rehearses: the build side is selective but its key SET is still
    // too large to broadcast as rows (no BHJ) — so instead of shuffling
    // the entire fact table into the join, aggregate the build keys
    // into a [[graft.functions.BloomFilterAgg]] bitset (12 bits/key,
    // map-side mergeable, ~15 MB at 10M keys), broadcast THAT, and drop
    // non-matching fact rows at the scan. The exchange then carries
    // ~|matches| rows (+0.3% FPP residue) instead of |lineitem|.
    // Correctness never depends on the sketch: no false negatives, and
    // the exact equi-join behind it removes false positives — so the
    // result is identical to the plain join (the oracle IS the plain
    // join).
    // The probe is Spark's own BloomFilterMightContain — the expression
    // InjectRuntimeFilter plants when it auto-derives this exact
    // rewrite — so the scan-side filter compiles INTO the whole-stage
    // codegen span instead of breaking it at a UDF call, and the
    // sketch rides the plan as a constant exactly like the built-in
    // runtime filter's materialized subquery result. The build side
    // uses stat.bloomFilter (treeAggregate: map-side partials merged
    // pairwise — the same mergeable-partial shape as the custom
    // [[graft.functions.BloomFilterAgg]], which remains the §2.11 UDAF
    // exhibit and is property-tested in BloomFilterSpec; j12's spec
    // asserts the two probes accept identical key sets).
    "j12_bloom_prune" -> ((s, dir) => {
      val sel = Cached.of(s, s"j12:urgent:$dir")(
        Tables.orders(s, dir)
          .filter(col("o_orderpriority") === "1-URGENT")
          .select("o_orderkey", "o_orderdate"))
      Tables.lineitem(s, dir)
        .filter(bloomProbe(sel, "o_orderkey", col("l_orderkey")))
        .join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(Exact.decSumExpr(Exact.dec(col("l_extendedprice")) *
          (lit(1) - Exact.dec(col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // J13 (extension) — SALTED SKEW JOIN behind the gate: the explicit
    // fallback for keys so hot that even AQE's split shuffle blocks
    // overwhelm one reducer ([[SkewJoin.saltedJoin]] — big side salted
    // n ways, small side replicated n ways, join on (key, salt)).
    // The salt only changes the SHUFFLE LAYOUT, never the result — which
    // is exactly what this gate entry proves: the oracle is the plain
    // unsalted join, and every salt width (including the registered
    // default, the unsalted n=1 arm) must reproduce it. The per-user first-event dimension is |users|-sized
    // (the dimension-vs-fact shape where one whale user would otherwise
    // pin a reducer); n_first_events can only be right if every fact row
    // met its user's dimension row exactly once through the salt fan-out.
    "j13_salted_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select("user_id", "event_type", "ts")
      val firstTs = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
      // Salt width, env-overridable (validated — salt 0 would be a
      // silent degeneration) with n=1 as the UNSALTED arm (plain join).
      // Default flipped to 1 in round 18 on round 17's own wire
      // measurement (records/QMETRICS_zipf10_skew_r17.jsonl): salting ×8
      // bought a 3.6×→1.5× reducer-balance gain at ×1.9 TOTAL shuffle
      // (the replicated dimension), while AQE's skew split handles a
      // 100 TB-sized hub partition at runtime for free once it crosses
      // the default thresholds — so the registered plan, the one a
      // reader copies, is unsalted-with-AQE, and the salt stays the
      // explicit fallback. The fallback is not hypothetical: j13's own
      // aggregate fuses a countDistinct(user_id) onto the join key,
      // which lets the distinct merge reuse the join's partitioning and
      // makes OptimizeSkewedJoin (correctly) decline the split
      // (SkewJoinSpec pins this) — a whale hot enough to overwhelm that
      // regime is exactly when SPARK_GRAFT_J13_SALT=8 earns its ×1.9.
      val saltN = graft.model.Knob.posInt("SPARK_GRAFT_J13_SALT", 1)
      SkewJoin.saltedJoin(ev, firstTs, "user_id", saltN)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"),
          sum(when(col("ts") === col("first_ts"), 1).otherwise(0))
            .as("n_first_events"))
        .orderBy("event_type")
    })
  )

  def oracles: Map[String, String] = Map(
    "j1_feature_index_join" -> Sql.query(Sql.feat, Sql.featureIndex)(
      """SELECT l_orderkey, l_linenumber, l_quantity, tile_id
        |FROM lineitem l JOIN feature_index i ON l.l_orderkey = i.gid""".stripMargin),

    "j2_border_anti" -> Sql.query(Sql.boundaries, Sql.borderTiles)(
      """SELECT b.tile_id, b.version
        |FROM boundaries b LEFT JOIN border_tiles r ON b.tile_id = r.tile_id
        |WHERE r.tile_id IS NULL""".stripMargin),

    "j3_theta_intersects" -> Sql.query(Sql.boundaries)(
      """SELECT e.tile_id, e.version
        |FROM boundaries e, boundaries f
        |WHERE f.tile_id = 't1_1'
        |  AND e.xmin <= f.xmax AND e.xmax >= f.xmin
        |  AND e.ymin <= f.ymax AND e.ymax >= f.ymin""".stripMargin),

    "j4_version_coverage" -> Sql.query(Sql.boundaries,
      """vcov AS (
        |  SELECT version AS v, MIN(xmin) AS uxmin, MIN(ymin) AS uymin,
        |         MAX(xmax) AS uxmax, MAX(ymax) AS uymax
        |  FROM boundaries GROUP BY version)""".stripMargin)(
      """SELECT v.v AS version, b.tile_id
        |FROM vcov v, boundaries b
        |WHERE b.xmin >= v.uxmin AND b.xmax <= v.uxmax
        |  AND b.ymin >= v.uymin AND b.ymax <= v.uymax""".stripMargin),

    // relate leg = the closed decomposition of '212101212' for
    // non-degenerate rectangles: interiors overlap (strictly), neither
    // closure contains the other (⇒ IB/BI/IE/BE/EI/EB all as patterned),
    // boundaries touch, and no edge lines coincide with positive overlap
    // (⇒ BB = 0, not 1). Independent of the Spark side's cell-by-cell
    // matrix evaluation.
    "j4_relate_coverage" -> Sql.query(Sql.boundaries, TileGrid.uTilesSqlCte,
      """vcov AS (
        |  SELECT version AS v, MIN(xmin) AS uxmin, MIN(ymin) AS uymin,
        |         MAX(xmax) AS uxmax, MAX(ymax) AS uymax
        |  FROM boundaries GROUP BY version)""".stripMargin,
      """ft AS (
        |  SELECT tile_id, xmin, ymin, xmax, ymax FROM boundaries
        |  UNION ALL
        |  SELECT u_id, xmin, ymin, xmax, ymax FROM u_tiles)""".stripMargin)(
      """SELECT v.v AS version, f.tile_id,
        |       CASE WHEN f.xmin >= v.uxmin AND f.xmax <= v.uxmax
        |                 AND f.ymin >= v.uymin AND f.ymax <= v.uymax
        |            THEN 'covers' ELSE 'relate' END AS matched_by
        |FROM vcov v, ft f
        |WHERE (f.xmin >= v.uxmin AND f.xmax <= v.uxmax
        |       AND f.ymin >= v.uymin AND f.ymax <= v.uymax)
        |   OR (LEAST(v.uxmax, f.xmax) > GREATEST(v.uxmin, f.xmin)
        |       AND LEAST(v.uymax, f.ymax) > GREATEST(v.uymin, f.ymin)
        |       AND NOT (v.uxmin >= f.xmin AND v.uxmax <= f.xmax
        |                AND v.uymin >= f.ymin AND v.uymax <= f.ymax)
        |       AND NOT (f.xmin >= v.uxmin AND f.xmax <= v.uxmax
        |                AND f.ymin >= v.uymin AND f.ymax <= v.uymax)
        |       AND (((v.uxmin BETWEEN f.xmin AND f.xmax OR v.uxmax BETWEEN f.xmin AND f.xmax)
        |             AND (f.ymin BETWEEN v.uymin AND v.uymax OR f.ymax BETWEEN v.uymin AND v.uymax))
        |            OR ((f.xmin BETWEEN v.uxmin AND v.uxmax OR f.xmax BETWEEN v.uxmin AND v.uxmax)
        |                AND (v.uymin BETWEEN f.ymin AND f.ymax OR v.uymax BETWEEN f.ymin AND f.ymax)))
        |       AND NOT (((v.uxmin IN (f.xmin, f.xmax) OR v.uxmax IN (f.xmin, f.xmax))
        |                 AND GREATEST(v.uymin, f.ymin) < LEAST(v.uymax, f.ymax))
        |                OR ((v.uymin IN (f.ymin, f.ymax) OR v.uymax IN (f.ymin, f.ymax))
        |                    AND GREATEST(v.uxmin, f.xmin) < LEAST(v.uxmax, f.xmax))))""".stripMargin),

    "j5_id_join" -> Sql.query(Sql.elevFiles, Sql.elevIndex, Sql.boundaries)(
      """SELECT e.tile_id, e.path, e.dir_version, b.version
        |FROM elev_index e JOIN boundaries b USING (tile_id)""".stripMargin),

    "j6_file_lookup" -> Sql.query(Sql.elevFiles, Sql.elevIndex, Sql.boundaries,
        selectedTilesSql)(
      """SELECT s.tile_id, e.path, e.path IS NULL AS missing
        |FROM selected s
        |LEFT JOIN (SELECT tile_id, path FROM elev_index WHERE priority = 2) e
        |  USING (tile_id)""".stripMargin),

    "j7_set_intersect" -> Sql.query(Sql.boundaries, selectedTilesSql)(
      """SELECT tile_id FROM boundaries WHERE version = 3
        |INTERSECT
        |SELECT tile_id FROM selected""".stripMargin),

    "j8_semi_validate" -> Sql.query(Sql.boundaries,
      "req(tile_id) AS (VALUES ('t0_0'), ('t1_1'), ('t9_9'))")(
      """SELECT r.tile_id,
        |       CASE WHEN b.tile_id IS NULL THEN 'missing' ELSE 'found' END AS status
        |FROM req r
        |LEFT JOIN (SELECT DISTINCT tile_id FROM boundaries) b USING (tile_id)""".stripMargin),

    "j11_event_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
        |           WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(e.ts) AS t_click
        |      FROM events e JOIN v ON e.user_id = v.user_id
        |      WHERE e.event_type = 'click' AND e.ts > v.t_view
        |        AND e.ts <= v.t_view + INTERVAL 6 HOUR
        |      GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS t_buy
        |      FROM events e JOIN c ON e.user_id = c.user_id
        |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        |        AND e.ts <= c.t_click + INTERVAL 6 HOUR
        |      GROUP BY e.user_id)
        |SELECT stage, COUNT(*) AS n_users FROM (
        |  SELECT 1 + (CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END)
        |           + (CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END) AS stage
        |  FROM v
        |  LEFT JOIN c ON v.user_id = c.user_id
        |  LEFT JOIN p ON v.user_id = p.user_id) t
        |GROUP BY stage
        |ORDER BY stage""".stripMargin,

    // The sketch is invisible to semantics: the oracle is the PLAIN join.
    "j12_bloom_prune" ->
      """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
        |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |         (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1""".stripMargin,

    // The salt is invisible to semantics: the oracle is the plain join.
    "j13_salted_join" ->
      """WITH f AS (SELECT user_id, MIN(ts) AS first_ts
        |           FROM events GROUP BY user_id)
        |SELECT event_type, COUNT(*) AS n_events,
        |       COUNT(DISTINCT e.user_id) AS n_users,
        |       CAST(SUM(CASE WHEN e.ts = f.first_ts THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_first_events
        |FROM events e JOIN f ON e.user_id = f.user_id
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
  )
}
