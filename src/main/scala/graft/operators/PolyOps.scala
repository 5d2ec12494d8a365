package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.OpModule
import graft.model.TileGrid
import graft.sources.{Sql, Tables}

/** Non-rectangular geometry suite — the last documented semantic delta
  * (SURVEY §7.4). The reference's spatial predicates run in PostGIS over
  * real polygons (`ST_Within` tileconfig.py:170-176, `ST_Intersects`
  * tileconfig.py:187-193, the per-version dissolve tileconfig.py:567-586);
  * every graft query so far used the axis-aligned envelope model. This
  * module computes over genuinely non-rectangular polygons (irregular
  * star-shaped integer hexagons per tile, [[TileGrid.tilePolys]] /
  * [[TileGrid.coverPolys]]) and stays EXACT and fully oracle-checkable:
  *
  *  - containment is even-odd ray casting reduced to integer sign tests
  *    (no division, no floats — the crossing comparison is cross-
  *    multiplied through the strictly-nonzero edge Δy), identical
  *    arithmetic in Spark and DuckDB;
  *  - area is the integer shoelace sum (2A, exact);
  *  - the predicate evaluates inside one codegen-friendly higher-order
  *    `aggregate` over the polygon's edge array — per feature row it is
  *    pure expression work on a broadcast dimension, no explode of the
  *    corpus side, no UDF.
  *
  * Scale shape: the polygon relations are tiny dimensions (16 rows /
  * 96 edges) — broadcast joins only; the corpus side keeps its scan
  * partitioning and never shuffles. The binned join (j14) is the 100 TB
  * pattern for arbitrary-polygon spatial joins: equi-join on a coarse
  * grid cell (points probe exactly one cell; polygons enumerate their
  * bbox's cells), then the exact residual predicate — candidates bounded
  * by polygon fan-out, never all-pairs.
  */
object PolyOps extends OpModule {

  /** Even-odd ray-cast containment of integer point (px,py) against a
    * polygon given as an array<struct<x1,y1,x2,y2>> edge column. A +x
    * ray crosses edge (x1,y1)→(x2,y2) iff the endpoints straddle the
    * scanline half-open ((y1 > py) ≠ (y2 > py), which also forces
    * Δy ≠ 0 and handles ray-through-vertex consistently) and the
    * crossing lies right of the point — tested exactly by
    * cross-multiplying px < x1 + (x2-x1)(py-y1)/Δy through Δy with the
    * inequality flipped on its sign. All-integer, so Spark and the
    * DuckDB oracle agree bit-for-bit. Exact for every non-boundary
    * point; boundary points resolve deterministically (same arithmetic
    * both engines).
    *
    * The registered queries bind the codegen'd
    * [[graft.functions.PointInPoly]] Expression (a tight primitive loop
    * inside whole-stage codegen — the 100 TB form of a corpus-wide
    * containment filter); [[insideHof]] keeps the composable
    * higher-order-function formulation as an independent second
    * implementation, spec-pinned equal on seeded sweeps. */
  private[graft] def inside(px: Column, py: Column, edges: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.toColumn(graft.functions.PointInPoly(
      ColumnBridge.toExpression(px), ColumnBridge.toExpression(py),
      ColumnBridge.toExpression(edges)))
  }

  /** The same crossing rule as a built-in `aggregate` fold — interpreted
    * (HOFs are CodegenFallback), kept as the cross-check twin of the
    * Expression. */
  private[graft] def insideHof(px: Column, py: Column, edges: Column): Column = {
    val crossings = aggregate(edges, lit(0L), (acc, e) => {
      val x1 = e.getField("x1"); val y1 = e.getField("y1")
      val x2 = e.getField("x2"); val y2 = e.getField("y2")
      val straddles = (y1 > py) =!= (y2 > py)
      val lhs = (px - x1) * (y2 - y1)
      val rhs = (x2 - x1) * (py - y1)
      acc + when(straddles &&
        when(y2 > y1, lhs < rhs).otherwise(lhs > rhs), 1L).otherwise(0L)
    })
    crossings % 2 === 1
  }

  /** Integer shoelace sum (= 2·area for a CCW ring) over an edge-array
    * column. */
  private[graft] def shoelace2(edges: Column): Column =
    aggregate(edges, lit(0L), (acc, e) =>
      acc + e.getField("x1") * e.getField("y2") -
        e.getField("x2") * e.getField("y1"))

  private def polyDf(s: SparkSession, polys: Seq[TileGrid.PolyTile]): DataFrame = {
    import s.implicits._
    polys.toDF()
  }

  private def polyDfF(s: SparkSession, polys: Seq[TileGrid.PolyTileF]): DataFrame = {
    import s.implicits._
    polys.toDF()
  }

  /** FLOAT vertex → fixed-point long at the declared 1/[[TileGrid.PolyScale]]
    * precision. Vertices off the grid RAISE instead of rounding: snapping
    * silently changes geometry, and the precision choice must be
    * deliberate (the PostGIS analogue is ST_SnapToGrid before exact
    * predicates). Scaling an on-grid double by the power-of-two scale is
    * IEEE-exact, so Spark and the DuckDB oracle (which scales its own
    * float literals, TileGrid.polyEdgesFSqlCte) land on bit-identical
    * longs and the entire integer machinery — PointInPoly, shoelace,
    * the binned join — applies verbatim. */
  private[graft] def fixedPointEdges(edgesF: Column): Column = {
    def fx(c: Column): Column = {
      val scaled = c * lit(TileGrid.PolyScale.toDouble)
      when(scaled === floor(scaled), scaled.cast("long"))
        .otherwise(raise_error(concat(
          lit(s"polygon vertex off the declared 1/${TileGrid.PolyScale} grid: "),
          c.cast("string"))))
    }
    transform(edgesF, e => struct(
      fx(e.getField("x1")).as("x1"), fx(e.getField("y1")).as("y1"),
      fx(e.getField("x2")).as("x2"), fx(e.getField("y2")).as("y2")))
  }

  /** The SQL spelling of [[inside]]'s per-edge crossing test, over an
    * exploded edge relation aliased `e` against point columns (px,py) —
    * composed into SUM(CASE…)%2=1 by the oracles. One string, used by
    * both polygon oracles, so the Spark predicate and the oracle
    * predicate cannot drift apart edge-case by edge-case. */
  private def crossingSql(px: String, py: String): String =
    s"""CASE WHEN (e.y1 > $py) <> (e.y2 > $py) AND
       |  (CASE WHEN e.y2 > e.y1
       |        THEN ($px - e.x1) * (e.y2 - e.y1) < (e.x2 - e.x1) * ($py - e.y1)
       |        ELSE ($px - e.x1) * (e.y2 - e.y1) > (e.x2 - e.x1) * ($py - e.y1)
       |   END)
       |  THEN 1 ELSE 0 END""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P15 — exact polygon containment (the real-ST_Within form of P5,
    // tileconfig.py:170-176): features whose integer point lies inside
    // their tile's non-rectangular hexagon. Broadcast dim join + one
    // expression — the feature scan never shuffles.
    "p15_poly_within" -> ((s, dir) =>
      Tables.features(s, dir)
        .join(broadcast(polyDf(s, TileGrid.tilePolys).select("tile_id", "edges")),
          Seq("tile_id"))
        .filter(inside(col("fx"), col("fy"), col("edges")))
        .select(col("o_orderkey").as("gid"), col("fx"), col("fy"), col("tile_id"))),

    // J14 — binned exact polygon join (the real-ST_Intersects form of
    // J3/J10, tileconfig.py:187-193): the coverage polygons OVERLAP
    // neighbouring tiles, so membership is not derivable from the grid —
    // points equi-join their half-tile bin cell against the polygons'
    // bbox-cell fan-out (both tiny, broadcast), then the exact ray-cast
    // residual decides. A point may land in several polygons; each
    // (point, polygon) candidate is tested exactly once.
    "j14_poly_bin_join" -> ((s, dir) => {
      import s.implicits._
      val cells = broadcast(TileGrid.coverCells.toDF("tile_id", "cellx", "celly"))
      val polys = broadcast(polyDf(s, TileGrid.coverPolys).select("tile_id", "edges"))
      Tables.features(s, dir)
        .drop("tile_id", "tx", "ty")
        .withColumn("cellx", expr(s"fx div ${TileGrid.PolyCell}"))
        .withColumn("celly", expr(s"fy div ${TileGrid.PolyCell}"))
        .join(cells, Seq("cellx", "celly"))
        .join(polys, Seq("tile_id"))
        .filter(inside(col("fx"), col("fy"), col("edges")))
        .select(col("o_orderkey").as("gid"), col("fx"), col("fy"), col("tile_id"))
    }),

    // A22 — exact polygon-area dissolve per version (the real-geometry
    // form of A1's envelope union, tileconfig.py:567-586): shoelace 2A
    // per tile polygon, summed per elevation version. The in-tile
    // polygons are disjoint, so the per-version sum IS the dissolved
    // area — computed exactly, no geometry lib.
    "a22_poly_area" -> ((s, _) =>
      polyDf(s, TileGrid.tilePolys)
        .select(col("version"), shoelace2(col("edges")).as("a2"))
        .groupBy("version").agg(sum("a2").as("area2"))),

    // P16 — FLOAT-vertex polygon containment (round 13, the last §7.4
    // residual): real GIS vertices are doubles; scale to fixed point at
    // the declared 1/8 precision ([[fixedPointEdges]] — off-grid
    // vertices raise, never round) and run the identical integer
    // ray-cast. The feature points are integers, scaled by the same
    // factor inline; same broadcast-dim, scan-never-shuffles shape as
    // p15.
    "p16_poly_within_float" -> ((s, dir) =>
      Tables.features(s, dir)
        .join(broadcast(polyDfF(s, TileGrid.tilePolysF)
          .select(col("tile_id"), fixedPointEdges(col("edges")).as("edges"))),
          Seq("tile_id"))
        .filter(inside(col("fx") * TileGrid.PolyScale,
          col("fy") * TileGrid.PolyScale, col("edges")))
        .select(col("o_orderkey").as("gid"), col("fx"), col("fy"), col("tile_id"))),

    // J15 — FLOAT-vertex binned polygon join: j14's bin-then-exact
    // pattern with double-vertex coverage polygons, all residual
    // arithmetic in the scaled fixed-point domain. The bin cell of an
    // integer point is scale-invariant (fx·8 div (1250·8) = fx div
    // 1250), so the point side's probe expression is unchanged.
    "j15_poly_bin_join_float" -> ((s, dir) => {
      import s.implicits._
      val cells = broadcast(TileGrid.coverCellsF.toDF("tile_id", "cellx", "celly"))
      val polys = broadcast(polyDfF(s, TileGrid.coverPolysF)
        .select(col("tile_id"), fixedPointEdges(col("edges")).as("edges")))
      Tables.features(s, dir)
        .drop("tile_id", "tx", "ty")
        .withColumn("cellx", expr(s"fx div ${TileGrid.PolyCell}"))
        .withColumn("celly", expr(s"fy div ${TileGrid.PolyCell}"))
        .join(cells, Seq("cellx", "celly"))
        .join(polys, Seq("tile_id"))
        .filter(inside(col("fx") * TileGrid.PolyScale,
          col("fy") * TileGrid.PolyScale, col("edges")))
        .select(col("o_orderkey").as("gid"), col("fx"), col("fy"), col("tile_id"))
    }))

  def oracles: Map[String, String] = Map(
    "p15_poly_within" -> Sql.query(Sql.feat,
      TileGrid.polyEdgesSqlCte("poly_edges", TileGrid.tilePolys))(
      s"""SELECT f.o_orderkey AS gid, f.fx, f.fy, f.tile_id
         |FROM feat f JOIN poly_edges e ON f.tile_id = e.tile_id
         |GROUP BY 1, 2, 3, 4
         |HAVING SUM(${crossingSql("f.fx", "f.fy")}) % 2 = 1""".stripMargin),

    "j14_poly_bin_join" -> Sql.query(Sql.feat,
      TileGrid.polyEdgesSqlCte("cover_edges", TileGrid.coverPolys),
      TileGrid.coverCellsSqlCte)(
      s"""SELECT f.o_orderkey AS gid, f.fx, f.fy, c.tile_id
         |FROM feat f
         |JOIN poly_cells c ON c.cellx = f.fx // ${TileGrid.PolyCell}
         |                 AND c.celly = f.fy // ${TileGrid.PolyCell}
         |JOIN cover_edges e ON e.tile_id = c.tile_id
         |GROUP BY 1, 2, 3, 4
         |HAVING SUM(${crossingSql("f.fx", "f.fy")}) % 2 = 1""".stripMargin),

    "a22_poly_area" -> Sql.query(
      TileGrid.polyEdgesSqlCte("poly_edges", TileGrid.tilePolys))(
      """SELECT version, CAST(SUM(x1 * y2 - x2 * y1) AS BIGINT) AS area2
        |FROM poly_edges GROUP BY version""".stripMargin),

    // the float oracles scale the POINT inline (f.fx * 8 — exact: fx is
    // an integer) and let polyEdgesFSqlCte scale the double vertices,
    // so both engines independently do float→fixed and must agree
    "p16_poly_within_float" -> Sql.query(Sql.feat,
      TileGrid.polyEdgesFSqlCte("poly_edges", TileGrid.tilePolysF))(
      s"""SELECT f.o_orderkey AS gid, f.fx, f.fy, f.tile_id
         |FROM feat f JOIN poly_edges e ON f.tile_id = e.tile_id
         |GROUP BY 1, 2, 3, 4
         |HAVING SUM(${crossingSql(s"f.fx * ${TileGrid.PolyScale}",
            s"f.fy * ${TileGrid.PolyScale}")}) % 2 = 1""".stripMargin),

    "j15_poly_bin_join_float" -> Sql.query(Sql.feat,
      TileGrid.polyEdgesFSqlCte("cover_edges", TileGrid.coverPolysF),
      TileGrid.coverCellsFSqlCte)(
      s"""SELECT f.o_orderkey AS gid, f.fx, f.fy, c.tile_id
         |FROM feat f
         |JOIN poly_cells_f c ON c.cellx = f.fx // ${TileGrid.PolyCell}
         |                   AND c.celly = f.fy // ${TileGrid.PolyCell}
         |JOIN cover_edges e ON e.tile_id = c.tile_id
         |GROUP BY 1, 2, 3, 4
         |HAVING SUM(${crossingSql(s"f.fx * ${TileGrid.PolyScale}",
            s"f.fy * ${TileGrid.PolyScale}")}) % 2 = 1""".stripMargin))
}
