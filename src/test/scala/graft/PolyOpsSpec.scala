package graft

import org.apache.spark.sql.functions._
import graft.model.TileGrid
import graft.model.TileGrid.PEdge
import graft.operators.PolyOps

/** Non-rectangular geometry: the ray-cast containment predicate and the
  * shoelace area must agree with each other and with independent
  * implementations.
  *
  * The load-bearing check is Pick's theorem: for a simple polygon with
  * integer vertices, 2A = 2I + B - 2 where I counts strictly-interior
  * lattice points and B counts boundary lattice points. A (shoelace) and
  * I (the ray-cast predicate swept over the polygon's bbox) come from
  * the two shipped code paths, B from edge gcds — three independent
  * computations that must close exactly, for every shipped polygon. A
  * predicate that is wrong anywhere inside the bbox, or an area off by
  * one lattice cell, breaks the identity.
  */
class PolyOpsSpec extends SparkSpec {

  // Plain-Scala mirror of PolyOps.inside — same integer half-open
  // crossing rule, used to sweep bboxes without a Spark job per point.
  private def insideScala(px: Long, py: Long, edges: Seq[PEdge]): Boolean =
    edges.count { e =>
      val straddles = (e.y1 > py) != (e.y2 > py)
      straddles && {
        val lhs = (px - e.x1) * (e.y2 - e.y1)
        val rhs = (e.x2 - e.x1) * (py - e.y1)
        if (e.y2 > e.y1) lhs < rhs else lhs > rhs
      }
    } % 2 == 1

  private def onBoundary(px: Long, py: Long, edges: Seq[PEdge]): Boolean =
    edges.exists { e =>
      val cross = (px - e.x1) * (e.y2 - e.y1) - (e.x2 - e.x1) * (py - e.y1)
      cross == 0 &&
        px >= math.min(e.x1, e.x2) && px <= math.max(e.x1, e.x2) &&
        py >= math.min(e.y1, e.y2) && py <= math.max(e.y1, e.y2)
    }

  private def gcd(a: Long, b: Long): Long = if (b == 0) math.abs(a) else gcd(b, a % b)

  private def shoelace2Scala(edges: Seq[PEdge]): Long =
    edges.map(e => e.x1 * e.y2 - e.x2 * e.y1).sum

  test("Pick's theorem closes exactly for every shipped polygon (ties predicate to area)") {
    (TileGrid.tilePolys ++ TileGrid.coverPolys).foreach { p =>
      val xs = p.edges.map(_.x1); val ys = p.edges.map(_.y1)
      var interior = 0L
      var x = xs.min
      while (x <= xs.max) {
        var y = ys.min
        while (y <= ys.max) {
          if (!onBoundary(x, y, p.edges) && insideScala(x, y, p.edges)) interior += 1
          y += 1
        }
        x += 1
      }
      val boundary = p.edges.map(e => gcd(e.x2 - e.x1, e.y2 - e.y1)).sum
      val area2 = shoelace2Scala(p.edges)
      assert(area2 > 0, s"${p.tile_id}: ring must be CCW (positive shoelace)")
      assert(area2 == 2 * interior + boundary - 2,
        s"${p.tile_id}: Pick's identity broken: 2A=$area2 I=$interior B=$boundary")
    }
  }

  test("polygons are genuinely non-rectangular and in-tile polys stay inside their tile") {
    TileGrid.tilePolys.foreach { p =>
      assert(p.edges.size == 6)
      // a rectangle has only axis-parallel edges; every hexagon here has
      // at least 4 slanted ones
      assert(p.edges.count(e => e.x1 != e.x2 && e.y1 != e.y2) >= 4, p.tile_id)
      val t = TileGrid.tiles.find(_.tile_id == p.tile_id).get
      p.edges.foreach { e =>
        assert(e.x1 > t.xmin && e.x1 < t.xmax && e.y1 > t.ymin && e.y1 < t.ymax,
          s"${p.tile_id}: vertex (${e.x1},${e.y1}) escapes its tile")
      }
    }
    // cover polys must actually overlap neighbours, or j14 degenerates
    // into p15
    val spill = TileGrid.coverPolys.count { p =>
      val t = TileGrid.tiles.find(_.tile_id == p.tile_id).get
      p.edges.exists(e => e.x1 < t.xmin || e.x1 > t.xmax ||
        e.y1 < t.ymin || e.y1 > t.ymax)
    }
    assert(spill == TileGrid.coverPolys.size,
      s"only $spill/16 cover polygons spill outside their tile")
  }

  test("every cover polygon's bin cells cover its bbox; each point probes one cell") {
    val byTile = TileGrid.coverCells.groupBy(_._1)
    TileGrid.coverPolys.foreach { p =>
      val cells = byTile(p.tile_id).map(c => (c._2, c._3)).toSet
      val xs = p.edges.map(_.x1); val ys = p.edges.map(_.y1)
      // any in-world lattice point inside the bbox maps to a cell in the set
      val probes = for {
        x <- Seq(math.max(0L, xs.min), (xs.min + xs.max) / 2, math.min(9999L, xs.max))
        y <- Seq(math.max(0L, ys.min), (ys.min + ys.max) / 2, math.min(9999L, ys.max))
      } yield (x / TileGrid.PolyCell, y / TileGrid.PolyCell)
      probes.foreach(c => assert(cells.contains(c), s"${p.tile_id}: cell $c missing"))
    }
  }

  test("Spark predicate/area expressions match the Scala mirrors on a seeded sweep") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(500)((rnd.nextLong(10000), rnd.nextLong(10000)))
    val ptsDf = pts.toDF("px", "py")
    TileGrid.tilePolys.take(3).foreach { p =>
      val edgesLit = typedLit(p.edges)
      // three implementations, one truth: the codegen'd PointInPoly
      // Expression (what the queries run), the higher-order aggregate
      // fold, and the plain-Scala mirror
      val got = ptsDf
        .withColumn("in", PolyOps.inside(col("px"), col("py"), edgesLit))
        .withColumn("in_hof", PolyOps.insideHof(col("px"), col("py"), edgesLit))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
      got.foreach { case (px, py, in, inHof) =>
        assert(in == insideScala(px, py, p.edges), s"(${px},${py}) vs ${p.tile_id}")
        assert(in == inHof, s"Expression vs HOF diverge at (${px},${py}) vs ${p.tile_id}")
      }
      val a2 = ptsDf.limit(1).select(PolyOps.shoelace2(edgesLit)).as[Long].head()
      assert(a2 == shoelace2Scala(p.edges), p.tile_id)
    }
  }

  test("p15/j14 plans: broadcast joins only, corpus side never shuffles") {
    Seq("p15_poly_within", "j14_poly_bin_join",
        "p16_poly_within_float", "j15_poly_bin_join_float").foreach { q =>
      val plan = run(q).queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"$q: no broadcast join\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"$q: unexpected shuffle\n$plan")
    }
  }

  test("fixed-point scaling: integer-vertex float polygons reduce to the integer pipeline") {
    import spark.implicits._
    import graft.model.TileGrid
    // the SAME polygons, once as longs and once as doubles through
    // fixedPointEdges ×8: containment of every feature point must be
    // identical — the float path is the integer path after scaling
    val asFloat = TileGrid.tilePolys.map(p => TileGrid.PolyTileF(p.tile_id, p.version,
      p.edges.map(e => TileGrid.PEdgeF(e.x1.toDouble, e.y1.toDouble,
        e.x2.toDouble, e.y2.toDouble))))
    val intHits = run("p15_poly_within").collect().map(_.toSeq).toSet
    val floatHits = graft.sources.Tables.features(spark, Sf)
      .join(broadcast(asFloat.toDF()
        .select(col("tile_id"),
          graft.operators.PolyOps.fixedPointEdges(col("edges")).as("edges"))),
        Seq("tile_id"))
      .filter(graft.operators.PolyOps.inside(
        col("fx") * TileGrid.PolyScale, col("fy") * TileGrid.PolyScale, col("edges")))
      .select(col("o_orderkey").as("gid"), col("fx"), col("fy"), col("tile_id"))
      .collect().map(_.toSeq).toSet
    assert(floatHits == intHits)
  }

  test("a vertex off the declared 1/8 grid raises instead of silently rounding") {
    import spark.implicits._
    import graft.model.TileGrid
    val bad = Seq(TileGrid.PolyTileF("tbad", 2,
      Seq(TileGrid.PEdgeF(0.0, 0.0, 10.1, 0.0),
        TileGrid.PEdgeF(10.1, 0.0, 0.0, 10.0),
        TileGrid.PEdgeF(0.0, 10.0, 0.0, 0.0)))).toDF()
    val e = intercept[Exception] {
      bad.select(graft.operators.PolyOps.fixedPointEdges(col("edges")).as("e"))
        .selectExpr("e[0].x2").collect()
    }
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .map(x => Option(x.getMessage).getOrElse("")).toSeq
    assert(chain(e).exists(_.contains("off the declared 1/8 grid")), e.toString)
  }

  test("j14 finds cross-tile memberships that the grid join cannot see") {
    val j14 = run("j14_poly_bin_join")
    // recompute each hit's own grid tile; some must differ from the
    // polygon that claimed it (the whole point of the overlap)
    val crossTile = j14
      .withColumn("own_tile", concat(lit("t"),
        expr("fx div 2500"), lit("_"), expr("fy div 2500")))
      .filter(col("tile_id") =!= col("own_tile"))
      .count()
    assert(crossTile > 0, "no cross-tile polygon membership found")
    assert(j14.count() > 0)
  }
}
