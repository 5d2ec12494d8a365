package graft

import org.apache.spark.sql.functions._

import graft.functions.RectRelate
import graft.functions.RectRelate.Rect

/** Exact DE-9IM over axis-aligned rectangles (functions/RectRelate):
  * the matrix column against the textbook matrices for every relevant
  * configuration, and the J4 predicate case where ST_Covers and
  * ST_Relate('212101212') disagree — the reference's full coverage
  * predicate (tileconfig.py:591-592) that rounds 1-5 approximated. */
class RectRelateSpec extends SparkSpec {

  /** matrix(A, B) for two literal rectangles. */
  private def mat(a: (Int, Int, Int, Int), b: (Int, Int, Int, Int)): String = {
    val df = spark.range(1).select(
      RectRelate.matrix(
        Rect(lit(a._1), lit(a._2), lit(a._3), lit(a._4)),
        Rect(lit(b._1), lit(b._2), lit(b._3), lit(b._4))).as("m"))
    df.collect()(0).getString(0)
  }

  test("textbook DE-9IM matrices for the rectangle configurations") {
    // equal rectangles
    assert(mat((0, 0, 10, 10), (0, 0, 10, 10)) == "2FFF1FFF2")
    // A strictly contains B
    assert(mat((0, 0, 10, 10), (2, 2, 8, 8)) == "212FF1FF2")
    // A strictly within B (inverse)
    assert(mat((2, 2, 8, 8), (0, 0, 10, 10)) == "2FF1FF212")
    // disjoint
    assert(mat((0, 0, 1, 1), (5, 5, 6, 6)) == "FF2FF1212")
    // edge-adjacent neighbors (shared edge segment => BB = 1)
    assert(mat((0, 0, 1, 1), (1, 0, 2, 1)) == "FF2F11212")
    // corner touch only (single shared point => BB = 0)
    assert(mat((0, 0, 1, 1), (1, 1, 2, 2)) == "FF2F01212")
    // plus-sign crossing: THE '212101212' pattern
    assert(mat((0, 4, 10, 6), (4, 0, 6, 10)) == "212101212")
    // partial corner overlap also crosses
    assert(mat((0, 0, 6, 6), (4, 4, 10, 10)) == "212101212")
    // contained but sharing one edge: covers true, BB = 1, relate false
    assert(mat((0, 0, 10, 10), (0, 2, 5, 8)) == "212F11FF2")
  }

  test("relate() honors T/F/*/digit pattern characters") {
    val crossing = spark.range(1).select(
      RectRelate.relate(
        Rect(lit(0), lit(4), lit(10), lit(6)),
        Rect(lit(4), lit(0), lit(6), lit(10)), "T*T***T**").as("p"),
      RectRelate.relate(
        Rect(lit(0), lit(4), lit(10), lit(6)),
        Rect(lit(4), lit(0), lit(6), lit(10)), "FF*******").as("q"))
      .collect()(0)
    assert(crossing.getBoolean(0))  // intersects-style mask matches
    assert(!crossing.getBoolean(1)) // disjoint-style mask does not
    intercept[IllegalArgumentException] {
      RectRelate.relate(Rect(lit(0), lit(0), lit(1), lit(1)),
        Rect(lit(0), lit(0), lit(1), lit(1)), "21210121")
    }
  }

  test("j4_relate_coverage: covers and relate legs disagree by layout") {
    val rows = run("j4_relate_coverage")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2))).toSet
    val (covers, relate) = rows.partition(_._3 == "covers")
    // covers leg: exactly the 16 identical-grid tiles, each under its
    // own version's coverage half — never the offset u-tiles
    assert(covers.size == 16)
    assert(covers.forall { case (_, id, _) => id.startsWith("t") })
    assert(covers.filter(_._1 == 2).map(_._2) ==
      Set("t0_0", "t0_1", "t0_2", "t0_3", "t1_0", "t1_1", "t1_2", "t1_3"))
    // relate leg: only offset u-tiles (crossing overlap, boundaries
    // meeting at points). v2 coverage [0,5000]x[0,10000] crosses the two
    // west u-tiles; v3 [5000,10000]x[0,10000] crosses all four
    assert(relate == Set(
      (2, "u0_0", "relate"), (2, "u0_1", "relate"),
      (3, "u0_0", "relate"), (3, "u0_1", "relate"),
      (3, "u1_0", "relate"), (3, "u1_1", "relate")))
    // the legs are mutually exclusive: covers forces EI = F
    assert(covers.map(t => (t._1, t._2)).intersect(
      relate.map(t => (t._1, t._2))).isEmpty)
  }
}
