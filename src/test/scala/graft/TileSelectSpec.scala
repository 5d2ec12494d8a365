package graft

/** Golden tests for the tile-selection suite, mirroring the shape of the
  * reference's tests/test_tiles.py inline-golden assertions. */
class TileSelectSpec extends SparkSpec {

  test("p1: all 16 tile IDs (4x4 grid, test_tiles.py:219-245 analogue)") {
    val ids = run("p1_distinct_tiles").collect().map(_.getString(0)).toSet
    assert(ids.size == 16)
    assert(ids.contains("t0_0") && ids.contains("t3_3"))
  }

  test("p2: distinct versions {1,2,3} from file dirs") {
    val vs = run("p2_distinct_versions").collect().map(_.getInt(0)).toSet
    assert(vs == Set(1, 2, 3))
  }

  test("p6: extent selects the 3x3 interior block") {
    val ids = run("p6_intersect_extent").collect().map(_.getString(0)).toSet
    val expect = for { tx <- 1 to 3; ty <- 0 to 2 } yield s"t${tx}_${ty}"
    assert(ids == expect.toSet)
  }

  test("p5: features within extent are a strict nonempty subset") {
    val n = run("p5_within_extent").count()
    val all = run("p7_star_alias").count()
    assert(n > 0 && n < all)
  }

  test("p9/p10: case-insensitive extraction; null-version rows reported") {
    val extracted = run("p9_regex_extract").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(extracted("/data/ahn3/CT1_0.LAZ") == "t1_0") // mixed case matched
    assert(extracted("/data/ahn3/readme.txt") == "")    // no tile in name
    val skipped = run("p10_null_guard").collect().map(_.getString(0)).toSet
    assert(skipped == Set("/data/ahnx/m-t3_3.laz"))
  }

  test("w3: shuffle is deterministic across runs") {
    val a = run("w3_det_shuffle").collect().map(_.toString).sorted.toSeq
    val b = run("w3_det_shuffle").collect().map(_.toString).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("entry: smoke, >0 rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry: no duplicate query names across modules") {
    val names = SparkEntry.modules.flatMap(_.queries.keys)
    assert(names.size == names.distinct.size)
    // every oracle key has a query
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }
}
