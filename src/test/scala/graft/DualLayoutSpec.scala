package graft

import org.apache.spark.sql.functions._

/** Offset-layout goldens (the second arm of the reference's dual-layout
  * parametrization, tests/conftest.py:99-123). */
class DualLayoutSpec extends SparkSpec {

  test("j9: offset u-tiles straddle elevation blocks (clipped at the world edge)") {
    val rows = run("j9_offset_grid_match").collect()
      .map(r => r.getString(0) -> r.getString(1))
    // u0_0 overlaps a full 3x3 block; tiles extending past the world
    // edge overlap only what exists: 9 + 6 + 6 + 4
    assert(rows.length == 25)
    val u00 = rows.filter(_._1 == "u0_0").map(_._2).toSet
    assert(u00 == (for { tx <- 0 to 2; ty <- 0 to 2 } yield s"t${tx}_${ty}").toSet)
    val u11 = rows.filter(_._1 == "u1_1").map(_._2).toSet
    assert(u11 == (for { tx <- 2 to 3; ty <- 2 to 3 } yield s"t${tx}_${ty}").toSet)
  }

  test("p14: features outside the offset index surface as NULL") {
    val rows = run("p14_offset_assign").collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(rows.contains(None) && rows(None) > 0) // outside-index bucket
    assert(rows.keys.flatten.toSet.subsetOf(
      (for { i <- 0 to 1; j <- 0 to 1 } yield s"u${i}_${j}").toSet))
    assert(rows.values.sum ==
      spark.read.parquet(s"$Sf/orders.parquet").count())
  }
}
