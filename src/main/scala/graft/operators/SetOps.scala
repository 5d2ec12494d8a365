package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.OpModule
import graft.sources.{Sql, Tables}

/** Set-operation suite E1-E4 (SURVEY §2.7). E1 (intersect) is covered by
  * j7_set_intersect in [[JoinOps]]. */
object SetOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E2 — difference report: all tiles minus border tiles
    // (tileconfig.py:243)
    "e2_except_border" -> ((s, _) =>
      Tables.boundaries(s).select("tile_id")
        .except(Tables.borderTiles(s).select("tile_id"))),

    // E3 — union of two directory listings with dedup (the dict-merge of
    // tileconfig.py:464-497, projected to tile IDs)
    "e3_union_dirs" -> ((s, _) => {
      val idx = Tables.elevIndex(s)
      idx.filter(col("path").startsWith("/data/ahn2/")).select("tile_id")
        .union(idx.filter(col("path").startsWith("/data/ahn2b/")).select("tile_id"))
        .distinct()
    }),

    // E4 — part-wise split AHN2/AHN3/border processed as disjoint tagged
    // parts (controller.py:613-623)
    "e4_parts_union" -> ((s, _) => {
      val b = Tables.boundaries(s)
      b.filter(col("version") === 2 && !col("border"))
        .select(col("tile_id"), lit("AHN2").as("part"))
        .unionByName(b.filter(col("version") === 3 && !col("border"))
          .select(col("tile_id"), lit("AHN3").as("part")))
        .unionByName(b.filter(col("border"))
          .select(col("tile_id"), lit("AHN_border").as("part")))
    })
  )

  def oracles: Map[String, String] = Map(
    "e2_except_border" -> Sql.query(Sql.boundaries, Sql.borderTiles)(
      """SELECT tile_id FROM boundaries
        |EXCEPT
        |SELECT tile_id FROM border_tiles""".stripMargin),

    "e3_union_dirs" -> Sql.query(Sql.elevFiles, Sql.elevIndex)(
      """SELECT tile_id FROM elev_index WHERE path LIKE '/data/ahn2/%'
        |UNION
        |SELECT tile_id FROM elev_index WHERE path LIKE '/data/ahn2b/%'""".stripMargin),

    "e4_parts_union" -> Sql.query(Sql.boundaries)(
      """SELECT tile_id, 'AHN2' AS part FROM boundaries WHERE version = 2 AND NOT border
        |UNION ALL
        |SELECT tile_id, 'AHN3' AS part FROM boundaries WHERE version = 3 AND NOT border
        |UNION ALL
        |SELECT tile_id, 'AHN_border' AS part FROM boundaries WHERE border""".stripMargin)
  )
}
