package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.OpModule
import graft.model.TileGrid
import graft.sources.{Sql, Tables}

/** Dual-layout suite: the reference parametrizes every tile test over
  * TWO grid layouts — feature tiles identical to elevation tiles, and an
  * offset/other-size feature grid (tests/conftest.py:99-123). The
  * identical layout is J5 (`j5_id_join`); this module covers the offset
  * layout, where tile matching must be spatial (J3's general case) and
  * part of the feature space lies outside the feature-tile index. */
object DualLayoutOps extends OpModule {

  private def uTiles(s: SparkSession): DataFrame = {
    import s.implicits._
    TileGrid.uTiles.toDF()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // each offset feature tile matched to the elevation tiles it
    // intersects (tileconfig.py:640-678 over non-identical grids)
    "j9_offset_grid_match" -> ((s, _) => {
      val u = uTiles(s).select(col("u_id"), col("xmin").as("u_xmin"),
        col("ymin").as("u_ymin"), col("xmax").as("u_xmax"), col("ymax").as("u_ymax"))
      Tables.boundaries(s).crossJoin(broadcast(u))
        .filter(col("xmin") <= col("u_xmax") && col("xmax") >= col("u_xmin") &&
                col("ymin") <= col("u_ymax") && col("ymax") >= col("u_ymin"))
        .select(col("u_id"), col("tile_id"), col("version"))
    }),

    // the SCALE.md upgrade path for theta joins past broadcast size,
    // implemented: bin each envelope into the 2500-wide grid cells it
    // touches, equi-join on cell id (a well-distributed shuffle key),
    // post-filter exact overlap, dedup. Semantically identical to
    // j9_offset_grid_match — but the join is an equi-join that scales to
    // arbitrarily many tiles on both sides.
    "j10_binned_spatial_join" -> ((s, _) => {
      // inclusive upper cell so exactly-touching envelopes (closed
      // intervals, as in ST_Intersects) still share a candidate cell
      def cells(df: DataFrame, pfx: String): DataFrame = df
        .withColumn("cx", explode(expr(
          s"sequence(cast(floor(${pfx}xmin / 2500.0) as int), " +
          s"cast(floor(${pfx}xmax / 2500.0) as int))")))
        .withColumn("cy", explode(expr(
          s"sequence(cast(floor(${pfx}ymin / 2500.0) as int), " +
          s"cast(floor(${pfx}ymax / 2500.0) as int))")))
      val u = cells(uTiles(s).select(col("u_id"), col("xmin").as("u_xmin"),
        col("ymin").as("u_ymin"), col("xmax").as("u_xmax"), col("ymax").as("u_ymax")), "u_")
      val b = cells(Tables.boundaries(s)
        .select(col("tile_id"), col("version"), col("xmin"), col("ymin"),
          col("xmax"), col("ymax")), "")
      b.join(u, Seq("cx", "cy"))
        .filter(col("xmin") <= col("u_xmax") && col("xmax") >= col("u_xmin") &&
                col("ymin") <= col("u_ymax") && col("ymax") >= col("u_ymin"))
        .select(col("u_id"), col("tile_id"), col("version")).distinct()
    }),

    // features assigned to the offset grid; features outside the u-index
    // surface as NULL (the semi-join-validation counterpart, J8, in the
    // offset layout)
    "p14_offset_assign" -> ((s, dir) => {
      val inU = col("fx") >= 1250 && col("fx") < 11250 &&
                col("fy") >= 1250 && col("fy") < 11250
      Tables.features(s, dir)
        .withColumn("u_id", when(inU,
          concat(lit("u"), floor((col("fx") - 1250) / 5000.0).cast("int").cast("string"),
            lit("_"), floor((col("fy") - 1250) / 5000.0).cast("int").cast("string"))))
        .groupBy("u_id").agg(count(lit(1)).as("n_features"))
    })
  )

  def oracles: Map[String, String] = Map(
    "j9_offset_grid_match" -> Sql.query(TileGrid.boundariesSqlCte,
      TileGrid.uTilesSqlCte)(
      """SELECT u.u_id, b.tile_id, b.version
        |FROM boundaries b, u_tiles u
        |WHERE b.xmin <= u.xmax AND b.xmax >= u.xmin
        |  AND b.ymin <= u.ymax AND b.ymax >= u.ymin""".stripMargin),

    // oracle = the DIRECT theta-join formulation: an independent
    // algorithm must produce the identical result set
    "j10_binned_spatial_join" -> Sql.query(TileGrid.boundariesSqlCte,
      TileGrid.uTilesSqlCte)(
      """SELECT DISTINCT u.u_id, b.tile_id, b.version
        |FROM boundaries b, u_tiles u
        |WHERE b.xmin <= u.xmax AND b.xmax >= u.xmin
        |  AND b.ymin <= u.ymax AND b.ymax >= u.ymin""".stripMargin),

    "p14_offset_assign" -> Sql.query(Sql.feat)(
      """SELECT CASE WHEN fx >= 1250 AND fx < 11250 AND fy >= 1250 AND fy < 11250
        |            THEN 'u' || CAST(CAST(FLOOR((fx - 1250) / 5000.0) AS INT) AS VARCHAR)
        |                 || '_' || CAST(CAST(FLOOR((fy - 1250) / 5000.0) AS INT) AS VARCHAR)
        |       END AS u_id,
        |       COUNT(*) AS n_features
        |FROM feat GROUP BY 1""".stripMargin)
  )
}
