package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.OpModule
import graft.model.TileGrid
import graft.sources.{Sql, Tables}

/** Tile-selection suite: projections / filters / predicates P1-P13 and the
  * deterministic work-list shuffle W3 (SURVEY §2.3, §2.6).
  *
  * Reference semantics per op are cited inline. All predicates reach the
  * parquet scan via Catalyst pushdown (the reference instead ships them as
  * SQL text to PostgreSQL — tileconfig.py:128-249); the tiny boundary /
  * file-index relations are driver-local literals, the feature side stays
  * fully distributed.
  */
object TileSelectOps extends OpModule {
  import TileGrid.{ExtentXMin, ExtentYMin, ExtentXMax, ExtentYMax}

  /** Front-door tile selection with the reference's argument contract
    * (tileconfig.py DbTiles.configure, test_tiles.py:168-176): exactly
    * one of `extent` / `tiles` must be given — both or neither is an
    * error; the literal list `Seq("all")` selects every tile. */
  def select(s: SparkSession, extent: Option[(Int, Int, Int, Int)] = None,
      tiles: Option[Seq[String]] = None): DataFrame = {
    require(extent.isDefined != tiles.isDefined,
      "provide exactly one of extent or tiles (tiles=Seq(\"all\") for everything)")
    val b = Tables.boundaries(s)
    (extent, tiles) match {
      case (Some((x1, y1, x2, y2)), _) =>
        b.filter(col("xmin") <= x2 && col("xmax") >= x1 &&
                 col("ymin") <= y2 && col("ymax") >= y1)
      case (_, Some(Seq("all"))) => b
      case (_, Some(ts)) => b.filter(col("tile_id").isin(ts: _*))
      case _ => throw new IllegalArgumentException("unreachable")
    }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1 — all tile IDs: SELECT DISTINCT tile FROM boundaries
    // (tileconfig.py:211-224)
    "p1_distinct_tiles" -> ((s, _) =>
      Tables.boundaries(s).select("tile_id").distinct()),

    // P2 — distinct versions with int cast + null skip
    // (tileconfig.py:501-523)
    "p2_distinct_versions" -> ((s, _) =>
      Tables.elevFilesRaw(s)
        .select(col("dir_version").cast("int").as("version"))
        .na.drop().distinct()),

    // P3 — explicit tile list: WHERE tile = ANY(...) (tileconfig.py:226-249)
    "p3_tiles_inlist" -> ((s, _) =>
      Tables.boundaries(s)
        .filter(col("tile_id").isin("t0_0", "t1_1", "t2_2", "t3_3"))
        .select("tile_id", "version")),

    // P4 — equality filter on a literal tile (tileconfig.py:618-627)
    "p4_eq_filter" -> ((s, dir) =>
      Tables.features(s, dir)
        .filter(col("tile_id") === lit("t1_2"))
        .select(col("o_orderkey").as("gid"), col("tile_id"))),

    // P5 — containment: features inside the extent envelope
    // (ST_Within, tileconfig.py:170-176; envelope model SURVEY §7.1)
    "p5_within_extent" -> ((s, dir) =>
      Tables.features(s, dir)
        .filter(col("fx").between(ExtentXMin, ExtentXMax) &&
                col("fy").between(ExtentYMin, ExtentYMax))
        .select(col("o_orderkey").as("gid"), col("fx"), col("fy"), col("tile_id"))),

    // P6 — intersection: boundary envelopes overlapping the extent
    // (ST_Intersects, tileconfig.py:187-193; touch counts as intersect)
    "p6_intersect_extent" -> ((s, _) =>
      Tables.boundaries(s)
        .filter(col("xmin") <= ExtentXMax && col("xmax") >= ExtentXMin &&
                col("ymin") <= ExtentYMax && col("ymax") >= ExtentYMin)
        .select("tile_id")),

    // P7 — star projection + computed alias: SELECT features.*, tile AS …
    // (tileconfig.py:172)
    "p7_star_alias" -> ((s, dir) => {
      val base = Tables.orders(s, dir).columns.toIndexedSeq.map(col)
      Tables.features(s, dir).select(base :+ col("tile_id").as("unit"): _*)
    }),

    // P9 — regex tile extraction from lower-cased file names
    // (tileconfig.py:450-461)
    "p9_regex_extract" -> ((s, _) =>
      Tables.elevFilesRaw(s)
        .select(col("path"),
          regexp_extract(lower(col("path")), Tables.TileFromPath, 1).as("tile_id"))),

    // P10 — null-guard: matched files whose version is NULL are skipped
    // with a warning; this query reports the skipped rows
    // (tileconfig.py:633-639)
    "p10_null_guard" -> ((s, _) =>
      Tables.elevFilesRaw(s)
        .withColumn("tile_id", regexp_extract(lower(col("path")), Tables.TileFromPath, 1))
        .filter(col("tile_id") =!= "" && col("dir_version").isNull)
        .select("path", "tile_id")),

    // P13/S3 — LIMIT 0 column probe (db.py:105-111)
    "p13_limit_probe" -> ((s, dir) => Tables.lineitem(s, dir).limit(0)),

    // S2 — dict-row fetch: one keyed row with every column, the
    // RealDictCursor single-record get of the reference (db.py:113-133,
    // tile boundary fetch tileconfig.py:557-573). The Spark form is a
    // key-filtered full projection — at scale this is a partition-pruned
    // / pushed-filter point lookup, never a collect.
    "s2_row_fetch" -> ((s, _) =>
      Tables.boundaries(s).filter(col("tile_id") === "t2_1")),

    // W3 — deterministic work-list shuffle: multiplicative-hash key over
    // the selected tiles (reference uses random.shuffle for load
    // balancing, tileconfig.py:139-141; we keep the semantics but make it
    // reproducible — SURVEY §7.4 non-determinism note)
    "w3_det_shuffle" -> ((s, _) =>
      Tables.boundaries(s)
        .filter(col("xmin") <= ExtentXMax && col("xmax") >= ExtentXMin &&
                col("ymin") <= ExtentYMax && col("ymax") >= ExtentYMin)
        .select(col("tile_id"),
          (((col("tx") * 31 + col("ty")) * 2654435761L) % 97).as("shuffle_key")))
  )

  def oracles: Map[String, String] = Map(
    "p1_distinct_tiles" -> Sql.query(Sql.boundaries)(
      "SELECT DISTINCT tile_id FROM boundaries"),

    "p2_distinct_versions" -> Sql.query(Sql.elevFiles)(
      """SELECT DISTINCT CAST(dir_version AS INT) AS version
        |FROM elev_files WHERE dir_version IS NOT NULL""".stripMargin),

    "p3_tiles_inlist" -> Sql.query(Sql.boundaries)(
      """SELECT tile_id, version FROM boundaries
        |WHERE tile_id IN ('t0_0', 't1_1', 't2_2', 't3_3')""".stripMargin),

    "p4_eq_filter" -> Sql.query(Sql.feat)(
      "SELECT o_orderkey AS gid, tile_id FROM feat WHERE tile_id = 't1_2'"),

    "p5_within_extent" -> Sql.query(Sql.feat)(
      s"""SELECT o_orderkey AS gid, fx, fy, tile_id FROM feat
         |WHERE fx BETWEEN $ExtentXMin AND $ExtentXMax
         |  AND fy BETWEEN $ExtentYMin AND $ExtentYMax""".stripMargin),

    "p6_intersect_extent" -> Sql.query(Sql.boundaries)(
      s"""SELECT tile_id FROM boundaries
         |WHERE xmin <= $ExtentXMax AND xmax >= $ExtentXMin
         |  AND ymin <= $ExtentYMax AND ymax >= $ExtentYMin""".stripMargin),

    "p7_star_alias" -> Sql.query(Sql.feat)(
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       o_orderdate, o_orderpriority, tile_id AS unit FROM feat""".stripMargin),

    "p9_regex_extract" -> Sql.query(Sql.elevFiles)(
      s"""SELECT path,
         |       regexp_extract(lower(path), '${Sql.TileFromPath}', 1) AS tile_id
         |FROM elev_files""".stripMargin),

    "p10_null_guard" -> Sql.query(Sql.elevFiles)(
      s"""SELECT path,
         |       regexp_extract(lower(path), '${Sql.TileFromPath}', 1) AS tile_id
         |FROM elev_files
         |WHERE regexp_extract(lower(path), '${Sql.TileFromPath}', 1) <> ''
         |  AND dir_version IS NULL""".stripMargin),

    "p13_limit_probe" -> "SELECT * FROM lineitem LIMIT 0",

    "s2_row_fetch" -> Sql.query(Sql.boundaries)(
      "SELECT * FROM boundaries WHERE tile_id = 't2_1'"),

    "w3_det_shuffle" -> Sql.query(Sql.boundaries)(
      s"""SELECT tile_id, ((tx * 31 + ty) * 2654435761) % 97 AS shuffle_key
         |FROM boundaries
         |WHERE xmin <= $ExtentXMax AND xmax >= $ExtentXMin
         |  AND ymin <= $ExtentYMax AND ymax >= $ExtentYMin""".stripMargin)
  )
}
