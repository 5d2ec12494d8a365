package graft.sources

import graft.model.TileGrid

/** DuckDB-side CTE snippets mirroring [[Tables]] exactly. All oracle SQL
  * is composed from these so the Spark relations and the oracle relations
  * derive from one set of constants. Dialect note: these run in DuckDB
  * (the driver's oracle), so DuckDB spellings (`regexp_extract`,
  * `string_split`, `'g'` flag on regexp_replace) are used where they
  * differ from Spark SQL. */
object Sql {
  /** orders + coordinates + tile assignment; mirrors [[Tables.features]].
    * Two-level CTE so no lateral alias references are needed. */
  val feat: String =
    """feat0 AS (
      |  SELECT o.*,
      |         (o_orderkey * 7919) % 10000 AS fx,
      |         (o_custkey * 104729) % 10000 AS fy
      |  FROM orders o),
      |feat AS (
      |  SELECT f.*,
      |         CAST(FLOOR(fx / 2500.0) AS INT) AS tx,
      |         CAST(FLOOR(fy / 2500.0) AS INT) AS ty,
      |         't' || CAST(CAST(FLOOR(fx / 2500.0) AS INT) AS VARCHAR) || '_'
      |             || CAST(CAST(FLOOR(fy / 2500.0) AS INT) AS VARCHAR) AS tile_id
      |  FROM feat0 f)""".stripMargin

  /** feature→tile mapping (gid, tile_id); mirrors [[Tables.featureIndex]]. */
  val featureIndex: String =
    "feature_index AS (SELECT o_orderkey AS gid, tile_id FROM feat)"

  val boundaries: String = TileGrid.boundariesSqlCte

  val borderTiles: String =
    "border_tiles AS (SELECT * FROM boundaries WHERE border)"

  val elevFiles: String = TileGrid.elevFilesSqlCte

  /** tile-from-filename regex, DuckDB spelling (same RE2-compatible
    * pattern as [[Tables.TileFromPath]]). */
  val TileFromPath: String = "/(?:c|unit_|m-)(t[0-9]+_[0-9]+)\\.laz$"

  /** elevation file index; mirrors [[Tables.elevIndex]]. */
  val elevIndex: String =
    s"""elev_index AS (
       |  SELECT path, dir_version, priority,
       |         regexp_extract(lower(path), '$TileFromPath', 1) AS tile_id
       |  FROM elev_files
       |  WHERE regexp_extract(lower(path), '$TileFromPath', 1) <> ''
       |    AND dir_version IS NOT NULL)""".stripMargin

  /** monitor log from events; mirrors [[Tables.monitorLog]]. */
  val monitor: String =
    """monitor AS (
      |  SELECT e.*,
      |         't' || CAST(event_id % 4 AS VARCHAR) || '_'
      |             || CAST(user_id % 4 AS VARCHAR) AS tile_id,
      |         CAST(user_id % 32 + 100 AS INTEGER) AS pid,
      |         value AS cpu_time_user,
      |         value / 2 AS cpu_time_sys,
      |         (event_id * 9973) % 1000000000 AS mem_rss
      |  FROM events e)""".stripMargin

  /** Compose a query from CTE snippets + body. */
  def query(ctes: String*)(body: String): String =
    if (ctes.isEmpty) body else s"WITH ${ctes.mkString(",\n")}\n$body"
}
