package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.OpModule
import graft.sources.{Sql, Tables}

/** Scalar-function families of SURVEY §2.8: string/DSN building, regex,
  * date/time, conditional class selection, array explode. Everything is
  * built from codegen'd `functions._` — no UDFs in the hot path. */
object ScalarOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // string family — GDAL PG: DSN synthesis + tables= spec replacement
    // (output.py:81-95, 120-133; worker.py:109-137)
    "f1_dsn_strings" -> ((s, _) => {
      val template =
        "PG:dbname=baseregisters host=localhost port=5432 active_schema=tiles tables=placeholder"
      Tables.boundaries(s).select(col("tile_id"),
        regexp_replace(lit(template), lit("tables=[a-z_]+"),
          concat(lit("tables=t_"), col("tile_id"))).as("dsn"))
    }),

    // date/time family — ISO formatting, epoch arithmetic, parts
    // (recorder.py:59, cli.py:94-95, worker.py:741)
    "f2_dates" -> ((s, dir) =>
      Tables.events(s, dir).select(col("event_id"),
        unix_timestamp(col("ts")).as("unix_s"),
        year(col("ts")).as("yr"), month(col("ts")).as("mo"),
        dayofmonth(col("ts")).as("dy"), hour(col("ts")).as("hr"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("iso"))),

    // conditional family — LAS class selection by version set
    // ({2}→1, {3}→6, {2,3}→1,6 — worker.py:139-147)
    "f3_las_classes" -> ((s, _) =>
      Tables.elevIndex(s).groupBy("tile_id")
        .agg(expr("bool_or(dir_version = 2)").as("h2"),
             expr("bool_or(dir_version = 3)").as("h3"))
        .select(col("tile_id"),
          when(col("h2") && col("h3"), "1,6")
            .when(col("h3"), "6")
            .when(col("h2"), "1")
            .otherwise("").as("las_classes"))),

    // regex/string family — path decomposition + normalization
    // (controller.py:654-667, tileconfig.py:455-461)
    "f4_path_parse" -> ((s, _) =>
      Tables.elevFilesRaw(s).select(col("path"),
        regexp_extract(col("path"), "^(.*)/[^/]*$", 1).as("dir"),
        lower(regexp_extract(col("path"), "([^/]*)$", 1)).as("base"),
        regexp_extract(lower(col("path")), "\\.([a-z0-9]+)$", 1).as("ext"))),

    // array/generator family — explode the per-tile file list back to rows
    // (the UDTF surface of S5; SURVEY §2.11)
    "f5_explode_files" -> ((s, _) => {
      val a8 = AggOps.queries("a8_priority_dedup")(s, "")
      a8.select(col("tile_id"),
        explode(split(col("file_list"), ",")).as("path"))
    }),

    // map family — the reference's dict plumbing (tileconfig.py:598 file
    // index dicts, controller.py:359-368 directory mappings) as a
    // map-typed column: per tile, a map of elevation version → file
    // count, probed with element_at (missing key → NULL, like dict.get)
    "f7_map_index" -> ((s, _) => {
      val counts = Tables.elevIndex(s)
        .groupBy("tile_id", "dir_version").agg(count(lit(1)).as("cnt"))
      counts.groupBy("tile_id")
        .agg(map_from_entries(sort_array(
          collect_list(struct(col("dir_version"), col("cnt"))))).as("m"))
        .select(col("tile_id"),
          size(col("m")).as("n_versions"),
          element_at(col("m"), lit(2)).as("v2_files"),
          element_at(col("m"), lit(3)).as("v3_files"))
    }),

    // json family — parse the per-event JSON props column and aggregate
    // on the extracted field (the reference's JSON schema-registry /
    // config parsing, controller.py:43-89, as a data-plane operator)
    "f6_json_props" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), min("k").as("min_k"), max("k").as("max_k"),
          round(avg("k"), 6).as("avg_k")))
  )

  def oracles: Map[String, String] = Map(
    "f1_dsn_strings" -> Sql.query(Sql.boundaries)(
      """SELECT tile_id,
        |       regexp_replace(
        |         'PG:dbname=baseregisters host=localhost port=5432 active_schema=tiles tables=placeholder',
        |         'tables=[a-z_]+', 'tables=t_' || tile_id) AS dsn
        |FROM boundaries""".stripMargin),

    "f2_dates" -> (
      """SELECT event_id,
        |       epoch_ns(ts) // 1000000000 AS unix_s,
        |       CAST(year(ts) AS INT) AS yr, CAST(month(ts) AS INT) AS mo,
        |       CAST(day(ts) AS INT) AS dy, CAST(hour(ts) AS INT) AS hr,
        |       strftime(ts, '%Y-%m-%d %H:%M:%S') AS iso
        |FROM events""".stripMargin),

    "f3_las_classes" -> Sql.query(Sql.elevFiles, Sql.elevIndex)(
      """SELECT tile_id,
        |       CASE WHEN h2 AND h3 THEN '1,6'
        |            WHEN h3 THEN '6'
        |            WHEN h2 THEN '1'
        |            ELSE '' END AS las_classes
        |FROM (SELECT tile_id, bool_or(dir_version = 2) AS h2,
        |             bool_or(dir_version = 3) AS h3
        |      FROM elev_index GROUP BY tile_id) t""".stripMargin),

    "f4_path_parse" -> Sql.query(Sql.elevFiles)(
      """SELECT path,
        |       regexp_extract(path, '^(.*)/[^/]*$', 1) AS dir,
        |       lower(regexp_extract(path, '([^/]*)$', 1)) AS base,
        |       regexp_extract(lower(path), '\.([a-z0-9]+)$', 1) AS ext
        |FROM elev_files""".stripMargin),

    "f5_explode_files" -> Sql.query(Sql.elevFiles, Sql.elevIndex)(
      """SELECT tile_id, unnest(string_split(file_list, ',')) AS path
        |FROM (SELECT tile_id,
        |             string_agg(path, ',' ORDER BY path) AS file_list
        |      FROM (SELECT *, MIN(priority) OVER (PARTITION BY tile_id) AS minp
        |            FROM elev_index) t
        |      WHERE priority = minp
        |      GROUP BY tile_id) g""".stripMargin),

    // f7: independent formulation — conditional aggregation instead of a
    // map type; element_at's missing-key NULL must equal the absent CASE
    "f7_map_index" -> Sql.query(Sql.elevFiles, Sql.elevIndex)(
      """SELECT tile_id, CAST(COUNT(*) AS INT) AS n_versions,
        |       MAX(CASE WHEN dir_version = 2 THEN cnt END) AS v2_files,
        |       MAX(CASE WHEN dir_version = 3 THEN cnt END) AS v3_files
        |FROM (SELECT tile_id, dir_version, COUNT(*) AS cnt
        |      FROM elev_index GROUP BY tile_id, dir_version) g
        |GROUP BY tile_id""".stripMargin),

    "f6_json_props" ->
      """SELECT event_type, COUNT(*) AS n,
        |       MIN(k) AS min_k, MAX(k) AS max_k,
        |       ROUND(AVG(k), 6) AS avg_k
        |FROM (SELECT event_type,
        |             CAST(json_extract_string(props, '$.k') AS INT) AS k
        |      FROM events) t
        |GROUP BY event_type""".stripMargin
  )
}
