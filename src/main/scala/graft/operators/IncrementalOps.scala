package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.OpModule
import graft.sources.Tables

/** Incremental-ingest operators: CDC upsert-merge and SCD2 history.
  *
  * A 100 TB training-data pipeline is never rebuilt from scratch — new
  * crawls/batches land as deltas that must merge into the standing
  * snapshot. The reference's closest analogue is its versioned-directory
  * precedence (latest dir wins per tile, tileconfig.py:455-520 /
  * SURVEY §2 E3/A8); these two operators generalize that latest-wins rule
  * from directories to keyed changelogs.
  *
  * Scale notes:
  *  - k12 is deliberately NOT a full-outer join: Spark cannot broadcast a
  *    full-outer side, and at 100 TB the base snapshot must not be
  *    re-shuffled per merge. The tag-union + per-key `row_number` form
  *    costs exactly one hash shuffle on the key — and when the base is
  *    bucketed by key at write time (the production layout, PlanSpec's
  *    bucketed-SMJ pin), only the delta moves.
  *  - k13 (SCD2) is one window per key — state is a single carried
  *    timestamp per row, no pair enumeration, no driver state.
  */
object IncrementalOps extends OpModule {

  /** Snapshot cut: events before it form the base snapshot, events at or
    * after it are the incoming delta batch (mid of the fixture's range). */
  val SnapshotCut = "2024-01-15 00:00:00"

  /** Latest event per user within a changelog slice (ts desc, event_id
    * desc tiebreak — event_id is unique, so the pick is deterministic). */
  private def latest(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "value", "ts")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // K12 — MERGE INTO semantics (upsert): delta rows replace matching
    // base rows, unmatched base rows survive, new delta keys insert.
    // 'delta' > 'base' lexically, so one descending sort key implements
    // whenMatched-update + whenNotMatched-insert.
    "k12_upsert_merge" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val cut = lit(SnapshotCut).cast("timestamp")
      val base = latest(ev.filter(col("ts") < cut)).withColumn("src", lit("base"))
      val delta = latest(ev.filter(col("ts") >= cut)).withColumn("src", lit("delta"))
      val w = Window.partitionBy("user_id").orderBy(col("src").desc)
      base.unionByName(delta)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "value", "ts", "src")
    }),

    // K13 — SCD type-2 history: every state change becomes a validity
    // interval [valid_from, valid_to), open-ended for the current row.
    "k13_scd2_history" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
      Tables.events(s, dir)
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"), col("value"),
          col("ts").as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .withColumn("is_current", col("valid_to").isNull)
    }),

    // K16 (extension) — small-file COMPACTION PLAN: assign each input
    // unit to an output file so files land near a target size — the lake
    // maintenance pass that keeps a 100 TB table's file count sane.
    // Deterministic offset binning: an exclusive running sum of sizes
    // per partition (source), bucket = floor(start_offset / target).
    // The window partitions on `source` — at scale this relation is
    // FILE-LEVEL METADATA (one row per data file from the catalog
    // listing, ~10^5 rows for 100 TB), not the data itself, so the
    // per-source window is over thousands of rows, never the corpus; the
    // data movement the plan describes happens downstream as a
    // partitioned rewrite that never shuffles (each output file reads
    // its listed inputs).
    "k16_compaction_plan" -> ((s, dir) => {
      val target = 4000L // bytes per output file (fixture-scaled)
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("start_off", coalesce(sum("n_chars").over(w), lit(0L)))
        .withColumn("out_file", floor(col("start_off") / lit(target)))
        .groupBy("source", "out_file")
        .agg(count(lit(1)).as("n_inputs"), sum("n_chars").as("n_bytes"))
        .orderBy("source", "out_file")
    })
  )

  def oracles: Map[String, String] = Map(
    "k12_upsert_merge" ->
      s"""WITH sides AS (
         |  SELECT user_id, value, ts,
         |         CASE WHEN ts >= TIMESTAMP '$SnapshotCut' THEN 'delta'
         |              ELSE 'base' END AS src,
         |         ROW_NUMBER() OVER (
         |           PARTITION BY user_id, ts >= TIMESTAMP '$SnapshotCut'
         |           ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events),
         |merged AS (
         |  SELECT user_id, value, ts, src,
         |         ROW_NUMBER() OVER (PARTITION BY user_id
         |                            ORDER BY src DESC) AS rn2
         |  FROM sides WHERE rn = 1)
         |SELECT user_id, value, ts, src FROM merged WHERE rn2 = 1""".stripMargin,

    "k13_scd2_history" ->
      """SELECT user_id, event_id, value, ts AS valid_from,
        |       LEAD(ts) OVER w AS valid_to,
        |       (LEAD(ts) OVER w IS NULL) AS is_current
        |FROM events WHERE user_id < 20
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "k16_compaction_plan" ->
      """WITH off AS (
        |  SELECT source, doc_id, n_chars,
        |         CAST(COALESCE(SUM(n_chars) OVER (
        |                PARTITION BY source ORDER BY doc_id
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |              0) AS BIGINT) AS start_off
        |  FROM documents)
        |SELECT source,
        |       CAST(FLOOR(start_off / 4000.0) AS BIGINT) AS out_file,
        |       COUNT(*) AS n_inputs,
        |       CAST(SUM(n_chars) AS BIGINT) AS n_bytes
        |FROM off GROUP BY source, out_file
        |ORDER BY source, out_file""".stripMargin
  )
}
