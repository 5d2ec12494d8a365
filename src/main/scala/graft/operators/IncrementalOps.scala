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
    }),

    // K19 (extension) — SNAPSHOT DIFF: classify every key across two
    // table versions as added / removed / changed / unchanged — the audit
    // primitive behind incremental publishes ("what did this ingest
    // actually change?"). The revision here is a deterministic mutation
    // of orders (drop keys ≡1 mod 89, reprice keys ≡0 mod 97, insert a
    // shifted copy of keys ≡5 mod 101) so both engines derive base and
    // revision from the same parquet bytes. Shape: one full-outer join on
    // the primary key — the ONE place full-outer is right: both sides are
    // key-partitioned table versions of the same table, so at 100 TB with
    // both snapshots bucketed by key (k15's layout) the join is a
    // zero-shuffle sort-merge; the output is a per-class rollup, never a
    // row-level collect.
    "k19_snapshot_diff" -> ((s, dir) => {
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      val rev = base.filter(col("k") % 89 =!= 1)
        .withColumn("price",
          when(col("k") % 97 === 0, col("price") + 10.0).otherwise(col("price")))
        .unionByName(base.filter(col("k") % 101 === 5)
          .select((col("k") + 10000000L).as("k"), col("price")))
      base.as("b").join(rev.as("r"), col("b.k") === col("r.k"), "full_outer")
        .select(
          when(col("b.k").isNull, "added")
            .when(col("r.k").isNull, "removed")
            .when(col("b.price") =!= col("r.price"), "changed")
            .otherwise("unchanged").as("status"),
          coalesce(col("b.k"), col("r.k")).as("k"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), min("k").as("min_key"), max("k").as("max_key"))
        .orderBy("status")
    }),

    // K20 (extension) — INCREMENTAL STATS MAINTENANCE: per-partition
    // catalog stats (row count, min/max price) maintained by MERGING the
    // standing stats with the delta batch's stats — never re-scanning
    // the base. The semantics under test IS mergeability: the oracle
    // computes the same stats from the whole table in one pass, so the
    // gate proves merge(stats(base), stats(delta)) == stats(base∪delta)
    // — the algebraic property that makes O7's ANALYZE incremental at
    // 100 TB (count/min/max are commutative monoids; avg derives from
    // count+sum downstream; distinct counts would need a18's HLL merge).
    // The month split uses k12's snapshot-cut convention.
    "k20_stats_merge" -> ((s, dir) => {
      val cut = lit("1998-01-01").cast("timestamp")
      def stats(df: DataFrame): DataFrame = df
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n_rows"),
          min("o_totalprice").as("min_price"),
          max("o_totalprice").as("max_price"))
      val o = Tables.orders(s, dir)
      stats(o.filter(col("o_orderdate") < cut))
        .unionByName(stats(o.filter(col("o_orderdate") >= cut)))
        .groupBy("month")
        .agg(sum("n_rows").as("n_rows"),
          min("min_price").as("min_price"),
          max("max_price").as("max_price"))
        .orderBy("month")
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
        |ORDER BY source, out_file""".stripMargin,

    // k19: the oracle rebuilds the same deterministic revision and
    // classifies via the same full-outer compare
    "k19_snapshot_diff" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS price FROM orders),
        |rev AS (
        |  SELECT k, CASE WHEN k % 97 = 0 THEN price + 10.0 ELSE price END AS price
        |  FROM base WHERE k % 89 <> 1
        |  UNION ALL
        |  SELECT k + 10000000 AS k, price FROM base WHERE k % 101 = 5),
        |diff AS (
        |  SELECT CASE WHEN b.k IS NULL THEN 'added'
        |              WHEN r.k IS NULL THEN 'removed'
        |              WHEN b.price <> r.price THEN 'changed'
        |              ELSE 'unchanged' END AS status,
        |         COALESCE(b.k, r.k) AS k
        |  FROM base b FULL OUTER JOIN rev r ON b.k = r.k)
        |SELECT status, COUNT(*) AS n,
        |       MIN(k) AS min_key, MAX(k) AS max_key
        |FROM diff GROUP BY status ORDER BY status""".stripMargin,

    // k20: the oracle computes the SAME stats from the full table in one
    // pass — merge(base, delta) must equal recompute
    "k20_stats_merge" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |       COUNT(*) AS n_rows,
        |       MIN(o_totalprice) AS min_price,
        |       MAX(o_totalprice) AS max_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
