package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariants for the incremental-ingest operators (k12/k13). */
class IncrementalOpsSpec extends SparkSpec {

  test("k12: merge(snapshot, delta) == latest state per user over the full changelog") {
    // The CDC invariant that makes upsert-merge correct: merging the
    // pre-cut snapshot with the post-cut delta must reproduce the state
    // a full recompute would give.
    val merged = run("k12_upsert_merge").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getTimestamp(2))))
      .toMap
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    val direct = graft.sources.Tables.events(spark, Sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("user_id", "value", "ts").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getTimestamp(2))))
      .toMap
    assert(merged == direct)
  }

  test("k12: the delta side wins exactly for users active after the cut") {
    val cut = java.sql.Timestamp.valueOf(graft.operators.IncrementalOps.SnapshotCut)
    val activeAfter = graft.sources.Tables.events(spark, Sf)
      .filter(col("ts") >= lit(cut)).select("user_id")
      .distinct().collect().map(_.getLong(0)).toSet
    val srcs = run("k12_upsert_merge").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(srcs.filter(_._2 == "delta").keySet == activeAfter)
  }

  test("k22: the shard manifest is a lossless partition of the corpus") {
    val docs = graft.sources.Tables.documents(spark, Sf)
    val manifest = run("k22_shard_manifest").collect()
    // every document lands in exactly one shard: counts partition the corpus
    assert(manifest.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(manifest.map(_.getAs[Long]("n_chars")).sum ==
      docs.agg(sum("n_chars")).head().getLong(0))
    // the xor fingerprint recomputed straight from the table (no file
    // roundtrip) must match the read-back manifest — the write loses
    // nothing and the fingerprint is layout-independent
    import graft.operators.DedupOps
    val direct = docs
      .withColumn("shard",
        (DedupOps.h60("shard:", col("doc_id").cast("string")) % 16).cast("int"))
      .withColumn("fp", DedupOps.h60("fp:", col("text")))
      .groupBy("shard").agg(expr("bit_xor(fp)").as("content_fp"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val got = manifest.map(r =>
      r.getAs[Int]("shard") -> r.getAs[Long]("content_fp")).toMap
    assert(got == direct)
    // deterministic spread: no shard is empty at 500 docs over 16 shards
    assert(manifest.length == 16 && manifest.forall(_.getAs[Long]("n_docs") > 0))
  }

  test("k13: validity intervals tile each user's timeline with one open end") {
    val rows = run("k13_scd2_history").collect()
      .map(r => (r.getLong(0), r.getTimestamp(3),
        Option(r.getTimestamp(4)), r.getBoolean(5)))
    rows.groupBy(_._1).foreach { case (_, hist) =>
      val sorted = hist.sortBy(_._2.getTime)
      // adjacent: each row's valid_to is the next row's valid_from
      sorted.sliding(2).foreach {
        case Array((_, _, to, _), (_, from2, _, _)) =>
          assert(to.contains(from2))
        case _ => ()
      }
      // exactly the last row is current (open-ended)
      assert(sorted.init.forall(r => r._3.nonEmpty && !r._4))
      assert(sorted.last._3.isEmpty && sorted.last._4)
    }
  }
}
