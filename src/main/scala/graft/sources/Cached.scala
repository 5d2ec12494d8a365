package graft.sources

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped memo of persisted intermediate relations that several
  * operators share (document shingles, MinHash bands, token streams).
  *
  * The dedup/text families all derive from the same two relations
  * (explode-to-shingles, explode-to-tokens); rebuilding and re-persisting
  * them per query both recomputes the explode and leaks cached partitions
  * across a long sweep (the round-2 bench regression). One memo keyed by
  * (session, relation, data dir) gives every query the same persisted
  * frame — the Spark analogue of the reference threading one file index
  * through its per-tile workers (tileconfig.py:395-499) — and one
  * [[releaseAll]] call frees everything deterministically.
  *
  * MEMORY_AND_DISK: at 100 TB these relations exceed executor memory;
  * spilled blocks beat recomputing a corpus-wide explode.
  */
object Cached {
  private val memo = TrieMap.empty[(SparkSession, String), DataFrame]

  /** Memoize `build` per (session, key), persisted. The session REFERENCE
    * is part of the key — unlike a bare identity hash code (not unique;
    * a post-GC collision would hand out a frame bound to a dead session),
    * reference equality disambiguates hash collisions. Entries whose
    * owning session has stopped are purged on the way in, so the memo
    * never pins a stopped session's plans past the next use. */
  def of(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    memo.filterInPlace((k, _) => !k._1.sparkContext.isStopped)
    memo.getOrElseUpdate((s, key),
      build.persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** Unpersist and forget every memoized relation (harness teardown). */
  def releaseAll(): Unit = {
    memo.values.foreach(df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () })
    memo.clear()
  }
}
