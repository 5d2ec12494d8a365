package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries buffer: `counts` stores offset-shifted values — an entry
  * is LIVE iff `stored > offset`, and its true counter is
  * `stored − offset`. The classic "decrement every counter by one" step
  * is the O(1) bump `offset += 1`; nothing is rewritten. `minStored` is
  * a lower bound on the minimum stored value, used to skip compaction
  * passes that provably cannot free a slot (no entry can be dead while
  * `minStored > offset`). */
final case class MGBuf(offset: Long, minStored: Long, counts: Map[String, Long])

/** Mergeable Misra–Gries heavy-hitter summary over a string column
  * (SURVEY §2.11 UDAF surface; the frequent-items member of the sketch
  * family next to HLL/a13 and the quantile sketch/a12).
  *
  * Guarantee: a k-counter summary retains EVERY item with true frequency
  * > n/k (undercounted by at most n/k, never over). Merging two
  * summaries (pointwise sum, then subtract the (k+1)-th largest count
  * and drop non-positives) preserves the same bound over the combined
  * stream — the "mergeable summaries" construction, which is exactly
  * what makes this a sound Spark `Aggregator`: map-side partials build
  * per-partition summaries, the reduce side merges them, and no
  * partition ever materializes its full vocabulary.
  *
  * Cost: the decrement-all step is an O(1) global-offset bump (an entry
  * is live iff `stored > offset`), NOT an O(k) rebuild — on the
  * low-frequency-heavy streams the sketch exists for (most tokens
  * non-resident), reduce is O(1) amortized per token. An O(k)
  * compaction runs only when the `minStored` bound says a counter has
  * actually died (each compaction frees at least one slot), so rebuild
  * work is charged to entry deaths, each of which required
  * ≥ (its count) prior arrivals.
  *
  * The 100 TB use: heavy hitters over a token stream whose distinct
  * count is corpus-sized. An exact groupBy must shuffle every distinct
  * token; the sketch pass shuffles k counters per partition, and the
  * (exact) verification pass then counts ONLY the ≤ k candidates —
  * approx-candidates → exact-verify, the same two-phase shape as the
  * dedup family (a19_heavy_hitters wires it up; the candidate superset
  * property is asserted in MisraGriesSpec).
  */
final class MisraGries(k: Int) extends Aggregator[String, MGBuf, Seq[String]] {
  require(k > 0)

  override def zero: MGBuf = MGBuf(0L, Long.MaxValue, Map.empty)

  /** True (offset-corrected) counters of the live entries. */
  def materialize(b: MGBuf): Map[String, Long] =
    b.counts.collect { case (w, c) if c > b.offset => w -> (c - b.offset) }

  override def reduce(b: MGBuf, w: String): MGBuf =
    b.counts.get(w) match {
      case Some(c) if c > b.offset => // live: plain increment
        b.copy(counts = b.counts.updated(w, c + 1))
      case _ if b.counts.size < k => // free slot (all resident entries live
        // whenever size < k — offset only ever bumps on a full summary)
        MGBuf(b.offset, math.min(b.minStored, b.offset + 1),
          b.counts.updated(w, b.offset + 1))
      case _ if b.minStored > b.offset => // full, all k live: the classic
        // decrement-all, as a constant-time epoch bump (w is discarded —
        // its implicit counter is decremented straight back to zero)
        b.copy(offset = b.offset + 1)
      case _ => // a counter has died: one O(k) compaction frees its slot
        val live = b.counts.filter(_._2 > b.offset)
        val min = if (live.isEmpty) Long.MaxValue else live.values.min
        if (live.size < k)
          MGBuf(b.offset, math.min(min, b.offset + 1),
            live.updated(w, b.offset + 1))
        else b.copy(minStored = min, offset = b.offset + 1)
    }

  override def merge(x: MGBuf, y: MGBuf): MGBuf = {
    val sum = materialize(y).foldLeft(materialize(x)) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    val kept =
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count, keep strictly positive
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    MGBuf(0L, if (kept.isEmpty) Long.MaxValue else kept.values.min, kept)
  }

  /** Candidate set only — counts are lower bounds, so the consumer runs
    * an exact counting pass over these ≤ k items. Sorted for
    * determinism of the emitted relation. */
  override def finish(r: MGBuf): Seq[String] = materialize(r).keys.toSeq.sorted

  override def bufferEncoder: Encoder[MGBuf] = ExpressionEncoder[MGBuf]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
