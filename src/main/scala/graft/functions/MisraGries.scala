package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

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
  * The 100 TB use: heavy hitters over a token stream whose distinct
  * count is corpus-sized. An exact groupBy must shuffle every distinct
  * token; the sketch pass shuffles k counters per partition, and the
  * (exact) verification pass then counts ONLY the ≤ k candidates —
  * approx-candidates → exact-verify, the same two-phase shape as the
  * dedup family (a19_heavy_hitters wires it up; the candidate superset
  * property is asserted in MisraGriesSpec).
  */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k > 0)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], w: String): Map[String, Long] =
    b.get(w) match {
      case Some(c) => b.updated(w, c + 1)
      case None if b.size < k => b.updated(w, 1L)
      case None => // decrement-all step: drop counters hitting zero
        b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
    }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count, keep strictly positive
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
    }
  }

  /** Candidate set only — counts are lower bounds, so the consumer runs
    * an exact counting pass over these ≤ k items. Sorted for
    * determinism of the emitted relation. */
  override def finish(r: Map[String, Long]): Seq[String] = r.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
