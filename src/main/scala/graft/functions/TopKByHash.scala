package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** One candidate for a bounded top-K selection: `ord` is the (ascending)
  * selection key, `id` the payload and tie-break. */
final case class KeyedId(ord: Long, id: Long)

/** Bounded top-K (smallest-`ord`-first) aggregate — the operator Spark's
  * built-ins lack: `groupBy(key).agg(topK)` keeps at most K elements in
  * every aggregation buffer, so the map-side partial pass already reduces
  * each (key × partition) slice to K rows and the shuffle carries
  * K·partitions rows per key instead of the key's whole population. The
  * window-function formulation (`row_number().over(partitionBy(key))`)
  * shuffles and sorts EVERY row of every key; this aggregator is the
  * plan a 100 TB per-group selection wants — same algebra as a
  * bounded-heap rollup, expressed as a merge-able Spark `Aggregator`
  * (the §2.11 UDAF surface, alongside [[EnvelopeUnion]]).
  *
  * Selection semantics match the hash-order sampling family (SampleOps):
  * ascending (ord, id) — deterministic, rand()-free.
  *
  * The buffer is a sorted Seq capped at K (K is small in every use —
  * sample/rebalance caps); merge is associative and commutative, so
  * partial aggregation stays sound (property-tested in PropertySpec).
  */
final class TopKByHash(k: Int) extends Aggregator[KeyedId, Seq[KeyedId], Seq[Long]] {
  private def cap(s: Seq[KeyedId]): Seq[KeyedId] =
    s.sortBy(e => (e.ord, e.id)).take(k)
  override def zero: Seq[KeyedId] = Seq.empty
  override def reduce(b: Seq[KeyedId], a: KeyedId): Seq[KeyedId] = cap(b :+ a)
  override def merge(x: Seq[KeyedId], y: Seq[KeyedId]): Seq[KeyedId] = cap(x ++ y)
  override def finish(r: Seq[KeyedId]): Seq[Long] = r.map(_.id)
  override def bufferEncoder: Encoder[Seq[KeyedId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KeyedId]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
