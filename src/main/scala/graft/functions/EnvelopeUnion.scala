package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Axis-aligned envelope (the geometry model of SURVEY §7.1). */
final case class Envelope(xmin: Int, ymin: Int, xmax: Int, ymax: Int)

/** Geometric-union aggregate on the envelope model — the Spark
  * counterpart of the reference's `ST_UnaryUnion(ST_Collect(geom))`
  * dissolve (tile_processor/tileconfig.py:567-586, SURVEY §2.5 A1).
  *
  * Associative and commutative, so Spark runs it with map-side partial
  * aggregation; at 100 TB the shuffle carries one 16-byte buffer per
  * (group × partition), never the geometry rows.
  */
object EnvelopeUnion extends Aggregator[Envelope, Envelope, Envelope] {
  override def zero: Envelope =
    Envelope(Int.MaxValue, Int.MaxValue, Int.MinValue, Int.MinValue)
  override def reduce(b: Envelope, a: Envelope): Envelope = merge(b, a)
  override def merge(x: Envelope, y: Envelope): Envelope = Envelope(
    math.min(x.xmin, y.xmin), math.min(x.ymin, y.ymin),
    math.max(x.xmax, y.xmax), math.max(x.ymax, y.ymax))
  override def finish(r: Envelope): Envelope = r
  override def bufferEncoder: Encoder[Envelope] = Encoders.product[Envelope]
  override def outputEncoder: Encoder[Envelope] = Encoders.product[Envelope]
}
