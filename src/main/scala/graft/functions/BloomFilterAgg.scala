package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Bloom-filter sketch over a long key column — the semi-join
  * REDUCTION sketch for big⋈big joins with a selective build side
  * (SURVEY §2.11 UDAF surface, alongside [[EnvelopeUnion]] /
  * [[TopKByHash]]).
  *
  * Why this exists: when the build side of a join is filtered but still
  * too large to broadcast as ROWS, the scale-correct move is to
  * broadcast a fixed-size bitset of its keys and pre-filter the probe
  * side BEFORE the shuffle — the join's exchange then carries only
  * probe rows that can possibly match (plus a bounded false-positive
  * residue), instead of the whole fact table. Spark's own runtime
  * row-level filtering does exactly this internally; this aggregator is
  * the same algebra as an explicit, testable operator: `reduce` sets k
  * bits per key, `merge` ORs bitsets (associative + commutative, so
  * map-side partial aggregation is sound), and the finished sketch is a
  * plain `Array[Long]` — `numBits/8` bytes regardless of key count.
  *
  * Hashing is Kirsch–Mitzenmacher double hashing over two splitmix64
  * finalizer mixes: probe i hits bit `(h1 + i·h2) mod numBits`. No
  * false negatives by construction; the false-positive rate at
  * [[BloomFilterAgg.BitsPerKey]] bits/key with [[BloomFilterAgg.Hashes]]
  * probes is ~0.3% (measured in BloomFilterSpec).
  */
final class BloomFilterAgg(numBits: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64: $numBits")

  override def zero: Array[Long] = new Array[Long](numBits >>> 6)

  override def reduce(b: Array[Long], key: Long): Array[Long] = {
    BloomFilterAgg.set(b, key); b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(r: Array[Long]): Array[Long] = r

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object BloomFilterAgg {
  /** Sketch sizing: ~12 bits/key with 8 probes ≈ 0.3% FPP (k = ln2·m/n
    * rounds to 8). 12 bits/key keeps a 10M-key build side at ~15 MB —
    * broadcastable where the 10M keys themselves are not. */
  val BitsPerKey = 12
  val Hashes = 8

  /** Bit count for an expected `n` keys, rounded up to a multiple of 64
    * with a small floor so tiny build sides still get a sparse bitset. */
  def sizeFor(n: Long): Int = {
    val raw = math.max(1024L, n * BitsPerKey)
    math.min(raw + 63 & ~63L, 1 << 28).toInt
  }

  /** splitmix64 finalizer — a full-avalanche 64-bit mix. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def set(bits: Array[Long], key: Long): Unit = {
    val numBits = bits.length << 6
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < Hashes) {
      val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      bits(pos >>> 6) |= 1L << (pos & 63)
      i += 1
    }
  }

  /** Membership probe against a finished sketch (false positives only). */
  def contains(bits: Array[Long], key: Long): Boolean = {
    val numBits = bits.length << 6
    val h1 = mix(key)
    val h2 = mix(key ^ 0x5851f42d4c957f2dL) | 1L
    var i = 0
    while (i < Hashes) {
      val pos = java.lang.Math.floorMod(h1 + i.toLong * h2, numBits.toLong).toInt
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
