package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass MinHash signature aggregate: all `numHashes` seeded
  * 60-bit mins of a shingle column in ONE buffer (`long[numHashes]`),
  * no row explosion.
  *
  * Value contract: slot i holds MIN over the group's shingles of
  * [[Hash60.hash]]("i:" + sh) — bit-identical to the exploded
  * `groupBy(doc, seed).agg(min(h60(seed || ':', sh)))` form (pinned in
  * LshSpec) and to the oracle's generate_series MIN, so swapping this
  * in under dd14 changes the PLAN, never the values.
  *
  * Why: at the production setting (128 hashes) the exploded form
  * materializes 128 struct rows per shingle and hash-aggregates
  * |shingles|×128 rows on a (doc, seed) key — at sf1's 877k shingle
  * types that is ~112M rows through the partial agg for ~hundreds of
  * docs of output. Here the partial aggregate holds ONE 128-long buffer
  * per doc per partition (map-side combine built in), the shuffle
  * carries one array row per doc per partition, and the md5 work is
  * shared: the shingle's UTF-8 bytes are encoded once and digested
  * under each precomputed seed prefix, instead of 128 string concats.
  * CPU is the same hash count; memory traffic and agg hash pressure
  * drop by the explosion factor.
  */
final class MinHashSig(numHashes: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(numHashes > 0)

  // Buffer slot `numHashes` counts non-null shingles seen, so a group
  // with NO usable shingle finishes as NULL instead of leaking the
  // Long.MaxValue zero-buffer sentinel as a "signature" — the exploded
  // twin's min() over only-null hashes is NULL too, so the value
  // contract holds at this corner as well (pinned in LshSpec).
  override def zero: Array[Long] = {
    val b = Array.fill(numHashes + 1)(Long.MaxValue)
    b(numHashes) = 0L
    b
  }

  override def reduce(buf: Array[Long], sh: String): Array[Long] = {
    // null-tolerant like the exploded twin (h60 of null is null, and
    // min() skips it) — the equivalence contract must hold row-for-row
    if (sh == null) return buf
    buf(numHashes) += 1L
    val shBytes = sh.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = MinHashSig.md5.get()
    val prefixes = MinHashSig.prefixBytes(numHashes)
    var seed = 0
    while (seed < numHashes) {
      d.reset()
      d.update(prefixes(seed))
      d.update(shBytes)
      val h = MinHashSig.fold60(d.digest())
      if (h < buf(seed)) buf(seed) = h
      seed += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
    x(numHashes) += y(numHashes)
    x
  }

  override def finish(buf: Array[Long]): Seq[Long] =
    if (buf(numHashes) == 0L) null
    else scala.collection.immutable.ArraySeq.unsafeWrapArray(
      java.util.Arrays.copyOf(buf, numHashes))

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object MinHashSig {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** UTF-8 bytes of "0:", "1:", …, "(n-1):" — the seed prefixes of the
    * portable hash family, computed once per JVM per setting. */
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def prefixBytes(n: Int): Array[Array[Byte]] =
    prefixCache.computeIfAbsent(n, k =>
      Array.tabulate(k)(s =>
        (s.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  /** First 15 hex digits of an md5 digest as a 60-bit long — the same
    * fold as [[Hash60.hash]] (first 7 bytes + high nibble of byte 8). */
  private def fold60(digest: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (digest(i) & 0xffL); i += 1 }
    (v << 4) | ((digest(7) & 0xf0L) >> 4)
  }
}
