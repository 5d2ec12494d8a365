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
  * The buffer is a Seq capped at K, kept sorted ascending by (ord, id)
  * as an invariant (K is small in every use — sample/rebalance caps);
  * merge is associative and commutative, so partial aggregation stays
  * sound (property-tested in PropertySpec). The per-row `reduce` never
  * re-sorts: a full buffer rejects a non-qualifying row in O(1) (the
  * overwhelmingly common case once the heap warms up) and otherwise
  * shift-inserts at the ordered position; only `merge` walks both
  * (already sorted) halves.
  */
final class TopKByHash(k: Int) extends Aggregator[KeyedId, Seq[KeyedId], Seq[Long]] {
  private def lt(x: KeyedId, y: KeyedId): Boolean =
    x.ord < y.ord || (x.ord == y.ord && x.id < y.id)
  override def zero: Seq[KeyedId] = Seq.empty
  override def reduce(b: Seq[KeyedId], a: KeyedId): Seq[KeyedId] =
    if (k <= 0) b // degenerate cap: stay empty, as sortBy.take(k) did
    else if (b.length >= k && !lt(a, b.last)) b
    else {
      val i = b.indexWhere(e => lt(a, e)) match { case -1 => b.length; case n => n }
      val ins = (b.take(i) :+ a) ++ b.drop(i)
      if (ins.length > k) ins.take(k) else ins
    }
  override def merge(x: Seq[KeyedId], y: Seq[KeyedId]): Seq[KeyedId] = {
    // merge-walk two sorted runs, emitting at most k
    val out = scala.collection.mutable.ArrayBuffer.empty[KeyedId]
    var i = 0; var j = 0
    while (out.length < k && (i < x.length || j < y.length)) {
      if (j >= y.length || (i < x.length && lt(x(i), y(j)))) { out += x(i); i += 1 }
      else { out += y(j); j += 1 }
    }
    out.toSeq
  }
  override def finish(r: Seq[KeyedId]): Seq[Long] = r.map(_.id)
  override def bufferEncoder: Encoder[Seq[KeyedId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KeyedId]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** [[KeyedId]] with a string payload: `ord` is the (ascending) selection
  * key, `id` the payload and tie-break. */
final case class KeyedStr(ord: Long, id: String)

/** [[TopKByHash]] for string payloads — the same bounded-heap algebra
  * (same invariants, same merge-walk), with the tie-break comparing the
  * payload in UTF-8 BINARY order via [[UTF8String]], so the selection
  * agrees bit-for-bit with Spark's `<` on StringType columns and
  * DuckDB's default binary collation (a JVM `String.compareTo` would
  * order by UTF-16 code units and diverge on supplementary characters).
  * tx19 uses it to cap each document's co-occurrence contribution at K
  * hash-sampled tokens without the window formulation's corpus-wide
  * sort (measured: the row_number form sort-spilled ~99 GB at
  * gen-sf100 across its three re-computations). */
final class TopKStrByHash(k: Int)
    extends Aggregator[KeyedStr, Seq[KeyedStr], Seq[String]] {
  /** UTF-8 binary order WITHOUT materializing UTF8Strings: UTF-8 byte
    * order equals Unicode CODE-POINT order, which equals UTF-16 unit
    * order except that surrogate units (U+D800..DFFF, encoding
    * code points ≥ U+10000) sort below U+E000..FFFF in UTF-16 but above
    * every BMP char in code-point order — so remap surrogate units
    * above the BMP before comparing. `lt` runs up to K times per input
    * row in the map-side `reduce` hot path; the previous
    * `UTF8String.fromString` spelling allocated two byte arrays per
    * comparison (pinned against UTF8String order in PropertySpec, which
    * exercises the '😀' vs '￿' divergence on purpose).
    *
    * Precondition: WELL-FORMED UTF-16 input. For a string containing an
    * UNPAIRED surrogate unit the two orders genuinely diverge — Java's
    * UTF-8 encoder replaces the lone surrogate with '?' (0x3F) on the
    * UTF8String side, while this comparison remaps it above the BMP —
    * but no such string can reach here: every input flows from Spark
    * UTF8String values (parquet/JSON decoders already sanitize), and the
    * generated corpora are ASCII. */
  private def binCmp(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val ca = a.charAt(i); val cb = b.charAt(i)
      if (ca != cb) {
        val fa = if (ca >= 0xD800 && ca < 0xE000) ca + 0x10000 else ca.toInt
        val fb = if (cb >= 0xD800 && cb < 0xE000) cb + 0x10000 else cb.toInt
        return fa - fb
      }
      i += 1
    }
    a.length - b.length
  }
  private def lt(x: KeyedStr, y: KeyedStr): Boolean =
    x.ord < y.ord || (x.ord == y.ord && binCmp(x.id, y.id) < 0)
  override def zero: Seq[KeyedStr] = Seq.empty
  override def reduce(b: Seq[KeyedStr], a: KeyedStr): Seq[KeyedStr] =
    if (k <= 0) b
    else if (b.length >= k && !lt(a, b.last)) b
    else {
      val i = b.indexWhere(e => lt(a, e)) match { case -1 => b.length; case n => n }
      val ins = (b.take(i) :+ a) ++ b.drop(i)
      if (ins.length > k) ins.take(k) else ins
    }
  override def merge(x: Seq[KeyedStr], y: Seq[KeyedStr]): Seq[KeyedStr] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[KeyedStr]
    var i = 0; var j = 0
    while (out.length < k && (i < x.length || j < y.length)) {
      if (j >= y.length || (i < x.length && lt(x(i), y(j)))) { out += x(i); i += 1 }
      else { out += y(j); j += 1 }
    }
    out.toSeq
  }
  override def finish(r: Seq[KeyedStr]): Seq[String] = r.map(_.id)
  override def bufferEncoder: Encoder[Seq[KeyedStr]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[KeyedStr]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
