package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve encoding as a composition of built-in bitwise
  * Columns — no UDF, fully inside whole-stage codegen.
  *
  * Why it matters at 100 TB: sorting a fact table by the interleaved
  * bits of two filter columns clusters rows that are close in BOTH
  * dimensions into the same files, so parquet min/max footer stats prune
  * 2-D box queries down to a handful of files — single-column sort gives
  * this for one dimension only; Z-order gives (weaker) pruning on each
  * of them simultaneously. This is the layout trick behind
  * Delta/Iceberg `ZORDER BY`, expressed directly over the public API:
  * `repartitionByRange(zvalue).sortWithinPartitions(zvalue).write`.
  *
  * The bit-spread is the classic magic-mask doubling scheme: widen each
  * 32-bit input so its bits occupy even positions, then OR the second
  * input shifted up by one. Each step is `(x | x << s) & mask` over
  * longs — five shifts per dimension, constant-folded by codegen.
  */
object ZOrder {
  private val Spread: Seq[(Int, Long)] = Seq(
    16 -> 0x0000ffff0000ffffL,
    8 -> 0x00ff00ff00ff00ffL,
    4 -> 0x0f0f0f0f0f0f0f0fL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 32 bits of `c` onto the even bit positions. */
  def spread(c: Column): Column =
    Spread.foldLeft(c.cast("long").bitwiseAND(lit(0xffffffffL))) {
      case (x, (sh, m)) => x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(m))
    }

  /** 64-bit Z-value of two non-negative 32-bit dimensions. */
  def zvalue(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))

  /** Scalar reference implementation (spec cross-check only). */
  def zvalueRef(x: Int, y: Int): Long = {
    def sp(v: Long): Long =
      Spread.foldLeft(v & 0xffffffffL) { case (a, (sh, m)) => (a | (a << sh)) & m }
    sp(x.toLong) | (sp(y.toLong) << 1)
  }
}
