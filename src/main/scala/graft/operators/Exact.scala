package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent aggregation over decimal-valued doubles.
  *
  * Fixture prices/discounts/monitor values are 2-decimal quantities
  * stored as doubles. Summing them AS doubles is order-dependent
  * (float addition does not associate), and Spark's partial-aggregation
  * order differs from DuckDB's sequential scan — so `round(sum(x), 2)`
  * can land on opposite sides of a half-cent boundary (round 4's
  * q10_returned_items: the rank-8 revenue summed to exactly
  * 307843.595, rounding to .59 on one engine and .60 on the other).
  *
  * The fix: cast every addend to DECIMAL(18,4) first. The cast is a
  * deterministic per-row nearest-decimal conversion (identical on both
  * engines for 2-decimal data), and decimal addition is EXACT, so the
  * sum is the same in every order and every partitioning. Rounding the
  * exact decimal is half-up on both engines; the final cast to double
  * (scaled magnitude << 2^53) is correctly rounded on both. The result
  * is bit-identical regardless of plan shape, parallelism, or scale.
  *
  * Ratios/averages of exact integers (counts, byte lengths) do NOT
  * need this: integer sums are exact in double well past 2^53, both
  * engines then divide identical doubles, and both ROUND half-up at
  * exact decimal boundaries (verified: round(0.0390625, 6) = 0.039063
  * on Spark and DuckDB). Only non-exact-double summation is hazardous.
  */
object Exact {

  /** A 2-decimal money/measure double as an exact DECIMAL(18,4). */
  def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Order-independent `round(sum(x), scale)` over decimal-valued
    * doubles, returned as double for schema parity with the oracle.
    * DuckDB mirror: `CAST(ROUND(SUM(CAST(x AS DECIMAL(18,4))), s) AS DOUBLE)`.
    *
    * Note: each ADDEND is quantized to 4 decimals before summing, so
    * this is the sum of per-row-rounded values, not the rounded true
    * sum. For ≤4-decimal inputs (all fixture money/monitor columns) the
    * two are identical; if higher-precision inputs are ever introduced,
    * widen the cast scale (e.g. DECIMAL(28,12)) as [[decAvg]] does —
    * and mirror the wider cast in the oracle SQL.
    */
  def decSum(c: Column, scale: Int): Column =
    round(sum(dec(c)), scale).cast("double")

  /** Same, for an already-decimal expression (e.g. a product of two
    * [[dec]] casts — revenue `dec(price) * (1 - dec(discount))`). */
  def decSumExpr(e: Column, scale: Int): Column =
    round(sum(e), scale).cast("double")

  /** Order-independent average of full-precision doubles: per-row
    * DECIMAL(28,12) cast, exact decimal sum rounded to 8 (keeps the
    * scaled integer << 2^53 for the double cast), then one double
    * division by the group count. DuckDB mirror:
    * `ROUND(CAST(ROUND(SUM(CAST(x AS DECIMAL(28,12))), 8) AS DOUBLE) / COUNT(*), s)`.
    * (DuckDB promotes decimal division to double, so the division must
    * happen in double on both sides — only the SUM needs decimal.)
    *
    * Parity caveat: the double→DECIMAL(28,12) cast is order-independent
    * WITHIN each engine, but the two engines quantize differently on a
    * 12th-decimal tie — Spark converts via the shortest decimal string
    * (BigDecimal.valueOf) while DuckDB rounds the exact binary value.
    * Full-precision doubles essentially never land on such a tie (the
    * gate has stayed green), but if a flake ever appears in an avg
    * consumer (pp3's avg_sim), round the input per-row to a fixed scale
    * on BOTH engines before aggregating.
    */
  def decAvg(c: Column, scale: Int): Column =
    round(
      round(sum(c.cast("decimal(28,12)")), 8).cast("double") /
        count(lit(1)),
      scale)
}
