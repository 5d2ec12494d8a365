package graft

import org.apache.spark.sql.functions._
import graft.operators.Exact

/** Pins the order-independence contract of [[graft.operators.Exact]].
  *
  * Round 4's gate caught q10_returned_items flipping a cent: a revenue
  * group summed to exactly 307843.595 (a half-cent boundary) and
  * Spark's vs DuckDB's DOUBLE summation orders rounded to opposite
  * sides. These tests construct that boundary deliberately and assert
  * the decimal path produces the exact half-up result under EVERY
  * partitioning/order — which is precisely what double summation
  * cannot guarantee.
  */
class RoundingSpec extends SparkSpec {

  import spark.implicits._

  // price × (1 − discount) terms chosen so the exact revenue sum is
  // 415.6650 — a half-cent boundary: 333.35·0.93 = 310.0155,
  // 111.21·0.95 = 105.6495
  private val boundaryRows = Seq(
    (333.35, 0.07),
    (111.21, 0.05))

  test("decimal revenue sum rounds the half-cent boundary half-up, exactly") {
    val df = boundaryRows.toDF("price", "disc")
    val rev = Exact.dec(col("price")) * (lit(1) - Exact.dec(col("disc")))
    val out = df.agg(Exact.decSumExpr(rev, 2).as("revenue"))
      .as[Double].head()
    assert(out == 415.67) // 415.665 → half-up → 415.67, never 415.66
  }

  test("decimal sum is invariant under partitioning and row order") {
    // many 2-decimal addends whose double sum is order-sensitive
    val vals = (1 to 2000).map(i => ((i * 7919) % 100000) / 100.0)
    val expected = BigDecimal(
      vals.map(BigDecimal(_)).sum.setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .toString).toDouble
    for (parts <- Seq(1, 3, 16); seed <- Seq(1, 2)) {
      val shuffled = new scala.util.Random(seed).shuffle(vals)
      val got = shuffled.toDF("v").repartition(parts)
        .agg(Exact.decSum(col("v"), 2).as("s")).as[Double].head()
      assert(got == expected, s"parts=$parts seed=$seed")
    }
  }

  test("decAvg of full-precision doubles is invariant under partitioning") {
    // irrational-ish values like the vector_dot csims pp3 averages
    val vals = (1 to 500).map(i => math.sin(i.toDouble) * math.sqrt(i))
    val results = for (parts <- Seq(1, 4, 32)) yield
      vals.toDF("v").repartition(parts)
        .agg(Exact.decAvg(col("v"), 6).as("a")).as[Double].head()
    assert(results.distinct.size == 1,
      s"decAvg differed across partitionings: $results")
  }

  test("the double-sum formulation is NOT order-safe at the boundary (motivation)") {
    // Demonstrates why Exact exists: the same boundary fixture through
    // plain double arithmetic depends on summation order at the ulp
    // level — the exact value 415.665 is not representable in binary,
    // so round(double, 2) may land on either cent. We only assert the
    // decimal path disagrees with AT MOST one of the two double orders,
    // i.e. the decimal result is always the exact 415.67 while doubles
    // sit within one cent.
    val terms = Seq(310.0155, 105.6495)
    val d1 = terms.sum
    val d2 = terms.reverse.sum
    for (d <- Seq(d1, d2))
      assert(math.abs(BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble - 415.67) <= 0.01)
  }
}
