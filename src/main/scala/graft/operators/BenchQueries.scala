package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.OpModule
import graft.sources.Tables
import Exact.{dec, decSum, decSumExpr}

/** Headline analytical queries in the TPC-H mold over the fact tables —
  * the throughput showcase for Bench (classic scan-agg, join-agg-topk,
  * and star-join shapes).
  *
  * Scale notes: q1 is a pure scan+partial-agg (6 groups — the shuffle
  * carries only per-partition partials). q3 joins two facts on their
  * natural key and broadcasts nothing; ordering happens on the already
  * tiny aggregate. q5 stars lineitem against orders and three dimension
  * tables, every dimension broadcast.
  *
  * Every monetary sum goes through [[Exact]]: DECIMAL(18,4) addends,
  * exact decimal sum, round, cast to double. Rounding a DOUBLE sum to
  * 2 decimals is NOT order-safe — round 4's gate caught q10's rank-8
  * revenue at exactly 307843.595, where Spark's and DuckDB's summation
  * orders rounded to opposite cents (and revenue is an ORDER BY key,
  * so at other scales top-k membership itself could flip). Decimal
  * arithmetic makes the result identical in every summation order.
  */
object BenchQueries extends OpModule {

  /** Exact per-row revenue term: DECIMAL(18,4) price × (1 − discount). */
  private def revenue = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))

  /** The oracle-side mirror of [[revenue]] summed and rounded to 2. */
  private val RevSql =
    "CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * " +
      "(1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: pricing summary report
    "q1_pricing_summary" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          // quantity is integer-valued: its double sum is exact (and
          // order-independent) far past this scale, so sum/avg need no
          // decimal detour — see Exact's scaladoc
          sum("l_quantity").as("sum_qty"),
          decSum(col("l_extendedprice"), 2).as("sum_base_price"),
          decSumExpr(revenue, 2).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // TPC-H Q3 shape: top-10 revenue orders for one market segment
    "q3_top_orders" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
      val l = Tables.lineitem(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(decSumExpr(revenue, 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    }),

    // TPC-H Q6 shape: selective scan-aggregate (the pushdown showcase:
    // one scan, three pushed predicates, single-row result)
    "q6_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
                col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
                col("l_discount").between(0.05, 0.07) &&
                col("l_quantity") < 24)
        .agg(decSumExpr(dec(col("l_extendedprice")) * dec(col("l_discount")), 2)
          .as("revenue"))),

    // TPC-H Q14 shape: promotion revenue share for one month — broadcast
    // part join + a ratio of two aggregates. Both sums are exact-decimal
    // (order-independent); the ratio then divides two bit-identical
    // doubles, so the 6-decimal output cannot diverge between engines.
    "q14_promo_revenue" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-03-01 00:00:00")) &&
                col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
      val p = Tables.part(s, dir).select("p_partkey", "p_type")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .agg(
          decSumExpr(when(col("p_type").startsWith("PROMO"), revenue)
            .otherwise(lit(0)), 2).as("promo_rev"),
          decSumExpr(revenue, 2).as("total_rev"))
        .select(
          round(lit(100) * col("promo_rev") / col("total_rev"), 6).as("promo_pct"),
          col("promo_rev"), col("total_rev"))
    }),

    // TPC-H Q7 shape: revenue by supplier nation — the supplier-side
    // dimension chain (both dimensions broadcast; one fact shuffle for
    // the final group-by only)
    "q7_supplier_nation" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
      l.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(decSumExpr(revenue, 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q4 shape: order-priority counts gated by an EXISTS over the
    // other fact — the left-semi join form (no lineitem columns surface,
    // so the probe side carries keys only and duplicates never multiply
    // the count). Oracle uses a literal EXISTS subquery — an independent
    // formulation DuckDB decorrelates its own way.
    "q4_order_priority" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
                col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-06-01 00:00:00")))
        .select("l_orderkey")
      o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
    }),

    // TPC-H Q10 shape: returned-item revenue ranking — fact⋈fact on the
    // order key, both dimensions broadcast, top-k over the (already
    // tiny) per-customer aggregate. Revenue is the ORDER BY key, so it
    // MUST be the exact-decimal sum: the round-4 gate caught this exact
    // query flipping a cent (sum = 307843.595) under double summation.
    "q10_returned_items" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
                col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-04-01 00:00:00")))
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(decSumExpr(revenue, 2).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q18 shape: large-volume orders — a HAVING-filtered aggregate
    // over the fact drives a semi-selective join back to orders. The
    // quantity sums are exact in double (integer-valued addends), so no
    // rounding is needed and the big-key set is engine-identical.
    "q18_big_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(sum("l_quantity").as("tot_qty"))
        .filter(col("tot_qty") > 300)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir).select("c_custkey", "c_name")
      o.join(big, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("tot_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q5 shape: revenue per nation through the full dimension star
    "q5_nation_revenue" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(decSumExpr(revenue, 2).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // TPC-H Q8 shape: national market share — the deepest dimension star
    // in the surface (part, customer-nation-region, supplier-nation all
    // broadcast; the only shuffle is the per-year group-by). Share =
    // ratio of two exact-decimal sums computed in ONE pass via a
    // conditional addend, so numerator and denominator see the same rows
    // and divide as bit-identical doubles.
    "q8_market_share" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey", "o_orderdate")
      val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val ncust = Tables.nation(s, dir).select("n_nationkey", "n_regionkey")
      val r = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
      val p = Tables.part(s, dir).filter(col("p_type") === "STANDARD")
        .select("p_partkey")
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val nsup = Tables.nation(s, dir)
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(ncust), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nsup), col("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          decSumExpr(when(col("supp_nation") === "NATION_7", revenue)
            .otherwise(lit(0)), 2).as("nation_rev"),
          decSumExpr(revenue, 2).as("total_rev"))
        .select(col("o_year"),
          round(col("nation_rev") / col("total_rev"), 6).as("mkt_share"),
          col("nation_rev"), col("total_rev"))
        .orderBy("o_year")
    }),

    // TPC-H Q13 shape: customer order-count distribution — LEFT OUTER
    // join (zero-order customers must survive with count 0) feeding a
    // double aggregation. Both group-bys are partial-agg friendly; the
    // second one runs over ≤ |customers| rows.
    "q13_order_distribution" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select("c_custkey")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select("o_orderkey", "o_custkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q15 shape: top supplier by revenue — an aggregate compared
    // against its own scalar max. The max side re-aggregates the same
    // plan, so Spark's ReuseExchange serves both branches from one
    // shuffle; the equality cut is on exact-decimal revenue, so max
    // membership cannot flip with partitioning (round 4's q10 lesson).
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
                col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
                // explicit, so BOTH consumers of this subtree see the same
                // scan filters (the equi-join inserts isnotnull on its key
                // side only, which would otherwise break exchange identity
                // and scan the fact twice — ReuseExchange canonicalizes
                // expr ids, not differing Filter nodes)
                col("l_suppkey").isNotNull)
        .groupBy("l_suppkey")
        .agg(decSumExpr(revenue, 2).as("total_rev"))
      val best = rev.agg(max(col("total_rev")).as("max_rev"))
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_name")
      rev.join(broadcast(best), col("total_rev") === col("max_rev"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q16 shape: supplier breadth per part class — distinct-agg
    // after a broadcast join (count distinct expands to a two-phase
    // partial aggregate, never a driver-side distinct).
    "q16_part_suppliers" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_brand") =!= "Brand#5" &&
                !col("p_type").startsWith("PROMO") &&
                col("p_size").isin(1, 9, 19, 25, 36, 49))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q17 shape: small-quantity revenue — a correlated per-part
    // average decorrelated into a broadcast join (the per-part avg
    // relation is |parts(brand)|-sized). avg_qty = exact-double integer
    // sum / exact count, so the 0.2× threshold is bit-identical per
    // engine; the final /7 divides one exact-decimal-derived double.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_brand") === "Brand#23" && col("p_size") < 15)
        .select("p_partkey")
      val lp = Tables.lineitem(s, dir)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      val avgq = lp.groupBy(col("l_partkey").as("ap_key"))
        .agg((sum("l_quantity") / count(lit(1))).as("avg_qty"))
      lp.join(broadcast(avgq), col("l_partkey") === col("ap_key"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(decSum(col("l_extendedprice"), 2) / 7, 2).as("avg_yearly"))
    }),

    // TPC-H Q19 shape: disjunctive mixed-side predicate — three OR'd
    // conjunctions spanning both join sides, written in the join
    // condition so Catalyst's CNF conversion can push the common
    // per-side bounds below the broadcast join.
    "q19_disjunctive_revenue" -> ((s, dir) => {
      val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
      val l = Tables.lineitem(s, dir)
      val clause =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      l.join(broadcast(p), col("l_partkey") === col("p_partkey") && clause)
        .agg(decSumExpr(revenue, 2).as("revenue"))
    }),

    // TPC-H Q9 shape: product-type profit by supplier nation and year
    // (minus partsupp's supplycost, which this schema omits — profit
    // degenerates to revenue; the JOIN TOPOLOGY is the point: a
    // LIKE-filtered part dimension gates the fact, the supplier-nation
    // chain broadcasts, orders joins fact-to-fact for the year, and the
    // group-by shuffles only (nation, year) partials).
    "q9_product_profit" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_name").contains("bolt")).select("p_partkey")
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderdate")
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
        .agg(decSumExpr(revenue, 2).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q2 shape: minimum-cost supplier per part — the correlated
    // MIN subquery decorrelated into a per-part aggregate joined back on
    // value equality. The schema has no partsupp, so the (part, supplier)
    // relation is DISTINCT over lineitem's shipping pairs and "cost" is
    // the supplier's account balance — the SHAPE (multi-dimension gate,
    // per-group min, equality re-join, deterministic top-k) is the
    // point. Scale: the distinct is one partial-agg'd shuffle on the
    // composite key; every dimension broadcasts; the per-part min
    // relation is |qualifying parts|-sized and broadcasts back.
    "q2_min_cost_supplier" -> ((s, dir) => {
      val p = Tables.part(s, dir)
        .filter(col("p_type") === "LARGE" && col("p_size") < 10)
        .select("p_partkey", "p_name")
      val pairs = Tables.lineitem(s, dir)
        .select("l_partkey", "l_suppkey").distinct()
      val sup = Tables.supplier(s, dir)
        .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name", "n_regionkey")
      val r = Tables.region(s, dir).filter(col("r_name") === "EUROPE")
        .select("r_regionkey")
      val cand = pairs
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      val minBal = cand.groupBy(col("p_partkey").as("mp_key"))
        .agg(min("s_acctbal").as("min_bal"))
      cand.join(broadcast(minBal),
          col("p_partkey") === col("mp_key") && col("s_acctbal") === col("min_bal"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"))
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q11 shape: important stock — per-group value with a HAVING
    // cut against a scalar derived from the global total. Value =
    // Σ price×qty over one nation's suppliers (the schema's stand-in
    // for supplycost×availqty), summed as exact decimal. The cut is
    // value > 3 × average-part-value, stated multiplicatively
    // (value·n > 3·total) so each side is ONE IEEE multiply of
    // exact-decimal-derived doubles — bit-identical on both engines,
    // and (unlike TPC-H's literal 0.0001·total, which TPC-H itself
    // rescales by 1/SF) scale-FREE: selectivity is ~3-4% at every
    // measured decade instead of decaying to zero as parts grow.
    // Scale: one fact shuffle on the part key; the scalar (total, n)
    // aggregates the value relation and broadcasts.
    "q11_important_stock" -> ((s, dir) => {
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val n = Tables.nation(s, dir).filter(col("n_name") === "NATION_3")
        .select("n_nationkey")
      val base = Tables.lineitem(s, dir)
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      val value = base.groupBy("l_partkey")
        .agg(decSumExpr(dec(col("l_extendedprice")) * dec(col("l_quantity")), 2)
          .as("stock_value"))
      // the per-part values are 2-decimal doubles: re-sum them as exact
      // decimal (a double sum would be order-dependent and could flip
      // the threshold cut between engines)
      val total = value.agg(sum(dec(col("stock_value"))).cast("double")
        .as("total_value"), count(lit(1)).as("n_parts"))
      value.crossJoin(broadcast(total))
        .filter(col("stock_value") * col("n_parts") > col("total_value") * lit(3))
        .select(col("l_partkey").as("p_partkey"), col("stock_value"))
        .orderBy(col("stock_value").desc, col("p_partkey"))
    }),

    // TPC-H Q12 shape: shipping-class service levels — fact⋈fact with a
    // date window and a two-way conditional count split by order
    // priority (l_returnflag stands in for the schema's absent
    // l_shipmode). Pure integer counts; one shuffle for the join, the
    // 3-group aggregate carries partials only.
    "q12_ship_priority" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
                col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .select("l_orderkey", "l_returnflag")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0)
            .otherwise(1)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q20 shape: suppliers over a shipped-quantity threshold for a
    // part class — the nested semi-join chain: an aggregate-HAVING inner
    // relation (per part×supplier 1997 shipments, the stand-in for
    // availqty's 50% rule) is gated by a LIKE-filtered part dimension,
    // and suppliers are kept by LEFT SEMI against the surviving pairs.
    // Integer-exact throughout. Scale: the only fact shuffle is the
    // (part, supplier) aggregate; parts broadcast into it; the semi
    // probe side carries keys only.
    "q20_supplier_part_threshold" -> ((s, dir) => {
      val p = Tables.part(s, dir).filter(col("p_name").startsWith("red"))
        .select("p_partkey")
      val qty = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
                col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(sum("l_quantity").as("tot_qty"))
        .filter(col("tot_qty") > 45)
        .select("l_suppkey")
      val n = Tables.nation(s, dir).filter(col("n_name") === "NATION_9")
        .select("n_nationkey")
      Tables.supplier(s, dir)
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"), "left_semi")
        .join(qty, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    }),

    // TPC-H Q21 shape: suppliers who kept orders waiting — the classic
    // EXISTS(another supplier) + NOT EXISTS(another LATE supplier)
    // double correlation, computed as per-order distinct counts instead
    // of correlated probes: an order contributes to supplier S iff S
    // shipped late, the order has ≥ 2 suppliers, and exactly one
    // supplier (then necessarily S) shipped late. "Late" is shipdate >
    // orderdate + 60 days (the schema has no commit/receipt dates).
    // The oracle keeps the literal EXISTS/NOT-EXISTS formulation —
    // an independent decorrelation done DuckDB's way. Scale: one fact
    // shuffle on the order key computes both distinct counts map-side-
    // partially; the late-pair relation rides the same exchange;
    // supplier/nation broadcast.
    "q21_waiting_supplier" -> ((s, dir) => {
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val l = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      val perOrder = l.groupBy("o_orderkey")
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      val latePairs = l.filter(col("late"))
        .select(col("o_orderkey").as("lp_okey"), col("l_suppkey")).distinct()
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_name", "s_nationkey")
      val n = Tables.nation(s, dir).filter(col("n_name") === "NATION_5")
        .select("n_nationkey")
      latePairs
        .join(perOrder, col("lp_okey") === col("o_orderkey"), "left_semi")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // TPC-H Q22 shape: idle rich customers — a scalar subquery cutoff
    // (exact-decimal mean of positive balances, broadcast as one row)
    // plus a LEFT ANTI join against recent orders ("no order since
    // mid-2000" — every customer has SOME order at this SF, so recency
    // is what makes the anti join non-vacuous). The cutoff divides an
    // exact decimal sum cast to double by an exact count, so the >
    // comparison sees bit-identical operands on both engines.
    "q22_idle_balance" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val cutoff = c.filter(col("c_acctbal") > 0)
        .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1)))
          .as("cutoff"))
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
      val recent = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("2000-07-01 00:00:00")))
        .select("o_custkey")
      c.crossJoin(broadcast(cutoff))
        .filter(col("c_acctbal") > col("cutoff"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("numcust"),
          decSum(col("c_acctbal"), 2).as("totacctbal"))
        .orderBy("n_name")
    })
  )

  def oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        |       SUM(l_quantity) AS sum_qty,
        |       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
        |         AS sum_base_price,
        |       $RevSql AS sum_disc_price,
        |       ROUND(AVG(l_quantity), 6) AS avg_qty,
        |       COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_top_orders" ->
      s"""SELECT o_orderkey, o_orderdate, o_orderpriority,
        |       $RevSql AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '2000-01-01'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |                      CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE)
        |         AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q14_promo_revenue" ->
      s"""SELECT ROUND(100 * promo_rev / total_rev, 6) AS promo_pct,
        |       promo_rev, total_rev
        |FROM (
        |  SELECT CAST(ROUND(SUM(CASE WHEN p_type LIKE 'PROMO%'
        |                   THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
        |                        (1 - CAST(l_discount AS DECIMAL(18,4)))
        |                   ELSE 0 END), 2) AS DOUBLE) AS promo_rev,
        |         $RevSql AS total_rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01') t""".stripMargin,

    "q7_supplier_nation" ->
      s"""SELECT n_name,
        |       $RevSql AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate >= TIMESTAMP '1996-06-01')
        |GROUP BY o_orderpriority""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, n_name,
        |       $RevSql AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q18_big_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, tot_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, SUM(l_quantity) AS tot_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING SUM(l_quantity) > 300) b
        |  ON o_orderkey = b.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,

    "q5_nation_revenue" ->
      s"""SELECT r_name, n_name,
        |       $RevSql AS revenue,
        |       COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,

    "q8_market_share" ->
      s"""SELECT CAST(yr AS INT) AS o_year,
        |       ROUND(nation_rev / total_rev, 6) AS mkt_share,
        |       nation_rev, total_rev
        |FROM (
        |  SELECT DATE_PART('year', o_orderdate) AS yr,
        |         CAST(ROUND(SUM(CASE WHEN sn.n_name = 'NATION_7'
        |                  THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
        |                       (1 - CAST(l_discount AS DECIMAL(18,4)))
        |                  ELSE 0 END), 2) AS DOUBLE) AS nation_rev,
        |         $RevSql AS total_rev
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
        |  GROUP BY DATE_PART('year', o_orderdate)) t
        |ORDER BY o_year""".stripMargin,

    "q13_order_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |      FROM customer
        |      LEFT OUTER JOIN orders
        |        ON c_custkey = o_custkey
        |       AND o_orderpriority <> '4-NOT SPECIFIED'
        |      GROUP BY c_custkey) c
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
        |  SELECT l_suppkey, $RevSql AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1997-01-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q16_part_suppliers" ->
      """SELECT p_brand, p_type, p_size,
        |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_type NOT LIKE 'PROMO%'
        |  AND p_size IN (1, 9, 19, 25, 36, 49)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q17_small_qty_revenue" ->
      """SELECT ROUND(CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2)
        |                 AS DOUBLE) / 7, 2) AS avg_yearly
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN (SELECT l_partkey AS ap_key,
        |             SUM(l_quantity) / COUNT(*) AS avg_qty
        |      FROM lineitem
        |      JOIN part ON l_partkey = p_partkey
        |      WHERE p_brand = 'Brand#23' AND p_size < 15
        |      GROUP BY l_partkey) a ON l_partkey = ap_key
        |WHERE p_brand = 'Brand#23' AND p_size < 15
        |  AND l_quantity < 0.2 * avg_qty""".stripMargin,

    "q19_disjunctive_revenue" ->
      s"""SELECT $RevSql AS revenue
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q9_product_profit" ->
      s"""SELECT n_name AS nation,
        |       CAST(DATE_PART('year', o_orderdate) AS INT) AS o_year,
        |       $RevSql AS profit
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%bolt%'
        |GROUP BY n_name, DATE_PART('year', o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin,

    // independent formulation: the literal correlated-MIN subquery,
    // decorrelated DuckDB's way
    "q2_min_cost_supplier" ->
      """WITH cand AS MATERIALIZED (
        |  SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |  FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE p_type = 'LARGE' AND p_size < 10 AND r_name = 'EUROPE')
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM cand c
        |WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM cand c2
        |                   WHERE c2.p_partkey = c.p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q11_important_stock" ->
      """WITH value AS MATERIALIZED (
        |  SELECT l_partkey AS p_partkey,
        |         CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |                        CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
        |           AS stock_value
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3'
        |  GROUP BY l_partkey)
        |SELECT p_partkey, stock_value
        |FROM value
        |WHERE stock_value * (SELECT COUNT(*) FROM value) >
        |      3 * (SELECT CAST(SUM(CAST(stock_value AS DECIMAL(18,4)))
        |                       AS DOUBLE) FROM value)
        |ORDER BY stock_value DESC, p_partkey""".stripMargin,

    "q12_ship_priority" ->
      """SELECT l_returnflag,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // independent formulation: literal nested IN subqueries
    "q20_supplier_part_threshold" ->
      """SELECT s_suppkey, s_name
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_9'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (SELECT p_partkey FROM part
        |                        WHERE p_name LIKE 'red%')
        |      AND l_shipdate >= TIMESTAMP '1997-01-01'
        |      AND l_shipdate < TIMESTAMP '1998-01-01'
        |    GROUP BY l_partkey, l_suppkey
        |    HAVING SUM(l_quantity) > 45)
        |ORDER BY s_name""".stripMargin,

    // independent formulation: the literal EXISTS / NOT EXISTS double
    // correlation, decorrelated DuckDB's way
    "q21_waiting_supplier" ->
      """SELECT s_name, COUNT(*) AS numwait
        |FROM (
        |  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
        |  FROM lineitem l1
        |  JOIN orders ON o_orderkey = l1.l_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |    AND EXISTS (SELECT 1 FROM lineitem l2
        |                WHERE l2.l_orderkey = l1.l_orderkey
        |                  AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                    WHERE l3.l_orderkey = l1.l_orderkey
        |                      AND l3.l_suppkey <> l1.l_suppkey
        |                      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |) t
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_5'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,

    "q22_idle_balance" ->
      """SELECT n_name, COUNT(*) AS numcust,
        |       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE)
        |         AS totacctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4)))
        |                               AS DOUBLE) / COUNT(*)
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-07-01')
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin
  )
}
