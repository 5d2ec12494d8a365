package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomFilterAgg

/** [[graft.functions.BloomFilterAgg]] — the semi-join reduction sketch
  * behind j12_bloom_prune. */
class BloomFilterSpec extends SparkSpec {

  test("no false negatives: every inserted key probes true") {
    val agg = new BloomFilterAgg(4096)
    val keys = (0L until 500L).map(k => k * 7919L - 3L)
    val bits = keys.foldLeft(agg.zero)(agg.reduce)
    assert(keys.forall(BloomFilterAgg.contains(bits, _)))
  }

  test("merge is the bitwise OR of the halves (partial-agg soundness)") {
    val agg = new BloomFilterAgg(1024)
    val (a, b) = (0L until 400L).partition(_ % 3 == 0)
    val whole = (a ++ b).foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
                           b.foldLeft(agg.zero)(agg.reduce))
    assert(merged.sameElements(whole))
  }

  test("false-positive rate at sizeFor(n) stays near the design point") {
    val n = 5000L
    val agg = new BloomFilterAgg(BloomFilterAgg.sizeFor(n))
    val bits = (0L until n).foldLeft(agg.zero)(agg.reduce)
    val probes = (1L to 20000L).map(_ + 1000000L) // disjoint from inserts
    val fp = probes.count(BloomFilterAgg.contains(bits, _))
    // design FPP ~0.3% at 12 bits/key, 8 probes; allow generous slack
    assert(fp.toDouble / probes.size < 0.02, s"fpp=${fp.toDouble / probes.size}")
  }

  test("j12 equals the plain join, and the sketch prunes the probe side") {
    import spark.implicits._
    val dir = Sf
    val plain = sources.Tables.lineitem(spark, dir)
      .join(sources.Tables.orders(spark, dir)
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n_items"))
      .as[(Int, Long)].collect().toMap
    val got = run("j12_bloom_prune")
      .select(col("o_year"), col("n_items")).as[(Int, Long)].collect().toMap
    assert(got == plain)

    // pruning power on the fixture: the bloom passes a small superset of
    // the truly-matching fact rows, far below the full table
    val li = sources.Tables.lineitem(spark, dir)
    val sel = sources.Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val numBits = BloomFilterAgg.sizeFor(sel.count())
    val sketch = sel.as[Long].select(new BloomFilterAgg(numBits).toColumn).head()
    val bf = spark.sparkContext.broadcast(sketch)
    val probe = udf((k: Long) => BloomFilterAgg.contains(bf.value, k))
    val total = li.count()
    val passed = li.filter(probe(col("l_orderkey"))).count()
    val matching = li.join(sel, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(passed >= matching)                    // no false negatives
    assert(passed <= matching + total / 50 + 10)  // ≤ ~2% FPP residue
    assert(passed < total / 2)                    // the filter actually prunes
  }

  test("an empty build side yields an everything-rejecting probe, not a crash") {
    // stat.bloomFilter on an empty frame NPEs (null sketch bytes from the
    // zero-row aggregate), so bloomProbe must short-circuit to false —
    // the correct empty-join semantics — instead of building a sketch
    val empty = sources.Tables.orders(spark, Sf).filter(lit(false))
      .select("o_orderkey")
    val li = sources.Tables.lineitem(spark, Sf)
    assert(li.filter(
        operators.JoinOps.bloomProbe(empty, "o_orderkey", col("l_orderkey")))
      .count() == 0L)
  }

  test("built-in might_contain probe matches the custom UDAF's guarantees") {
    val li = sources.Tables.lineitem(spark, Sf)
    val sel = sources.Tables.orders(spark, Sf)
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val bf = sel.stat.bloomFilter(col("o_orderkey"), sel.count(), 0.003)
    val total = li.count()
    val passed =
      li.filter(operators.JoinOps.mightContain(bf, col("l_orderkey"))).count()
    val matching =
      li.join(sel, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    // identical contract to the custom probe above: zero false negatives,
    // bounded false-positive residue, real pruning — the two sketches are
    // interchangeable for the semi-join reduction; j12 ships the built-in
    // because its probe compiles into whole-stage codegen (PlanSpec pin)
    assert(passed >= matching)
    assert(passed <= matching + total / 50 + 10)
    assert(passed < total / 2)
  }
}
