package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MGBuf, MisraGries}

/** [[graft.functions.MisraGries]] — the frequent-items sketch behind
  * a19_heavy_hitters. The algebra tests run sketch-only (no Spark). */
class MisraGriesSpec extends SparkSpec {

  private def summarize(mg: MisraGries, xs: Seq[String]): MGBuf =
    xs.foldLeft(mg.zero)(mg.reduce)

  /** Zipf-ish synthetic stream with vocabulary far above k. */
  private def stream(seed: Int): Seq[String] = {
    val hot = Seq.fill(400)(s"hot$seed") ++ Seq.fill(250)("shared")
    val cold = (0 until 600).map(i => s"cold${seed}_${i % 300}")
    // deterministic interleave (no RNG): rotate by a coprime stride
    val all = (hot ++ cold).toIndexedSeq
    (0 until all.size).map(i => all((i * 7 + seed) % all.size))
  }

  test("MG guarantee: every item with freq > n/k survives a k-counter summary") {
    val mg = new MisraGries(20)
    val xs = stream(1)
    val n = xs.size
    val exact = xs.groupBy(identity).view.mapValues(_.size).toMap
    val kept = mg.materialize(summarize(mg, xs)).keySet
    val mustKeep = exact.filter(_._2 > n / 20.0).keySet
    assert(mustKeep.subsetOf(kept), s"lost: ${mustKeep -- kept}")
    assert(kept.size <= 20)
  }

  test("merge preserves the guarantee over the combined stream") {
    val mg = new MisraGries(20)
    val (xs, ys) = (stream(2), stream(3))
    val merged = mg.materialize(mg.merge(summarize(mg, xs), summarize(mg, ys)))
    val all = xs ++ ys
    val exact = all.groupBy(identity).view.mapValues(_.size).toMap
    val mustKeep = exact.filter(_._2 > all.size / 20.0).keySet
    assert(mustKeep.subsetOf(merged.keySet), s"lost: ${mustKeep -- merged.keySet}")
    assert(merged.size <= 20)
    // counts are lower bounds, never overcounts
    merged.foreach { case (w, c) => assert(c <= exact(w), s"$w overcounted") }
  }

  test("merge order does not break the bound (3-way, both association orders)") {
    val mg = new MisraGries(16)
    val parts = Seq(stream(4), stream(5), stream(6)).map(summarize(mg, _))
    val left = mg.materialize(mg.merge(mg.merge(parts(0), parts(1)), parts(2)))
    val right = mg.materialize(mg.merge(parts(0), mg.merge(parts(1), parts(2))))
    val all = stream(4) ++ stream(5) ++ stream(6)
    val exact = all.groupBy(identity).view.mapValues(_.size).toMap
    val mustKeep = exact.filter(_._2 > all.size / 16.0).keySet
    for (m <- Seq(left, right)) {
      assert(mustKeep.subsetOf(m.keySet), s"lost: ${mustKeep -- m.keySet}")
      assert(m.size <= 16)
    }
  }

  test("offset-based reduce ≡ classic decrement-all MG (model check)") {
    // Third formulation: the textbook O(k)-rebuild step, kept here as the
    // model the amortized epoch-bump implementation must match exactly.
    def classic(k: Int, xs: Seq[String]): Map[String, Long] =
      xs.foldLeft(Map.empty[String, Long]) { (b, w) =>
        b.get(w) match {
          case Some(c) => b.updated(w, c + 1)
          case None if b.size < k => b.updated(w, 1L)
          case None => b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
        }
      }
    for (k <- Seq(1, 3, 16, 20); seed <- 1 to 6) {
      val mg = new MisraGries(k)
      val xs = stream(seed)
      assert(mg.materialize(summarize(mg, xs)) == classic(k, xs),
        s"divergence at k=$k seed=$seed")
    }
  }

  test("a19 equals the exact heavy-hitter query (sketch invisible to semantics)") {
    import spark.implicits._
    val got = run("a19_heavy_hitters").as[(String, Long)].collect().toMap
    val tok = operators.TextOps.tokens(spark, Sf).select("w")
    val n = tok.count()
    val exact = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(n) / 100.0)
      .as[(String, Long)].collect().toMap
    assert(got == exact)
    assert(got.nonEmpty) // the fixture genuinely has heavy hitters
  }
}
