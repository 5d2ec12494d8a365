package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins — the scaled replacement for the
  * reference's random work-list shuffle (tileconfig.py:139-141, which
  * spreads expensive neighbouring tiles across threads; SURVEY §4
  * "skew/load balancing").
  *
  * AQE's skew-join splitting handles most cases at runtime
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default here); salting
  * is the explicit fallback when one key dominates so heavily that even
  * split shuffle blocks overwhelm a reducer: the big side gets a random
  * salt in [0, n), the small side is replicated n ways, and the join key
  * becomes (key, salt) — fanning one hot reducer out into n.
  */
object SkewJoin {

  /** Inner equi-join of `big` ⋈ `small` on `key`, salted `n` ways.
    * Result is identical to `big.join(small, Seq(key))` for any salt
    * assignment; the salt only changes the shuffle layout. `n = 1` IS
    * the unsalted arm and short-circuits to the plain join — the
    * degenerate salt column would only add a dead projection and a
    * 1-row explode to the plan a reader copies. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    require(n >= 1, s"salt width must be >= 1, got $n")
    if (n == 1) big.join(small, Seq(key))
    else {
      val salted = big.withColumn("_salt", (rand(42) * n).cast("int"))
      val replicated = small.withColumn("_salt",
        explode(sequence(lit(0), lit(n - 1))))
      salted.join(replicated, Seq(key, "_salt")).drop("_salt")
    }
  }
}
