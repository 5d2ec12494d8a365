package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {

  test("salted join equals plain join on heavily skewed data") {
    import spark.implicits._
    // 90% of the big side lands on one hot key
    val big = spark.range(50000)
      .select(when(col("id") % 10 =!= 0, lit(7)).otherwise(col("id") % 100)
        .as("k"), col("id").as("payload"))
    val small = (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = big.join(small, Seq("k"))
    val salted = SkewJoin.saltedJoin(big, small, "k", n = 8)

    assert(salted.count() == plain.count())
    // exact multiset equality of results
    assert(salted.select("k", "payload", "name")
      .exceptAll(plain.select("k", "payload", "name")).isEmpty)
    assert(plain.select("k", "payload", "name")
      .exceptAll(salted.select("k", "payload", "name")).isEmpty)
  }

  test("salting spreads the hot key across shuffle partitions") {
    import spark.implicits._
    val big = spark.range(8000).select(lit(7).as("k"), col("id").as("payload"))
    val salted = big.withColumn("_salt", (rand(42) * 8).cast("int"))
    val counts = salted.groupBy("_salt").count().collect().map(_.getLong(1))
    assert(counts.length == 8)            // all 8 salts used
    assert(counts.max < 8000 * 0.25)      // no salt holds the whole key
  }
}
