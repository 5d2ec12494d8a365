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

  test("AQE splits the skewed partition at runtime (the no-code-change skew path)") {
    // the first line of defense before manual salting: AQE's skew-join
    // handling splits oversized partitions at runtime. Thresholds are
    // lowered so fixture-scale data triggers it; on a cluster the same
    // mechanics fire at the default 256MB granularity.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // one hot key carrying ~90% of rows forces one oversized partition
      val big = spark.range(200000)
        .select(when(col("id") % 10 =!= 0, lit(7)).otherwise(col("id") % 97)
          .as("k"), col("id").as("payload"))
      val dim = spark.range(100).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("name"))
      val j = big.join(dim, Seq("k"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE skew handling did not fire:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
