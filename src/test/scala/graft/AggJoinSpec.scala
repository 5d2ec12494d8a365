package graft

import org.apache.spark.sql.functions._

/** Goldens for joins / aggregations, mirroring the reference's
  * tests/test_tiles.py inline assertions (esp. the priority-dedup golden
  * map at test_tiles.py:68-91). */
class AggJoinSpec extends SparkSpec {

  test("j2: anti join leaves the 8 non-border tiles") {
    val ids = run("j2_border_anti").collect().map(_.getString(0)).toSet
    assert(ids == (for { tx <- Seq(0, 3); ty <- 0 to 3 } yield s"t${tx}_${ty}").toSet)
  }

  test("j3: t1_1 intersects its 3x3 neighborhood (touch counts)") {
    val ids = run("j3_theta_intersects").collect().map(_.getString(0)).toSet
    assert(ids == (for { tx <- 0 to 2; ty <- 0 to 2 } yield s"t${tx}_${ty}").toSet)
  }

  test("j4: each version's dissolved coverage contains exactly its 8 tiles") {
    val rows = run("j4_version_coverage").collect()
      .map(r => r.getInt(0) -> r.getString(1))
    assert(rows.length == 16)
    assert(rows.filter(_._1 == 2).map(_._2).forall(_.startsWith("t0") == false || true))
    val v2 = rows.filter(_._1 == 2).map(_._2).toSet
    val v3 = rows.filter(_._1 == 3).map(_._2).toSet
    assert(v2 == (for { tx <- 0 to 1; ty <- 0 to 3 } yield s"t${tx}_${ty}").toSet)
    assert(v3 == (for { tx <- 2 to 3; ty <- 0 to 3 } yield s"t${tx}_${ty}").toSet)
  }

  test("a1: envelope union per version = each half of the world") {
    val rows = run("a1_envelope_union").collect()
      .map(r => r.getInt(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))))
      .toMap
    assert(rows(2) == ((0, 0, 5000, 10000)))
    assert(rows(3) == ((5000, 0, 10000, 10000)))
  }

  test("a8 golden: priority wins, equal priorities append (test_tiles.py:68-91 analogue)") {
    val m = run("a8_priority_dedup").collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getString(2), r.getLong(3)))).toMap
    // t0_0: no prio-1 file; two prio-2 dirs both contribute (append)
    assert(m("t0_0") == ((2, "/data/ahn2/unit_t0_0.laz,/data/ahn2b/unit_t0_0.laz", 2L)))
    // t1_0: prio-1 AHN3 file wins over the AHN2 entry
    assert(m("t1_0") == ((3, "/data/ahn3/CT1_0.LAZ", 1L)))
    // t3_3: east half, AHN3 only
    assert(m("t3_3") == ((3, "/data/ahn3/CT3_3.LAZ", 1L)))
    assert(m.size == 16)
  }

  test("a7: exactly the two equal-priority duplicate tiles are flagged") {
    val dups = run("a7_dup_detect").collect().map(_.getString(0)).toSet
    assert(dups == Set("t0_0", "t0_1"))
  }

  test("j6: lookup reports missing files for the uncovered column") {
    val rows = run("j6_file_lookup").collect()
      .map(r => (r.getString(0), r.getBoolean(2)))
    val missing = rows.filter(_._2).map(_._1).toSet
    assert(missing == Set("t3_0", "t3_1", "t3_2")) // tx=3 has no prio-2 files
  }

  test("w5: per-tile lag deltas are null exactly once per tile") {
    val df = run("w5_monitor_delta")
    val nNull = df.filter(col("cpu_delta").isNull).count()
    val nTiles = df.select("tile_id").distinct().count()
    assert(nNull == nTiles)
  }

  test("a17: every user is active in their own first week (offset-0 rows cover all users)") {
    val rows = run("a17_retention_cohorts").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    val atZero = rows.filter(_._2 == 0).map(_._3).sum
    val users = spark.read.parquet(s"$Sf/events.parquet")
      .select("user_id").distinct().count()
    assert(atZero == users, s"offset-0 counted $atZero of $users users")
    // no retained count can exceed its cohort's size
    val cohortSize = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    rows.foreach { case (cw, off, n) =>
      assert(n <= cohortSize(cw), s"cohort $cw offset $off: $n > ${cohortSize(cw)}")
    }
  }

  test("j11: funnel stages are a partition of viewing users and monotone down the funnel") {
    val rows = run("j11_event_funnel").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val viewers = spark.read.parquet(s"$Sf/events.parquet")
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(rows.values.sum == viewers,
      s"stage counts ${rows.values.sum} != viewing users $viewers")
    // a stricter stage can never hold MORE users than all weaker ones
    assert(rows.getOrElse(3, 0L) <= rows.getOrElse(2, 0L) + rows.getOrElse(1, 0L))
  }

  test("w11: sweep-line peak equals brute-force interval counting at start instants") {
    val got = run("w11_peak_concurrency").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // epoch millis computed engine-side: robust to the driver regenerating
    // the fixture with NTZ vs UTC-adjusted parquet timestamps
    val o = spark.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_orderpriority"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 1000").as("ms"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val life = 30L * 86400000
    o.groupBy(_._1).foreach { case (prio, rows) =>
      val starts = rows.map(_._2)
      // the peak of a half-open interval union is attained at a start
      val peak = starts.map(t => starts.count(s0 => s0 <= t && t < s0 + life)).max
      assert(got(prio) == peak, s"$prio: sweep ${got(prio)} vs brute $peak")
    }
  }

  test("ds11: grouped split puts every document of a source in exactly one split") {
    import graft.operators.DedupOps.h60
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .withColumn("b", h60("gsp:", col("source")) % 100)
      .withColumn("split",
        when(col("b") < 80, "train").when(col("b") < 90, "val")
          .otherwise("test"))
    val pairs = docs.select("source", "split").distinct().count()
    val sources = docs.select("source").distinct().count()
    assert(pairs == sources, s"$pairs (source,split) pairs for $sources sources")
    // and the reported totals cover the whole corpus
    val reported = run("ds11_grouped_split").collect().map(_.getLong(1)).sum
    assert(reported == docs.count())
  }

  test("ds10: temperature resampling upweights low-resource languages") {
    val rows = run("ds10_temperature_resample").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    rows.foreach { case (lang, total, rate, kept) =>
      assert(rate > 0 && rate <= 1.0, s"$lang rate $rate out of range")
      assert(kept <= total, s"$lang kept $kept > total $total")
    }
    val byLang = rows.map(r => r._1 -> r).toMap
    // α=1/2 flattens the mix: the dominant language's KEPT share must be
    // strictly below its RAW share, low-resource shares must rise
    val rawEn = byLang("en")._2.toDouble / rows.map(_._2).sum
    val keptEn = byLang("en")._4.toDouble / rows.map(_._4).sum
    assert(keptEn < rawEn, s"en share $rawEn -> $keptEn did not shrink")
    assert(byLang("fr")._3 > byLang("en")._3,
      "low-resource fr must get a higher keep rate than en")
  }

  test("a18: union-merged daily sketches estimate exactly like the single-pass sketch") {
    val merged = run("a18_sketch_merge").collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val single = run("a13_approx_distinct").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == single, s"merged=$merged single=$single")
  }

  test("a13 HLL regimes: coupon-exact at gate cardinalities, rse-bounded past the threshold") {
    // the gate hash-matches the estimate against exact COUNT DISTINCT,
    // which only works in the sketch's coupon (exact) regime — pin both
    // halves of that contract: lgK=21 is exact at the largest generated
    // decade's cardinality (15k users at sf1), and past the promotion
    // threshold (forced here with lgK=12, threshold ~0.75*2^9=384) the
    // estimate degrades gracefully within ~3x its rse
    // (1.04/sqrt(2^12) ~= 1.6%) instead of failing
    import org.apache.spark.sql.functions.expr
    val exact = spark.range(15000)
      .select(expr("hll_sketch_estimate(hll_sketch_agg(id, 21))"))
      .head().getLong(0)
    assert(exact == 15000L, s"lgK=21 must be coupon-exact at 15k, got $exact")
    val est = spark.range(60000)
      .select(expr("hll_sketch_estimate(hll_sketch_agg(id, 12))"))
      .head().getLong(0)
    assert(math.abs(est - 60000L) <= 3000, s"estimation-regime error >5%: $est")
    assert(est != 60000L, "lgK=12 at 60k keys should actually be estimating")
  }

  test("w11: the two-level sweep equals the single-window sweep (algebraic equivalence)") {
    // the scale-shaped plan must be a pure rewrite of the semantics:
    // recompute peak/boundaries with the direct cardinality-5 window
    // (fine at test scale) and require identical results
    import org.apache.spark.sql.expressions.Window
    val viaTwoLevel = run("w11_peak_concurrency").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val o = spark.read.parquet(s"$Sf/orders.parquet")
    val deltas = o.select(col("o_orderpriority").as("prio"),
        col("o_orderdate").as("t"), lit(1).as("d"))
      .unionByName(o.select(col("o_orderpriority").as("prio"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("t"),
        lit(-1).as("d")))
    val w = Window.partitionBy("prio").orderBy("t", "d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val direct = deltas.withColumn("open", sum("d").over(w))
      .groupBy("prio")
      .agg(max("open").as("peak_open"), count(lit(1)).as("n_boundaries"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaTwoLevel == direct)
  }
}
