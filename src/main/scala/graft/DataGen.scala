package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-data generator for scale-envelope runs.
  *
  * The driver ships fixed parquet at sf ≤ 0.1 (TESTDATA.md — read-only);
  * extending the measured scaling curve one more decade needs an sf1
  * that does not exist. This generator reproduces the driver tables'
  * SCHEMA exactly and their DISTRIBUTIONS statistically (measured off
  * sf0.1: row-count scaling rules, value domains, uniform/exponential/
  * Poisson shapes, the ~5% near-duplicate append-" dup" mechanism, unit
  * 64-d embeddings, 30-day exponential event arrivals), so family
  * scaling measured across generated decades is internally consistent —
  * and a generated sf0.1 is also emitted as the calibration point
  * against the driver's sf0.1.
  *
  * All randomness is hash-derived (xxhash64(tag, id)) — fully
  * deterministic, partitioning-independent, no rand() anywhere; the
  * generation itself is Spark-distributed (spark.range + codegen'd
  * column expressions; the only joins are the near-dup base lookup and
  * the per-order line fan-out).
  *
  * Usage: runMain graft.DataGen <sf> <outDir>
  */
object DataGen {

  /** uniform [0,1) from a tagged 64-bit hash — 24 bits of mantissa. */
  private def u01(tag: String, id: Column): Column =
    (pmod(xxhash64(lit(tag), id), lit(1 << 24))).cast("double") / (1 << 24)

  /** uniform integer in [0, n). */
  private def uint(tag: String, id: Column, n: Int): Column =
    pmod(xxhash64(lit(tag), id), lit(n)).cast("int")

  /** Approximately Zipf(s=1)-distributed integer rank in [0, n): the
    * inverse CDF of the continuous Zipf-1 approximation
    * CDF(k) ≈ ln(k+1)/ln(n+1), i.e. k = ⌊e^(u·ln(n+1))⌋ − 1, so
    * P(k) ∝ ln((k+2)/(k+1)) ≈ 1/(k+1). One codegen'd expression — no
    * rank table, no driver state, works for any n. Rank 0 is the
    * celebrity: it draws ≈ ln(2)/ln(n+1) of all samples (~6% at
    * n=150k), the hub that a uniform generator never produces. */
  private def zipfInt(tag: String, id: Column, n: Int): Column =
    least(greatest(
      (floor(exp(u01(tag, id) * math.log(n + 1.0))) - 1).cast("int"),
      lit(0)), lit(n - 1))

  /** exponential with the given mean. */
  private def uexp(tag: String, id: Column, mean: Double): Column =
    -lit(mean) * log(lit(1.0) - u01(tag, id))

  /** Zipf(s)-distributed integer rank in [0, n) for s > 1, from a
    * position-indexed hash (one draw per token, not per row): inverse
    * CDF of the continuous power-law density f(x) ∝ x^(−s) on [1, n+1],
    * F(x) = (x^(1−s) − 1) / ((n+1)^(1−s) − 1), so
    * x = (1 + u·((n+1)^(1−s) − 1))^(1/(1−s)) and rank = ⌊x⌋ − 1.
    * One codegen'd expression; no rank table, no driver state. Unlike
    * [[zipfInt]] (s = 1, bounded head for KEY skew), s > 1 over a huge
    * rank space gives an OPEN vocabulary: the realized type count grows
    * as a power of the token count (Heaps' law emerges from sampling —
    * V(N) ~ N^(1/s)) and the unsampled tail is effectively infinite. */
  private def zipfSInt(tag: String, id: Column, pos: Column, n: Int,
      s: Double): Column = {
    val u = (pmod(xxhash64(lit(tag), id, pos), lit(1 << 24))
      .cast("double") + 0.5) / (1 << 24)
    val span = math.pow(n + 1.0, 1.0 - s) - 1.0
    least(greatest(
      (floor(pow(lit(1.0) + u * span, 1.0 / (1.0 - s))) - 1).cast("int"),
      lit(0)), lit(n - 1))
  }

  /** Inverse-CDF lookup against precomputed breakpoints (Poisson etc). */
  private def inverseCdf(u: Column, cdf: Seq[Double]): Column =
    cdf.zipWithIndex.foldRight(lit(cdf.length): Column) {
      case ((p, k), rest) => when(u < p, lit(k)).otherwise(rest)
    }

  /** Poisson(4) CDF, enough terms to cover 1-1e-9. */
  private val Pois4Cdf: Seq[Double] = {
    val pmf = Iterator.iterate((math.exp(-4.0), 0)) { case (p, k) =>
      (p * 4.0 / (k + 1), k + 1)
    }.map(_._1).take(20).toSeq
    pmf.scanLeft(0.0)(_ + _).tail
  }

  private val Vocab = Seq("a", "agg", "batch", "big", "column", "customer",
    "data", "dup", "fast", "filter", "group", "hash", "join", "key", "line",
    "merge", "order", "part", "query", "row", "scan", "slow", "small",
    "sort", "spark", "stream", "table", "the", "value", "vector", "window")

  private val Segments = Seq("MACHINERY", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD", "BUILDING")
  private val PTypes = Seq("ECONOMY", "LARGE", "STANDARD", "MEDIUM", "PROMO", "SMALL")
  private val PAdj = Seq("large", "hot", "blue", "small", "dark", "light", "red", "green")
  private val PNoun = Seq("ring", "bolt", "washer", "nut", "screw", "plate", "rod", "cap")
  private val EvTypes = Seq("view", "click", "purchase", "signup", "error")
  private val Langs = Seq("en", "de", "es", "fr", "zh")
  private val Regions = Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")

  private def pick(tag: String, id: Column, xs: Seq[String]): Column = {
    val arr = array(xs.map(lit): _*)
    element_at(arr, uint(tag, id, xs.length) + 1)
  }

  /** Timestamp from epoch-seconds-with-fraction, NTZ-free (matches the
    * driver fixtures' plain TIMESTAMP annotation). */
  private def tsFromEpoch(sec: Column): Column = timestamp_seconds(sec)

  /** Vocabulary size for a corpus of nDoc documents. Default: the
    * fixture's fixed 31 words (schema/distribution parity with the
    * shipped sf ≤ 0.1 fixtures). With `heaps = true`, vocabulary grows
    * with the corpus per Heaps' law (∝ √corpus, anchored so every
    * SF ≤ 0.1 is UNCHANGED — 31 words at the fixture's 5000 docs):
    * the fixed-vocab decade saturates shingle document frequency at
    * sf1 (~29.8k possible 3-gram types, all df > MaxDf — SCALE.md
    * round-11 diagnosis), which hollows out the df-capped dedup
    * pipeline; a real corpus grows types with tokens, and this mode
    * reproduces that so dedup is actually EXERCISED at sf1. */
  def vocabFor(nDoc: Int, heaps: Boolean): Int =
    if (!heaps) Vocab.length
    else math.max(Vocab.length,
      math.round(Vocab.length * math.sqrt(nDoc / 5000.0)).toInt)

  /** Open-vocabulary mode's rank space and exponent. Both `--heaps`
    * vocab regimes above are CLOSED: words draw UNIFORMLY from a fixed
    * (if growing) array, so every type's document frequency is enormous
    * and the df<50 tail that every frequency-threshold operator (tx15's
    * pushdown, dd7's MaxDf, tx19's cap binding) exists for is EMPTY by
    * construction (SCALE.md "Round-16: tx15"). Real corpora are Zipf
    * over an open rank space: `--openvocab` draws each token's rank
    * Zipf(s = 1.15) from a 16M-rank space, so realized types grow
    * ~N^(1/s) with the corpus (emergent Heaps' law, β ≈ 0.87 nominal —
    * the measured β is recorded in SCALE.md), the df<50 tail is MOST of
    * the realized vocabulary, and its presence-row mass is a material
    * single-digit-to-tens percent — the regime the df-threshold
    * cross-over argument is about. Ranks 0..30 map to the original
    * 31-word vocabulary (the high-frequency head), rank k ≥ 31 to
    * "w<k>". */
  val OpenVocabRanks = 16 * 1000 * 1000
  val OpenVocabS = 1.15

  /** With `zipfKeys = true`, the RELATIONSHIP keys — o_custkey,
    * l_suppkey, l_partkey, events.user_id, and the near-dup base-doc
    * pick — draw from [[zipfInt]] instead of uniform, so the derived
    * graphs (customer↔supplier trade, co-purchase, dup components) and
    * the event stream get power-law degree distributions with genuine
    * celebrity nodes. The uniform fixtures' degree distributions are
    * benign, which means the skew machinery (g2's degree-oriented wedge
    * bound, AQE skew-split, the session/dedup state hot keys) had only
    * ever seen synthetic salt-bait; real graphs are Zipf, and this mode
    * generates that shape deterministically. Value domains, schemas,
    * and row counts are identical to the default mode. */
  def generate(s: SparkSession, sf: Double, out: String,
      heapsVocab: Boolean = false, zipfKeys: Boolean = false,
      openVocab: Boolean = false, clustered: Boolean = false): Unit = {
    import s.implicits._
    // relationship-key draw: uniform (fixture parity) or Zipf (skew mode)
    def rkey(tag: String, id: Column, n: Int): Column =
      if (zipfKeys) zipfInt(tag, id, n) else uint(tag, id, n)
    val nCust = math.max(1, (150000 * sf).toInt)
    val nSupp = math.max(1, (10000 * sf).toInt)
    val nPart = math.max(1, (200000 * sf).toInt)
    val nOrd = math.max(1, (1500000 * sf).toInt)
    val nEv = math.max(1, (1000000 * sf).toInt)
    val nDoc = math.max(500, (50000 * sf).toInt)
    val nEmb = math.max(500, (20000 * sf).toInt)
    val nUser = math.max(1, (15000 * sf).toInt)

    // single-FILE parquet per table (matching the driver fixtures'
    // layout, which the DuckDB oracle reads by exact path): distributed
    // compute, one-writer collect at the sink, then rename the part
    // file over the target path
    def write(df: DataFrame, name: String): Unit = {
      val tmp = s"$out/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val tmpDir = new java.io.File(tmp)
      val part = tmpDir.listFiles().find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file in $tmp"))
      val dest = new java.io.File(s"$out/$name.parquet")
      if (dest.exists()) dest.delete()
      java.nio.file.Files.move(part.toPath, dest.toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(tmpDir)
    }

    write(s.range(5).select(col("id").cast("int").as("r_regionkey"),
      element_at(array(Regions.map(lit): _*), col("id").cast("int") + 1)
        .as("r_name")), "region")

    write(s.range(25).select(col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      (col("id") % 5).cast("int").as("n_regionkey")), "nation")

    write(s.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      uint("cnat", col("id"), 25).as("c_nationkey"),
      round(lit(-1000.0) + u01("cbal", col("id")) * 11000.0, 2).as("c_acctbal"),
      pick("cseg", col("id"), Segments).as("c_mktsegment")), "customer")

    write(s.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      uint("snat", col("id"), 25).as("s_nationkey"),
      round(lit(-1000.0) + u01("sbal", col("id")) * 11000.0, 2).as("s_acctbal")), "supplier")

    write(s.range(nPart).select(
      col("id").as("p_partkey"),
      concat(pick("padj", col("id"), PAdj), lit(" "),
        pick("pnoun", col("id"), PNoun)).as("p_name"),
      concat(lit("Brand#"), (uint("pbrand", col("id"), 25) + 1)).as("p_brand"),
      pick("ptype", col("id"), PTypes).as("p_type"),
      (uint("psize", col("id"), 50) + 1).as("p_size"),
      round(lit(900.0) + u01("pretail", col("id")) * 100.0, 2).as("p_retailprice")), "part")

    // orders: day-granular dates uniform over 1995-01-01 .. 2001-08-01
    val ordEpoch0 = 788918400L // 1995-01-01 UTC
    val ordDays = 2404 // .. 2001-08-01
    val orders = s.range(nOrd).select(
      col("id").as("o_orderkey"),
      rkey("ocust", col("id"), nCust).cast("bigint").as("o_custkey"),
      pick("ostat", col("id"), Seq("F", "O", "P")).as("o_orderstatus"),
      round(lit(1000.0) + u01("ototal", col("id")) * 499000.0, 2).as("o_totalprice"),
      tsFromEpoch(lit(ordEpoch0) +
        uint("odate", col("id"), ordDays).cast("bigint") * 86400L).as("o_orderdate"),
      pick("oprio", col("id"), Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")).as("o_orderpriority"))
    write(orders, "orders")

    // lineitem: per-order fan-out, n_lines ~ Poisson(4) (0 allowed),
    // shipdate INDEPENDENT uniform over 1995-01-02 .. 2001-11-04,
    // linenumber uniform 1..7 (matches the fixtures: not sequential)
    val shipEpoch0 = 789004800L // 1995-01-02
    val shipDays = 2498
    val li = s.range(nOrd)
      .select(col("id").as("l_orderkey"),
        inverseCdf(u01("lcount", col("id")), Pois4Cdf).as("n_lines"))
      .select(col("l_orderkey"),
        explode(sequence(lit(1), col("n_lines"))).as("seq"))
      .select(col("l_orderkey"),
        (col("l_orderkey") * 31 + col("seq")).as("lid"), col("seq"))
    write(li.select(
      col("l_orderkey"),
      rkey("lpart", col("lid"), nPart).cast("bigint").as("l_partkey"),
      rkey("lsupp", col("lid"), nSupp).cast("bigint").as("l_suppkey"),
      (uint("lnum", col("lid"), 7) + 1).as("l_linenumber"),
      (uint("lqty", col("lid"), 50) + 1).cast("double").as("l_quantity"),
      round(lit(900.0) + u01("lext", col("lid")) * 104100.0, 2).as("l_extendedprice"),
      (uint("ldisc", col("lid"), 11).cast("double") / 100.0).as("l_discount"),
      (uint("ltax", col("lid"), 9).cast("double") / 100.0).as("l_tax"),
      pick("lret", col("lid"), Seq("A", "N", "R")).as("l_returnflag"),
      pick("lstat", col("lid"), Seq("F", "O")).as("l_linestatus"),
      tsFromEpoch(lit(shipEpoch0) +
        uint("lship", col("lid"), shipDays).cast("bigint") * 86400L).as("l_shipdate")),
      "lineitem")

    // events: 30-day window, exponential inter-arrivals realized as
    // sorted uniform arrival times (order statistics of N uniforms ARE
    // the conditional arrival times of a Poisson process given N) —
    // distributed sort instead of a global prefix sum
    val evEpoch0 = 1704067200L // 2024-01-01 UTC
    val evSpan = 30.0 * 86400.0
    val evTimes = s.range(nEv).select(
      (lit(evEpoch0.toDouble) + u01("evts", col("id")) * evSpan).as("tsec"))
      .orderBy("tsec")
      .select(col("tsec"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy("tsec")) - 1).cast("bigint").as("event_id"))
    write(evTimes.select(
      col("event_id"),
      tsFromEpoch(col("tsec")).as("ts"),
      rkey("evuser", col("event_id"), nUser).cast("bigint").as("user_id"),
      pick("evtype", col("event_id"), EvTypes).as("event_type"),
      round(uexp("evval", col("event_id"), 50.0), 2).as("value"),
      format_string("{\"k\": %d}", uint("evk", col("event_id"), 100)).as("props")),
      "events")

    // documents: 10..100 words from the vocab; ~4.7% of docs are
    // instead a COPY of a random earlier doc's text + " dup" (two
    // copiers picking the same base yields the fixtures' emergent exact
    // duplicates); lang weighted 40% en / 15% each other
    val nVocab = vocabFor(nDoc, heapsVocab)
    val vocabArr = array(
      (Vocab ++ (Vocab.length until nVocab).map(k => s"w$k")).map(lit): _*)
    val headArr = array(Vocab.map(lit): _*)
    // per-token word draw: uniform over the closed vocab (fixture
    // parity), or Zipf(s) rank over the open 16M-rank space — see
    // [[OpenVocabRanks]] for why the closed regimes can't exercise
    // df-threshold operators
    def word(docId: Column, i: Column): Column =
      if (openVocab) {
        val rank = zipfSInt("dword", docId, i, OpenVocabRanks, OpenVocabS)
        when(rank < Vocab.length, element_at(headArr, rank + 1))
          .otherwise(concat(lit("w"), rank))
      } else element_at(vocabArr,
        pmod(xxhash64(lit("dword"), docId, i), lit(nVocab)).cast("int") + 1)
    val baseText = s.range(nDoc).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(
        sequence(lit(1), lit(10) + uint("dlen", col("id"), 91)),
        i => word(col("id"), i)))
        .as("base_text"))
    val isDup = u01("ddup", col("doc_id")) < 0.047
    val withBase = baseText.select(col("doc_id"), col("base_text"),
      when(isDup, rkey("dbase", col("doc_id"), nDoc).cast("bigint"))
        .otherwise(lit(null)).as("dup_of"))
    val dupText = withBase.as("d")
      .join(baseText.select(col("doc_id").as("b_id"),
        col("base_text").as("b_text")).as("b"),
        col("d.dup_of") === col("b.b_id"), "left")
      .select(col("d.doc_id").as("doc_id"),
        when(col("b.b_text").isNotNull, concat(col("b.b_text"), lit(" dup")))
          .otherwise(col("d.base_text")).as("text"))
    val langU = u01("dlang", col("doc_id"))
    write(dupText.select(
      col("doc_id"),
      col("text"),
      when(langU < 0.4, "en").when(langU < 0.55, "de")
        .when(langU < 0.7, "es").when(langU < 0.85, "fr")
        .otherwise("zh").as("lang"),
      concat(lit("src"), col("doc_id") % 20).as("source"),
      length(col("text")).cast("bigint").as("n_chars")), "documents")

    // embeddings: 64-d unit vectors (Box-Muller normals, normalized),
    // labels uniform 0..9 — the fixtures show NO label-cluster structure,
    // which is the ADVERSARIAL case for every locality structure (LSH
    // buckets, IVF lists): measured single-probe recall@10 is 0.1375 at
    // gen-sf10 (SCALE.md round-17). Real embedding spaces cluster, so
    // `--clustered` plants 10 Gaussian clusters WITH the label column as
    // the cluster id: per dimension, emb_d = √α·c(label,d) + √(1−α)·n(id,d)
    // with both terms standard normals from the same hash machinery —
    // the marginal stays standard normal (same norms, same per-dim
    // distribution as the isotropic mode; only the within-label
    // correlation changes), expected intra-cluster cosine ≈ α = 0.75.
    // That makes IVF-on-label a REAL coarse quantizer and gives the
    // recall-vs-candidates curve the shape deployed corpora show.
    def bm(t1: String, t2: String, k: Column, d: Column) = {
      val u1 = (pmod(xxhash64(lit(t1), k, d), lit(1 << 24))
        .cast("double") + 0.5) / (1 << 24)
      val u2 = pmod(xxhash64(lit(t2), k, d), lit(1 << 24))
        .cast("double") / (1 << 24)
      sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
    }
    val eLabel = uint("elabel", col("id"), 10)
    val gauss = transform(sequence(lit(0), lit(63)), d =>
      if (!clustered) bm("e1", "e2", col("id"), d)
      else bm("cc1", "cc2", eLabel.cast("bigint"), d) * math.sqrt(0.75) +
        bm("e1", "e2", col("id"), d) * math.sqrt(0.25))
    write(s.range(nEmb).select(col("id").as("vec_id"), gauss.as("g"))
      .select(col("vec_id"),
        aggregate(col("g"), lit(0.0), (a, x) => a + x * x).as("ss"), col("g"))
      .select(col("vec_id"),
        transform(col("g"), x => (x / sqrt(col("ss"))).cast("float"))
          .as("embedding"),
        uint("elabel", col("vec_id"), 10).as("label")), "embeddings")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2 && args.length <= 6 &&
      args.drop(2).forall(
        Set("--heaps", "--zipf", "--openvocab", "--clustered")),
      "usage: DataGen <sf> <outDir> [--heaps] [--zipf] [--openvocab] [--clustered]")
    val sf = args(0).toDouble
    val heaps = args.contains("--heaps")
    val zipf = args.contains("--zipf")
    val open = args.contains("--openvocab")
    val clustered = args.contains("--clustered")
    require(!(heaps && open), "--heaps and --openvocab are exclusive vocab regimes")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName(s"graft-datagen-sf$sf")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    try generate(spark, sf, args(1), heaps, zipf, open, clustered)
    finally spark.stop()
  }
}
