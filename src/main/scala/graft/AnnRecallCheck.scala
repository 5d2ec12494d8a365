package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.SimilarityOps

/** ANN recall-vs-candidates audit: the QUALITY axis of the similarity
  * family's scale path, measured as a curve rather than a point.
  *
  * Round 17 recorded single-probe sign-LSH recall@10 = 0.1375 mean at
  * gen-sf10 and asserted that nn12's multi-probe and nn14's IVF
  * nprobe>1 "trade candidates for recall" — prose without numbers. This
  * main measures that trade end-to-end against brute-force ground truth
  * (the nn11 harness shape: one corpus scan scores all 8 registered
  * query vectors, broadcast query side, two-phase rank for every top-10
  * cut so no per-qid reducer ever sees the corpus):
  *
  *  - `lsh_probe1 / probe9 / probe37`: the sign-bucket index probed
  *    with 0-, 1-, and 2-bit Hamming flips (nn2 → nn12's dial, extended
  *    one step so the curve has three points);
  *  - `ivf_nprobeP` (P ∈ 1,2,4,8): nn4's per-label coarse quantizer
  *    probing the P nearest lists, candidates scored EXACT — isolates
  *    list-pruning loss;
  *  - `ivfpq_nprobeP`: the same candidate lists scored by nn13/nn14's
  *    PQ asymmetric distance — adds quantization loss, i.e. the
  *    full nn14 serving path's quality;
  *  - `ivfpq256_nprobeP`: the same ADC scoring with a 256-anchor
  *    codebook — the codebook-RESOLUTION axis. The registered 16-entry
  *    stand-in has fewer codes than the clustered corpus has planted
  *    clusters x useful within-cluster directions, so every member of
  *    a cluster quantizes to one code and ADC cannot rank within it
  *    (recall collapses to the 1/K self-hit); 256 anchors restore
  *    within-cluster resolution at identical plan shape and 16x the
  *    (still KB-scale, broadcast) codebook.
  *
  * Every method emits per-qid lines plus a mean line with the cost axis
  * (candidates scanned, absolute and as a corpus fraction). Run on BOTH
  * embedding regimes: the default isotropic corpus is the adversarial
  * case for locality structure (bucket occupancy is uniform, true
  * neighbours are barely closer than random), DataGen `--clustered` is
  * the deployed-corpus case (10 planted Gaussian clusters, intra-cluster
  * cosine ≈ 0.75) — the curve's SHAPE differs and both belong on the
  * record.
  *
  * Usage: runMain graft.AnnRecallCheck <sfDir[,sfDir2,...]>
  */
object AnnRecallCheck {
  private val K = 10
  private val NQ = 8 // the registered probe set: vec_id < 8 (nn11)

  /** Two-phase top-k per qid by (score desc, vec_id): phase 1 ranks
    * within (qid, input partition) and keeps <= k, so the final per-qid
    * rank sees <= k x numPartitions rows, never the corpus. */
  private def topK(df: DataFrame, score: String, k: Int = K): DataFrame = {
    val order = Seq(col(score).desc, col("vec_id"))
    val pre = Window.partitionBy(col("qid"), spark_partition_id())
      .orderBy(order: _*)
    val fin = Window.partitionBy("qid").orderBy(order: _*)
    df.withColumn("prn", row_number().over(pre)).filter(col("prn") <= k)
      .withColumn("rn", row_number().over(fin)).filter(col("rn") <= k)
      .select("qid", "vec_id")
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AnnRecallCheck <sfDir[,sfDir2,...]>")
    val sfDirs = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ann-recall")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"/tmp/graft_warehouse_ann_${ProcessHandle.current.pid}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def fmt(d: Double) =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))

    for (sfDir <- sfDirs) {
      val e = SimilarityOps.emb(spark, sfDir)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nCorpus = e.count()
      val q = e.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("qid"), col("emb").as("qe"))
      def cos(a: String, b: String): Column =
        SimilarityOps.dot(a, b) /
          (sqrt(SimilarityOps.dot(a, a)) * sqrt(SimilarityOps.dot(b, b)))

      // ground truth: brute-force cosine top-10 per query, one corpus scan
      val gt = topK(e.crossJoin(broadcast(q))
          .withColumn("score", cos("emb", "qe")), "score")
        .withColumnRenamed("vec_id", "gt_vec")
        .persist()
      gt.count()

      // (qid, vec_id, score) candidates -> per-qid recall + cost lines
      def report(method: String, cands: DataFrame): Unit = {
        val c = cands.persist()
        val counts = c.groupBy("qid").agg(count(lit(1)).as("n_cand"))
        val top = topK(c, "score")
          .withColumnRenamed("qid", "got_qid")
          .withColumnRenamed("vec_id", "got_vec")
          .withColumn("hit", lit(1))
        val hits = gt.join(top,
            col("gt_vec") === col("got_vec") && col("qid") === col("got_qid"),
            "left_outer")
          .groupBy("qid")
          .agg((sum(coalesce(col("hit"), lit(0))) / lit(K)).as("recall"))
        val rows = hits.join(counts, Seq("qid")).orderBy("qid").collect()
        rows.foreach { r =>
          println(s"""{"metric":"ann_recall","method":"$method",""" +
            s""""qid":${r.getLong(0)},"recall10":${fmt(r.getDouble(1))},""" +
            s""""cand":${r.getLong(2)},"sf":${Json.str(sfDir)}}""")
        }
        val meanR = rows.map(_.getDouble(1)).sum / rows.length.max(1)
        val meanC = rows.map(_.getLong(2)).sum.toDouble / rows.length.max(1)
        println(s"""{"metric":"ann_recall_mean","method":"$method",""" +
          s""""recall10_mean":${fmt(meanR)},"cand_mean":${fmt(meanC)},""" +
          s""""cand_frac":${fmt(meanC / nCorpus)},"n_corpus":$nCorpus,""" +
          s""""n_queries":${rows.length},"sf":${Json.str(sfDir)}}""")
        c.unpersist()
      }

      // --- sign-LSH multi-probe: 0-, 1-, 2-bit Hamming flips ---------
      val b = e.withColumn("bucket", SimilarityOps.bucketExpr)
      val qb = b.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("qid"), col("emb").as("qe"),
          col("bucket").cast("int").as("qbucket"))
      val oneBit = (0 to 7).map(1 << _)
      val twoBit = for (i <- 0 to 7; j <- (i + 1) to 7) yield (1 << i) | (1 << j)
      val probeSets = Seq(
        "lsh_probe1" -> Seq(0),
        "lsh_probe9" -> (0 +: oneBit),
        "lsh_probe37" -> ((0 +: oneBit) ++ twoBit))
      for ((method, masks) <- probeSets) {
        import spark.implicits._
        // cross join with a tiny mask table, never a generator over the
        // bucket expression (the nn12 Catalyst generator-pruning trap)
        val probes = qb.crossJoin(broadcast(masks.toDF("mask")))
          .select(col("qid"), col("qe"),
            expr("CAST(qbucket ^ mask AS INT)").as("pbucket"))
        val cands = b.as("c")
          .join(broadcast(probes), col("c.bucket") === col("pbucket"))
          .select(col("qid"), col("c.vec_id").as("vec_id"),
            cos("c.emb", "qe").as("score"))
        report(method, cands)
      }

      // --- IVF: nearest-P coarse lists, exact and PQ-ADC scoring -----
      val cent = SimilarityOps.centroids(e)
      val ranked = cent.crossJoin(broadcast(q))
        .withColumn("csim", cos("centroid", "qe"))
        .withColumn("crk", row_number().over(
          Window.partitionBy("qid").orderBy(col("csim").desc, col("label"))))
        .select("qid", "label", "crk")
        .persist()
      ranked.count()
      val codeArms = Seq(
        "ivfpq" -> 16,   // the registered nn13/nn14 codebook
        "ivfpq256" -> 256) // the codebook-resolution arm
        .map { case (tag, anchors) =>
          val codes = SimilarityOps.pqCodes(e, anchors).persist()
          codes.count()
          (tag, codes, SimilarityOps.pqCodebook(e, anchors))
        }
      val qsl = SimilarityOps.pqSlices(e.filter(col("vec_id") < NQ), "qid", "qv")
      for (p <- Seq(1, 2, 4, 8)) {
        val lists = ranked.filter(col("crk") <= p).select("qid", "label")
        val cands = e.join(broadcast(lists), Seq("label"))
          .select(col("qid"), col("vec_id"))
        // exact scoring of the pruned lists (list-pruning loss only)
        val exact = e.as("c")
          .join(broadcast(lists), Seq("label"))
          .join(broadcast(q.withColumnRenamed("qid", "q2")),
            col("qid") === col("q2"))
          .select(col("qid"), col("c.vec_id").as("vec_id"),
            cos("c.emb", "qe").as("score"))
        report(s"ivf_nprobe$p", exact)
        // PQ asymmetric-distance scoring (the nn14 serving path):
        // rank ascending adc == descending -adc for unit vectors
        for ((tag, codes, cb) <- codeArms) {
          val adc = codes.join(broadcast(cands), Seq("vec_id"))
            .join(broadcast(cb), Seq("sub", "cid"))
            .join(broadcast(qsl), Seq("qid", "sub"))
            .withColumn("d2",
              SimilarityOps.dot("qv", "qv")
                - lit(2) * SimilarityOps.dot("qv", "cvec")
                + SimilarityOps.dot("cvec", "cvec"))
            .groupBy("qid", "vec_id").agg(sum("d2").as("adcd"))
            .select(col("qid"), col("vec_id"), (-col("adcd")).as("score"))
          report(s"${tag}_nprobe$p", adc)
          // the production serving path: ADC SHORTLIST (top-100) ->
          // exact re-rank of the shortlist only. The ADC pass's scan
          // cost is the `${tag}_nprobe$p` line above; this line's cand
          // column is the 100 exact re-scores per query it adds.
          val short = topK(adc.persist(), "score", 100)
          val rerank = e.select(col("vec_id"), col("emb"))
            .join(broadcast(short.join(q, Seq("qid"))), Seq("vec_id"))
            .select(col("qid"), col("vec_id"), cos("emb", "qe").as("score"))
          report(s"${tag}_rr100_nprobe$p", rerank)
          adc.unpersist()
        }
      }
      ranked.unpersist(); codeArms.foreach(_._2.unpersist())
      gt.unpersist(); e.unpersist()
    }
    spark.stop()
  }
}
