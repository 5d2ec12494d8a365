package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r19 VERDICT#5 measurement probe (NOT a registered query): would
  * narrowing the dd-family shingle shuffles to 8-byte h60 keys pay at
  * open-vocabulary scale?
  *
  * Two consumer shapes are measured, each in shipped (string-keyed) and
  * hashed (h60-keyed) form, alternating arms inside ONE process so both
  * read the same session-cached string relation (the hashed relation is
  * DERIVED per run — `select(doc_id, h60(sh))` over the cache — so there
  * is no cache doubling; the question is purely shuffle width):
  *   - dd8's df-count + probe join (groupBy(sh) + join on sh)
  *   - dd3's pair-intersection self-join (join on sh, carrying doc ids)
  *
  * The hashed forms are measurement-only: dd8/dd3 outputs are
  * COLLISION-SENSITIVE (n_shingles, df>1, |A∩B| all shift if two
  * distinct shingles share an h60), unlike ds14's distinct-set consumers
  * — so this fork cannot ship without changing what the queries compute.
  * This probe records what the narrowing would be worth anyway.
  *
  * Usage: runMain graft.DdForkProbe <sfDir> [reps=2]
  */
object DdForkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shufParts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufParts)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleW = new java.util.concurrent.atomic.AtomicLong(0)
    val spill = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.diskBytesSpilled)
          ()
        }
      }
    })

    val sh = graft.operators.DedupOps.shingles(spark, sfDir)
    val shh = sh.select(col("doc_id"),
      graft.operators.DedupOps.h60("", col("sh")).as("sh"))
    val capped = graft.operators.DedupOps.cappedShingles(spark, sfDir)
    val cappedH = capped.select(col("doc_id"),
      graft.operators.DedupOps.h60("", col("sh")).as("sh"))

    def dd8Of(rel: DataFrame): DataFrame = {
      val dfreq = rel.groupBy("sh").agg(count(lit(1)).as("df"))
      rel.join(dfreq, Seq("sh"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") > 1, 1L).otherwise(0L)).as("n_dup"))
    }
    // dd3's pair-intersection core (sizes + inter), without the cached
    // pair relation so each arm's shuffle is measured, not memoized
    def pairsOf(rel: DataFrame): DataFrame = {
      val a = rel.select(col("doc_id").as("doc_a"), col("sh"))
      val b = rel.select(col("doc_id").as("doc_b"), col("sh"))
      a.join(b, Seq("sh"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    }

    // materialize the shared caches once, outside the timed arms
    sh.count(); capped.count()

    def run(name: String, df: => DataFrame): Unit = {
      val s0 = shuffleW.get; val p0 = spill.get
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // give the async listener bus a moment to drain so per-arm byte
      // attribution is right (listenerBus.waitUntilEmpty is private)
      Thread.sleep(1500)
      println(f"""{"metric":"ddfork","arm":"$name","sec":$sec%.2f,"shuffle_write":${shuffleW.get - s0},"spill":${spill.get - p0}}""")
    }

    for (_ <- 1 to reps) {
      run("dd8_shipped_strings", dd8Of(sh))
      run("dd8_hashed_h60", dd8Of(shh))
      run("dd3pairs_shipped_strings", pairsOf(capped))
      run("dd3pairs_hashed_h60", pairsOf(cappedH))
    }
    graft.sources.Cached.releaseAll()
    spark.stop()
  }
}
