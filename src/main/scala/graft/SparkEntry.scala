package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator module's registry (the Spark incarnation of
  * the reference's controller/worker registries, SURVEY §2.10 O5). Each
  * query name maps to a SURVEY §2 operator ID, documented at its
  * implementation site.
  */
object SparkEntry {
  /** All operator modules. Order matters only for duplicate-key detection
    * in tests (names must be globally unique). */
  val modules: Seq[OpModule] = Seq(
    TileSelectOps,
    PolyOps,
    JoinOps,
    AggOps,
    SetOps,
    ScalarOps,
    FanoutOps,
    DedupOps,
    SampleOps,
    SimilarityOps,
    TextOps,
    MultimodalOps,
    SourceSinkOps,
    MergeScanOps,
    IncrementalOps,
    GraphOps,
    DualLayoutOps,
    PipelineOps,
    BenchQueries,
    graft.streaming.MonitorStream
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's first real query: select features within an extent
    * (tileconfig.py:128-194). */
  def entry(spark: SparkSession): DataFrame =
    TileSelectOps.queries("p5_within_extent")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}
