package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Thin source abstraction (SURVEY §7.4): the harness runs on parquet
  * fixtures, but the reference's production deployment reads PostgreSQL —
  * `JdbcSource` is the drop-in for that (no database exists in this
  * offline environment, so it is exercised only by construction). */
trait TableSource {
  def read(spark: SparkSession, name: String): DataFrame
}

/** Parquet directory layout `<dir>/<table>.parquet` (the test harness). */
final case class ParquetSource(dir: String) extends TableSource {
  def read(spark: SparkSession, name: String): DataFrame =
    ParquetSource.normalizeTs(spark.read.parquet(s"$dir/$name.parquet"))
}

object ParquetSource {
  /** The harness parquet has shipped timestamps as TIMESTAMP(NANOS),
    * TIMESTAMP(MICROS, adjustedToUTC) and TIMESTAMP(MICROS) NTZ across
    * regenerations. Our sessions pin
    * spark.sql.parquet.inferTimestampNTZ.enabled=false so NTZ columns scan
    * directly as TimestampType (keeping ts predicates pushable — a cast
    * wrapper would defeat parquet filter pushdown); this fallback covers
    * foreign sessions without that conf, where `withWatermark` and
    * `unix_micros` would otherwise reject TIMESTAMP_NTZ. Under the pinned
    * UTC session timezone the cast is value-identity. */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.TimestampNTZType => f.name
    }.foldLeft(df)((d, c) =>
      d.withColumn(c, org.apache.spark.sql.functions.col(c).cast("timestamp")))
}

/** JDBC source with predicate/partition pushdown via Spark's JDBC
  * relation — the slot for the reference's PostgreSQL tables
  * (db.py:30-41). `partitionColumn` enables parallel reads at scale. */
final case class JdbcSource(url: String, props: Properties,
    partitionColumn: Option[(String, Long, Long, Int)] = None) extends TableSource {
  def read(spark: SparkSession, name: String): DataFrame =
    partitionColumn match {
      case Some((column, lower, upper, numPartitions)) =>
        spark.read.jdbc(url, name, column, lower, upper, numPartitions, props)
      case None => spark.read.jdbc(url, name, props)
    }
}
