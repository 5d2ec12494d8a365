package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator family = one module. `queries` are the runnable Spark
  * entries (name -> (session, sfDir) -> result); `oracles` hold the
  * equivalent DuckDB SQL for names that are SQL-expressible. This is the
  * Spark-side incarnation of the reference's registry/factory plugin
  * system (tile_processor/controller.py:146-166, worker.py:754-763 —
  * SURVEY §2.10 O5). */
trait OpModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
