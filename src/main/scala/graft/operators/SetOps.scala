package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.OpModule

object SetOps extends OpModule {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
