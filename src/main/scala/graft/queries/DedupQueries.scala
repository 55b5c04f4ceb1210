package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

object DedupQueries extends QueryPack {
  val defs: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
