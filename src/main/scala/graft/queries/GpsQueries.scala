package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

object GpsQueries extends QueryPack {
  val defs: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracles: Map[String, String] = Map()
}
