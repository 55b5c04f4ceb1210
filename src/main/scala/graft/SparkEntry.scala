package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Each entry in [[queries]] is one operator from the coverage
  * checklist; [[oracleSql]] carries the DuckDB-equivalent SQL for the
  * SQL-expressible ones (rows-only ops omit theirs).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    TimeSeriesQueries,
    DiurnalQueries,
    GpsQueries,
    HydroQueries,
    MeltQueries,
    DedupQueries,
    SimilarityQueries,
    TextQueries,
    MixQueries,
    MultimodalQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q3Join(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
