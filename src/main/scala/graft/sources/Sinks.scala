package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sinks + semi-structured helpers (SURVEY §2 K). */
object Sinks {

  /** Partitioned parquet write — the 100 TB layout primitive: partition
    * by low-cardinality pruning keys (e.g. day) so downstream scans
    * prune at the directory level, with a repartition on the partition
    * keys first so each partition writes one file per shuffle task
    * instead of one per input task (small-file protection).
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: String = "overwrite"): Unit =
    df.repartition(partitionCols.map(col): _*)
      .write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** Lines-of-text read (one row per line, column `value`). */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Extract a typed field from a JSON string column
    * (events.props-style payloads) without a full schema.
    */
  def jsonField(jsonCol: String, fieldPath: String,
                asType: String = "string"): org.apache.spark.sql.Column =
    get_json_object(col(jsonCol), fieldPath).cast(asType)
}
