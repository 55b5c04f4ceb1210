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

  /** Bucketed managed-table write — co-located join layout: two tables
    * bucketed on the same key with the same bucket count join with NO
    * shuffle exchange on either side (verified in SourcesSpec). At
    * 100 TB this is the difference between an hourly fact-fact join
    * re-shuffling both inputs and one that only streams buckets.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int, mode: String = "overwrite"): Unit =
    df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

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
