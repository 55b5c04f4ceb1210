package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical loaders for the driver-generated test tables.
  *
  * Every loader is a plain parquet scan so Catalyst's column pruning and
  * filter pushdown reach the file source (`PushedFilters` in explain).
  * The only normalization done here is the events table's nanosecond
  * timestamp -> microsecond TimestampType conversion (matching DuckDB's
  * ns->us truncating cast, so oracle comparisons line up).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** events with `ts` as a proper microsecond TimestampType.
    * Requires spark.sql.legacy.parquet.nanosAsLong=true (GraftSession).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    // nanos-as-long -> truncate to micros. Must be integer division:
    // double division loses precision at 1.7e18 ns (ulp there is 256!).
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** events clipped to [start, end) with the time predicate applied to
    * the RAW nanosecond long column, so it reaches the parquet scan as
    * a PushedFilter (a filter on the converted timestamp cannot be
    * pushed past the conversion expression — at 100 TB that is the
    * difference between reading one day and reading everything).
    * Bounds are exact: ts_us >= X  <=>  ts_ns >= X*1000 under
    * truncation.
    */
  def eventsClipped(s: SparkSession, d: String,
                    startInclusive: String, endExclusive: String): DataFrame = {
    def usOf(t: String): Long = {
      val norm = if (t.contains(" ") || t.contains("T")) t.replace(" ", "T")
        else t + "T00:00:00"
      val inst = java.time.LocalDateTime.parse(norm)
        .toInstant(java.time.ZoneOffset.UTC)
      inst.getEpochSecond * 1000000L + inst.getNano / 1000L
    }
    val raw = load(s, d, "events")
      .filter(col("ts") >= usOf(startInclusive) * 1000L &&
        col("ts") < usOf(endExclusive) * 1000L)
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
