package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One family of driver-contract queries: name -> builder, plus the
  * DuckDB oracle SQL for the SQL-expressible ones (rows-only checks
  * simply omit the oracle entry).
  *
  * Conventions shared by every pack so the driver's hash compare is
  * stable across engines:
  *   - every float-valued output is `round(x, N)` with the same N in
  *     both the Spark code and the oracle SQL;
  *   - every timestamp output is formatted to a microsecond string
  *     (`yyyy-MM-dd HH:mm:ss.SSSSSS` / `%Y-%m-%d %H:%M:%S.%f`), so
  *     tz-awareness and parquet physical types can never diverge;
  *   - column names are aliased identically on both sides.
  */
trait QueryPack {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Timestamp -> canonical microsecond string (oracle: strftime %f). */
  protected def fmtTs(c: Column): Column =
    date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
  /** Timestamp -> canonical date string (oracle: strftime %Y-%m-%d). */
  protected def fmtDay(c: Column): Column = date_format(c, "yyyy-MM-dd")
  protected def r4(c: Column): Column = round(c, 4)
  protected def r6(c: Column): Column = round(c, 6)
}
