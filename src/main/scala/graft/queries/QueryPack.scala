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

  /** Boundary-shifted decimal rounding: floor(x*10^s + 0.5001)/10^s.
    *
    * Plain round() is a trap for cross-engine comparison: Spark rounds
    * the shortest decimal repr (BigDecimal.valueOf) while DuckDB rounds
    * the binary value, so the two disagree exactly on decimal
    * half-boundaries — and synthetic data (2-dp values scaled by nice
    * factors) lands on those boundaries systematically. Shifting the
    * cut to .4999 puts it where neither decimal-exact values nor
    * sum-order ulp noise ever sits. The oracle SQL uses the identical
    * formula.
    */
  protected def rN(c: Column, scale: Int): Column = {
    val p = math.pow(10.0, scale)
    floor(c * p + 0.5001) / p
  }
  protected def r4(c: Column): Column = rN(c, 4)
  protected def r6(c: Column): Column = rN(c, 6)
}
