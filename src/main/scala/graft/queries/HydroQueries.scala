package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.operators.{Hydro, TimeSeriesOps}
import graft.functions._

/** D1-D5 — hydrology: water pressure -> hydraulic head (reference
  * hydrotools.py). Sensor series are synthesized deterministically from
  * events (click = submerged level, purchase = barometric pressure).
  */
object HydroQueries extends QueryPack {

  private def e(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  /** D1 `hydro_units` — the conversion-factor table (units.py:33-48),
    * including a derived reverse factor. Bit-exact: no rounding.
    */
  def hydroUnits(s: SparkSession, dir: String): DataFrame =
    e(s, dir).select(col("event_id"), col("value"),
      convertUnits("mbar", "mH2O", col("value")).as("mbar_to_mh2o"),
      convertUnits("mbar", "ftH2O", col("value")).as("mbar_to_fth2o"),
      convertUnits("ft", "m", col("value")).as("ft_to_m"),
      convertUnits("in", "mm", col("value")).as("in_to_mm"),
      convertUnits("mH2O", "mbar", col("value")).as("mh2o_to_mbar"))

  /** D2 `hydro_fob` — fraction of overburden (hydrotools.py:98/119). */
  def hydroFob(s: SparkSession, dir: String): DataFrame =
    e(s, dir).select(col("event_id"),
      wlb2fob(col("value"), lit(503.0)).as("fob_wlb"),
      gwl2fob(col("value") + 200.0, lit(503.0), lit(765.8)).as("fob_gwl"))

  /** D3 `hydro_patm_correct` — atmospheric-pressure correction
    * (hydrotools.py:479-545 calc_wlb_jeme): as-of join the barometric
    * series onto the level series per sensor, subtract the drift from
    * the zero reading (first barometric value).
    */
  def hydroPatmCorrect(s: SparkSession, dir: String): DataFrame = {
    val ev = e(s, dir)
    val water = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"),
        (col("value") * 0.05).as("lvl"))
    val atm = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        convertUnits("mbar", "mH2O", col("value")).as("p_atm"))
    Hydro.atmosphericCorrection(water, atm, Seq("user_id"), "ts", "lvl", "p_atm")
      .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("ts"),
        col("lvl_corrected"))
  }

  /** D4 `hydro_piecewise` — dated sensor-height intervals
    * (hydrotools.py:410-446 calc_wlb_pira's piz_hgt assignment): a tiny
    * interval table broadcast-joined on a range condition.
    */
  def hydroPiecewise(s: SparkSession, dir: String): DataFrame =
    Hydro.piecewiseIntervals(s, e(s, dir), "ts", Seq(
        ("2024-01-01", "2024-01-08", 299.31),
        ("2024-01-08", "2024-01-15", 293.81),
        ("2024-01-15", "2024-01-22", 288.99),
        ("2024-01-22", "2024-02-01", 284.66)), "sensor_height")
      .select(col("event_id"), col("user_id"), col("sensor_height"),
        (col("value") * 0.05 + col("sensor_height")).as("wlb"),
        wlb2fob(col("value") * 0.05 + col("sensor_height"), lit(503.0)).as("fob"))

  /** D5 `hydro_stage` — stream stage from ultrasonic distance
    * (hydrotools.py:239-276 calc_stage_radi): drop bad readouts
    * (sensor max-range value), stage = datum - reading in meters.
    */
  def hydroStage(s: SparkSession, dir: String): DataFrame =
    Hydro.streamStageFromReadings(e(s, dir), "value")
      .select(col("event_id"), col("user_id"), col("stage"), col("logger_to_stream"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hydro_units" -> hydroUnits,
    "hydro_fob" -> hydroFob,
    "hydro_patm_correct" -> hydroPatmCorrect,
    "hydro_piecewise" -> hydroPiecewise,
    "hydro_stage" -> hydroStage)

  private val fmt = "%Y-%m-%d %H:%M:%S.%f"

  val oracles: Map[String, String] = Map(
    "hydro_units" ->
      """SELECT event_id, value,
        |  value * 0.0102 AS mbar_to_mh2o,
        |  value * 0.03346 AS mbar_to_fth2o,
        |  value * 0.3048 AS ft_to_m,
        |  value * 25.4 AS in_to_mm,
        |  value * (1.0 / 0.0102) AS mh2o_to_mbar
        |FROM events""".stripMargin,
    "hydro_fob" ->
      """SELECT event_id,
        |  value / ((917.0 / 1000.0) * 503.0) AS fob_wlb,
        |  ((value + 200.0) - (765.8 - 503.0)) / ((917.0 / 1000.0) * 503.0) AS fob_gwl
        |FROM events""".stripMargin,
    "hydro_patm_correct" ->
      s"""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
         |             event_type, value FROM events),
         |water AS (SELECT event_id, user_id, ts, value * 0.05 AS lvl FROM e
         |          WHERE event_type = 'click'),
         |atm AS (SELECT user_id, ts, value * 0.0102 AS p_atm FROM e
         |        WHERE event_type = 'purchase'),
         |p0 AS (SELECT user_id, arg_min(p_atm, ts) AS p0 FROM atm GROUP BY user_id),
         |u AS (
         |  SELECT 0 AS side, event_id, user_id, ts, lvl,
         |         CAST(NULL AS DOUBLE) AS p_atm FROM water
         |  UNION ALL
         |  SELECT 1, NULL, user_id, ts, NULL, p_atm FROM atm),
         |f AS (SELECT *, last_value(p_atm IGNORE NULLS) OVER (
         |        PARTITION BY user_id ORDER BY ts ASC, side DESC
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pa
         |      FROM u)
         |SELECT f.event_id, f.user_id, strftime(f.ts, '$fmt') AS ts,
         |  f.lvl - (f.pa - p0.p0) AS lvl_corrected
         |FROM f JOIN p0 ON f.user_id = p0.user_id
         |WHERE f.side = 0""".stripMargin,
    "hydro_piecewise" ->
      """SELECT event_id, user_id, sensor_height,
        |  value * 0.05 + sensor_height AS wlb,
        |  (value * 0.05 + sensor_height) / ((917.0 / 1000.0) * 503.0) AS fob
        |FROM events
        |JOIN (VALUES
        |  (TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-08', 299.31),
        |  (TIMESTAMP '2024-01-08', TIMESTAMP '2024-01-15', 293.81),
        |  (TIMESTAMP '2024-01-15', TIMESTAMP '2024-01-22', 288.99),
        |  (TIMESTAMP '2024-01-22', TIMESTAMP '2024-02-01', 284.66)
        |) AS iv(lo, hi, sensor_height)
        |ON CAST(ts AS TIMESTAMP) >= iv.lo AND CAST(ts AS TIMESTAMP) < iv.hi""".stripMargin,
    "hydro_stage" ->
      """SELECT event_id, user_id,
        |  4.0 - value * 0.0254 AS stage,
        |  value * 0.0254 AS logger_to_stream
        |FROM events WHERE value < 67.0""".stripMargin)
}
