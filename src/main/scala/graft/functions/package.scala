package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure column functions mirroring the reference's scalar math.
  *
  * Everything here is built from `org.apache.spark.sql.functions` so it
  * stays inside whole-stage codegen — no UDFs on these hot paths.
  */
package object functions {

  // ----- physical constants (reference: constants.py:29-45) -----
  val Gravity = 9.81
  val IceDensity = 917.0
  val WaterDensity = 1000.0
  val SecondsPerDay: Long = 60L * 60 * 24

  // ----- units (reference: units.py:33-48) -----
  private val factors: Map[(String, String), Double] = {
    val base = Map(
      ("mbar", "mH2O") -> 0.0102,
      ("mbar", "ftH2O") -> 0.03346,
      ("ft", "m") -> 0.3048,
      ("in", "m") -> 0.0254,
      ("in", "mm") -> 25.4
    )
    base ++ base.map { case ((a, b), f) => (b, a) -> (1.0 / f) }
  }

  /** Unit conversion as a constant-folded multiply (units.py:46). */
  def convertUnits(from: String, to: String, value: Column): Column = {
    val f = factors.getOrElse(
      (from, to),
      throw new IllegalArgumentException(s"no conversion $from -> $to"))
    value * lit(f)
  }

  // ----- time helpers -----

  /** Decimal day-of-year, e.g. noon Jan 2 = 2.5 (utils.py:66). */
  def decimalDoy(ts: Column): Column =
    dayofyear(ts) +
      hour(ts) / 24.0 + minute(ts) / (60.0 * 24) + second(ts) / (60.0 * 60 * 24)

  /** Decimal hours since start of the extrema's own day (diurnal.py:257). */
  def decimalHoursSince(ts: Column, dayStart: Column): Column =
    (unix_micros(ts) - unix_micros(dayStart)) / lit(3600.0 * 1e6)

  /** sqrt(sum of squares) (utils.py:59); zero args -> sqrt(0) = 0 like
    * the reference's running total.
    */
  def quadrature(cols: Column*): Column =
    sqrt(cols.map(c => c * c).foldLeft(lit(0.0))(_ + _))

  // ----- hydrology (hydrotools.py) -----

  /** Water level above bed -> fraction of ice overburden pressure
    * (hydrotools.py:119).
    */
  def wlb2fob(waterLevelAboveBed: Column, iceThickness: Column): Column =
    waterLevelAboveBed / (lit(IceDensity / WaterDensity) * iceThickness)

  /** Ground water level altitude -> fraction of overburden
    * (hydrotools.py:98).
    */
  def gwl2fob(gwl: Column, iceThickness: Column, surfaceElevation: Column): Column =
    wlb2fob(gwl - (surfaceElevation - iceThickness), iceThickness)

  /** Water level (m asl) -> percent of overburden given the flotation
    * level above bed and bed elevation (hydrotools.py:75
    * masl_to_pctoverburden, scalarized per column).
    */
  def maslToPctOverburden(waterLvl: Column, flotationMbed: Column,
                          bedElev: Column): Column =
    (waterLvl - bedElev) / flotationMbed

  /** Stream stage from an ultrasonic distance reading in inches
    * (hydrotools.py:239): stage = datum - reading_in_meters.
    */
  def streamStage(readingInches: Column, refDatum: Double = 4.0): Column =
    lit(refDatum) - convertUnits("in", "m", readingInches)

  // ----- melt model (melt_model.py:576) -----

  /** Enhanced temperature-index melt rate, Pellicciotti et al. 2005.
    * M = TF*T + SRF*(1-albedo)*G when T > threshold else 0.
    */
  def meltEqu(temperature: Column,
              albedo: Column,
              incomingSolar: Column,
              temperatureFactor: Double = 0.05,
              solarRadiationFactor: Double = 0.0094,
              thresholdTemp: Double = 0.0): Column =
    when(temperature > lit(thresholdTemp),
      lit(temperatureFactor) * temperature +
        lit(solarRadiationFactor) * (lit(1.0) - albedo) * incomingSolar)
      .otherwise(lit(0.0))

  // ----- small time utilities (reference: diurnal.py:774-784) -----

  /** Last second of a timestamp's day (diurnal.py:774 make_end_of_day:
    * replace(hour=23, minute=59, second=59), sub-second dropped).
    */
  def endOfDay(ts: Column): Column =
    timestamp_seconds(unix_seconds(date_trunc("day", ts)) + lit(86399L))

  /** Time-of-day in decimal hours (diurnal.py:778
    * timestamp_to_decimal_hours: hour + (minute*60 + second)/3600 —
    * sub-second dropped, matching the reference).
    */
  def timestampToDecimalHours(ts: Column): Column =
    hour(ts) + (minute(ts) * 60 + second(ts)) / lit(3600.0)

  /** Duration between two timestamps in decimal hours (diurnal.py:783
    * timedelta_to_hours: days*24 + seconds/3600 = whole seconds/3600,
    * sub-second dropped).
    */
  def hoursBetween(later: Column, earlier: Column): Column =
    floor((unix_micros(later) - unix_micros(earlier)) / lit(1000000.0)) / lit(3600.0)

  // ----- vector math (similarity / dedup) -----

  /** Dot product of two double-array columns — a native codegen
    * Catalyst expression (see VectorExpressions.scala for why not
    * zip_with + aggregate).
    */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.vectorDot(a, b)

  /** L2 norm of a double-array column. */
  def l2Norm(a: Column): Column =
    sqrt(org.apache.spark.sql.graft.VectorExpressions.vectorDot(a, a))

  /** Cosine similarity of two array columns — a fused single-pass
    * codegen expression. Zero-norm vectors yield null instead of
    * aborting the job (one degenerate embedding must not kill a 100 TB
    * dedup run; see ADVICE r1).
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.vectorCosine(a, b)
}
