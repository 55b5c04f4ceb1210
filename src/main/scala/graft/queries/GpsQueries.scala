package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.operators.Gps

/** C1-C7 — GPS / motion operators. Station positions are synthesized
  * deterministically from the events table (identically in the oracle
  * SQL): a per-user series with a secular drift plus value noise.
  */
object GpsQueries extends QueryPack {

  /** epoch_us of 2024-01-01 — the synthetic campaign start. */
  private val T0 = 1704067200000000L

  private def pos(s: SparkSession, dir: String): DataFrame = {
    val hrs = (unix_micros(col("ts")) - lit(T0)) / lit(3600000000.0)
    Tables.events(s, dir).select(
      col("event_id"), col("user_id"), col("ts"), col("value"),
      (col("value") * 0.1 + hrs * 0.05).as("dnorth"),
      (col("value") * 0.07 + hrs * 0.08).as("deast"))
  }

  private val posCte =
    """WITH pos AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |    value * 0.1 + (epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000) / 3600000000.0 * 0.05 AS dnorth,
      |    value * 0.07 + (epoch_us(CAST(ts AS TIMESTAMP)) - 1704067200000000) / 3600000000.0 * 0.08 AS deast
      |  FROM events)""".stripMargin

  def gpsFlowAngle(s: SparkSession, dir: String): DataFrame =
    Gps.flowAngle(pos(s, dir), Seq("user_id"), "ts", "dnorth", "deast")
      .select(col("user_id"), r6(col("alpha")).as("alpha"))

  def gpsReproject(s: SparkSession, dir: String): DataFrame = {
    val p = pos(s, dir)
    val alphas = Gps.flowAngle(p, Seq("user_id"), "ts", "dnorth", "deast")
    Gps.reproject(p, Seq("user_id"), "ts", "dnorth", "deast", alphas)
      .select(col("event_id"), col("user_id"),
        r6(col("xflow")).as("xflow"), r6(col("xtran")).as("xtran"))
  }

  def gpsDetrend(s: SparkSession, dir: String): DataFrame = {
    val p = pos(s, dir).withColumn("doy", graft.functions.decimalDoy(col("ts")))
    Gps.linearDetrend(p, Seq("user_id"), "doy", "dnorth")
      .select(col("event_id"), col("user_id"), r4(col("detrended")).as("detrended"))
  }

  def gpsVelocity(s: SparkSession, dir: String): DataFrame =
    Gps.velocity(pos(s, dir), Seq("user_id"), "ts", "dnorth", 21600)
      .select(col("user_id"), fmtTs(col("bucket_start")).as("bucket_start"),
        r6(col("vel_mpd")).as("vel_mpd"))

  def gpsDropErrors(s: SparkSession, dir: String): DataFrame = {
    val withErr = Tables.events(s, dir).select(
      col("event_id"), col("user_id"),
      ((col("event_id") % 13) * 0.08).as("dnorth_err"),
      ((col("event_id") % 11) * 0.09).as("deast_err"))
    Gps.dropLargeErrors(withErr, Seq("dnorth_err", "deast_err"), 0.8)
  }

  def gpsDisplacement(s: SparkSession, dir: String): DataFrame =
    Gps.displacement(pos(s, dir), Seq("user_id"), "ts", "dnorth", "deast")
      .select(col("event_id"), col("user_id"), r6(col("displacement")).as("displacement"))

  def gpsNormalize(s: SparkSession, dir: String): DataFrame =
    // reference normalize_gps_data (gpstools.py:798): series / scalar
    Tables.events(s, dir).select(col("event_id"), col("user_id"),
      (col("value") / 250.0).as("xnorm"))

  /** C+ `gps_station_dist` — pairwise station distances from windowed
    * mean positions (gpstools.py:756).
    */
  def gpsStationDist(s: SparkSession, dir: String): DataFrame =
    Gps.stationDistances(pos(s, dir), Seq("user_id"), "ts", "dnorth", "deast",
        "2024-01-05", "2024-01-15")
      .select(col("a_user_id"), col("b_user_id"), r6(col("distance")).as("distance"))

  /** C+r `gps_station_dist_radius` — the distance-valved variant
    * (VERDICT r11 item 5): pairs within 1.0 via the lossless grid-cell
    * equi-join, so output (and candidate mass) is bounded by the radius
    * instead of C(k,2). The oracle restates the set by brute force —
    * the blocking is exact, so only the threshold filter differs from
    * gps_station_dist's SQL.
    */
  def gpsStationDistRadius(s: SparkSession, dir: String): DataFrame =
    Gps.stationDistancesWithin(pos(s, dir), Seq("user_id"), "ts",
        "dnorth", "deast", "2024-01-05", "2024-01-15", maxDistance = 1.0)
      .select(col("a_user_id"), col("b_user_id"), r6(col("distance")).as("distance"))

  /** C5+ `gps_drop_windows` — droplist manual QC (gpstools.py:411
    * `drop_positions` applied to the instance): remove two bad-fix time
    * windows from the position series. The droplist compiles to a
    * row-local NOT(any BETWEEN) predicate — a complement filter keeps
    * most of the corpus, so the full scan is inherent; no join, no
    * shuffle.
    */
  def gpsDropWindows(s: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeriesOps.dropPositions(pos(s, dir), "ts", Seq(
        ("2024-01-03 00:00:00", "2024-01-04 12:00:00"),
        ("2024-01-10 06:00:00", "2024-01-10 18:00:00")))
      .select(col("event_id"), col("user_id"), fmtTs(col("ts")).as("ts"),
        r6(col("dnorth")).as("dnorth"), r6(col("deast")).as("deast"))

  /** C3+ `gps_zdetrend` — vertical detrend in sample order
    * (gpstools.py:498 z_detrend_wrt_xflow; see zDetrendSampleOrder for
    * why the fit is against row position, mirroring signal.detrend).
    * (ts, event_id) makes the per-user order total.
    */
  def gpsZDetrend(s: SparkSession, dir: String): DataFrame =
    Gps.zDetrendSampleOrder(pos(s, dir), Seq("user_id"),
        Seq("ts", "event_id"), "value")
      .select(col("event_id"), col("user_id"),
        r4(col("z_detrended")).as("z_detrended"))

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "gps_zdetrend" -> gpsZDetrend,
    "gps_drop_windows" -> gpsDropWindows,
    "gps_station_dist" -> gpsStationDist,
    "gps_station_dist_radius" -> gpsStationDistRadius,
    "gps_flow_angle" -> gpsFlowAngle,
    "gps_reproject" -> gpsReproject,
    "gps_detrend" -> gpsDetrend,
    "gps_velocity" -> gpsVelocity,
    "gps_drop_errors" -> gpsDropErrors,
    "gps_displacement" -> gpsDisplacement,
    "gps_normalize" -> gpsNormalize)

  private val fmt = "%Y-%m-%d %H:%M:%S.%f"

  private val alphaCte =
    s"""$posCte,
       |daily AS (SELECT user_id, date_trunc('day', ts) AS d,
       |            avg(dnorth) AS adn, avg(deast) AS ade
       |          FROM pos GROUP BY 1, 2),
       |fl AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1),
       |alphas AS (SELECT fl.user_id,
       |    atan((l.adn - f.adn) / (l.ade - f.ade)) AS alpha
       |  FROM fl
       |  JOIN daily f ON f.user_id = fl.user_id AND f.d = fl.d0
       |  JOIN daily l ON l.user_id = fl.user_id AND l.d = fl.d1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "gps_drop_windows" ->
      s"""$posCte
         |SELECT event_id, user_id, strftime(ts, '$fmt') AS ts,
         |  floor(dnorth * 1000000 + 0.5001) / 1000000 AS dnorth,
         |  floor(deast * 1000000 + 0.5001) / 1000000 AS deast
         |FROM pos
         |WHERE ts IS NULL
         |   OR NOT (ts BETWEEN TIMESTAMP '2024-01-03 00:00:00'
         |             AND TIMESTAMP '2024-01-04 12:00:00'
         |        OR ts BETWEEN TIMESTAMP '2024-01-10 06:00:00'
         |             AND TIMESTAMP '2024-01-10 18:00:00')""".stripMargin,
    "gps_station_dist" ->
      s"""$posCte,
         |means AS (SELECT user_id, avg(dnorth) AS mn, avg(deast) AS me
         |  FROM pos
         |  WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-15'
         |  GROUP BY user_id)
         |SELECT a.user_id AS a_user_id, b.user_id AS b_user_id,
         |  floor((sqrt(0.0 + (a.mn - b.mn) * (a.mn - b.mn)
         |    + (a.me - b.me) * (a.me - b.me))) * 1000000 + 0.5001) / 1000000 AS distance
         |FROM means a JOIN means b ON a.user_id < b.user_id""".stripMargin,
    // brute-force restatement: the grid-cell blocking is lossless, so
    // only the radius filter differs from gps_station_dist's SQL
    "gps_station_dist_radius" ->
      s"""$posCte,
         |means AS (SELECT user_id, avg(dnorth) AS mn, avg(deast) AS me
         |  FROM pos
         |  WHERE ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-15'
         |  GROUP BY user_id)
         |SELECT a_user_id, b_user_id,
         |  floor(d * 1000000 + 0.5001) / 1000000 AS distance
         |FROM (SELECT a.user_id AS a_user_id, b.user_id AS b_user_id,
         |    sqrt(0.0 + (a.mn - b.mn) * (a.mn - b.mn)
         |      + (a.me - b.me) * (a.me - b.me)) AS d
         |  FROM means a JOIN means b ON a.user_id < b.user_id)
         |WHERE d <= 1.0""".stripMargin,
    "gps_flow_angle" ->
      s"""$alphaCte
         |SELECT user_id, floor((alpha) * 1000000 + 0.5001) / 1000000 AS alpha FROM alphas""".stripMargin,
    "gps_reproject" ->
      s"""$alphaCte,
         |shifted AS (SELECT event_id, user_id, ts,
         |    dnorth - first_value(dnorth) OVER (PARTITION BY user_id ORDER BY ts) AS dn,
         |    deast - first_value(deast) OVER (PARTITION BY user_id ORDER BY ts) AS de
         |  FROM pos)
         |SELECT s.event_id, s.user_id,
         |  floor((cos(a.alpha) * s.de + sin(a.alpha) * s.dn) * 1000000 + 0.5001) / 1000000 AS xflow,
         |  floor((-sin(a.alpha) * s.de + cos(a.alpha) * s.dn) * 1000000 + 0.5001) / 1000000 AS xtran
         |FROM shifted s JOIN alphas a ON s.user_id = a.user_id""".stripMargin,
    "gps_zdetrend" ->
      s"""$posCte,
         |p2 AS (SELECT *,
         |    CAST(row_number() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) - 1 AS DOUBLE) AS pos
         |  FROM pos),
         |fit AS (SELECT user_id, regr_slope(value, pos) AS slope,
         |          regr_intercept(value, pos) AS icept
         |        FROM p2 GROUP BY user_id)
         |SELECT p2.event_id, p2.user_id,
         |  floor((p2.value - fit.icept - fit.slope * p2.pos) * 10000 + 0.5001) / 10000 AS z_detrended
         |FROM p2 JOIN fit ON p2.user_id = fit.user_id""".stripMargin,
    "gps_detrend" ->
      s"""$posCte,
         |p2 AS (SELECT *,
         |    dayofyear(ts) + hour(ts)/24.0 + minute(ts)/(60.0*24)
         |      + second(ts)/(60.0*60*24) AS doy
         |  FROM pos),
         |fit AS (SELECT user_id, regr_slope(dnorth, doy) AS slope,
         |          regr_intercept(dnorth, doy) AS icept
         |        FROM p2 GROUP BY user_id)
         |SELECT p2.event_id, p2.user_id,
         |  floor((p2.dnorth - fit.icept - fit.slope * p2.doy) * 10000 + 0.5001) / 10000 AS detrended
         |FROM p2 JOIN fit ON p2.user_id = fit.user_id""".stripMargin,
    "gps_velocity" ->
      s"""$posCte,
         |binned AS (SELECT user_id,
         |    CAST(epoch_us(ts) // 21600000000 AS BIGINT) AS bid,
         |    median(dnorth) AS med
         |  FROM pos GROUP BY 1, 2),
         |led AS (SELECT *,
         |    lead(bid) OVER (PARTITION BY user_id ORDER BY bid) AS nid,
         |    lead(med) OVER (PARTITION BY user_id ORDER BY bid) AS nmed
         |  FROM binned)
         |SELECT user_id,
         |  strftime(make_timestamp(bid * 21600000000), '$fmt') AS bucket_start,
         |  floor(((nmed - med) / 0.25) * 1000000 + 0.5001) / 1000000 AS vel_mpd
         |FROM led WHERE nid = bid + 1""".stripMargin,
    "gps_drop_errors" ->
      """SELECT event_id, user_id,
        |  (event_id % 13) * CAST(0.08 AS DOUBLE) AS dnorth_err,
        |  (event_id % 11) * CAST(0.09 AS DOUBLE) AS deast_err
        |FROM events
        |WHERE (event_id % 13) * CAST(0.08 AS DOUBLE) < 0.8
        |  AND (event_id % 11) * CAST(0.09 AS DOUBLE) < 0.8""".stripMargin,
    "gps_displacement" ->
      s"""$posCte,
         |shifted AS (SELECT event_id, user_id,
         |    dnorth - first_value(dnorth) OVER (PARTITION BY user_id ORDER BY ts) AS dn,
         |    deast - first_value(deast) OVER (PARTITION BY user_id ORDER BY ts) AS de
         |  FROM pos)
         |SELECT event_id, user_id,
         |  floor((sqrt(0.0 + dn * dn + de * de)) * 1000000 + 0.5001) / 1000000 AS displacement
         |FROM shifted""".stripMargin,
    "gps_normalize" ->
      """SELECT event_id, user_id, value / 250.0 AS xnorm FROM events""".stripMargin)
}
