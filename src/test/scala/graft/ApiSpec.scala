package graft

import org.apache.spark.sql.functions._
import graft.api._

class ApiSpec extends SparkSpec {
  import spark.implicits._

  test("Durations.parseSeconds handles pandas duration strings") {
    assert(Durations.parseSeconds("2H") === 7200L)
    assert(Durations.parseSeconds("30T") === 1800L)
    assert(Durations.parseSeconds("30min") === 1800L)
    assert(Durations.parseSeconds("1D") === 86400L)
    assert(Durations.parseSeconds("2.5H") === 9000L)
    assertThrows[IllegalArgumentException](Durations.parseSeconds("xyz"))
  }

  private def series(rows: (String, String, Double)*) =
    rows.toDF("k", "ts", "value").select(col("k"),
      col("ts").cast("timestamp").as("ts"), col("value"))

  test("DiurnalExtrema facade dispatches options like the reference") {
    val df = series(
      ("a", "2024-01-01 02:00:00", 8.0),
      ("a", "2024-01-01 20:00:00", 1.0),
      ("a", "2024-01-02 10:00:00", 9.0),
      ("a", "2024-01-02 20:00:00", 2.0))
    val plain = new DiurnalExtrema(df, Seq("k")).df.orderBy("day").collect()
    assert(plain(0).getAs[Double]("max_val") === 8.0) // plain: in-day max
    val crossMidnight = new DiurnalExtrema(df, Seq("k"),
      minFirst = true, maxNextDay = true).df.orderBy("day").collect()
    assert(crossMidnight(0).getAs[Double]("max_val") === 9.0) // 18h window
    val df2 = series(
      ("a", "2024-01-01 01:00:00", 1.0), ("a", "2024-01-01 12:00:00", 9.0),
      ("a", "2024-01-02 01:00:00", 4.0), ("a", "2024-01-02 12:00:00", 5.0))
    val thresholded = new DiurnalExtrema(df2, Seq("k"), threshold = Some(5.0))
    assert(thresholded.df.count() === 1) // day2 amplitude 1 < 5 dropped
  }

  test("OnIce facade wires flow angle, velocity, smoothing") {
    val pos = (0 until 48).map { h =>
      ("s1", f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:00:00", 0.5 * h, 0.25 * h)
    }.toDF("k", "ts", "dnorth", "deast")
      .select(col("k"), col("ts").cast("timestamp").as("ts"),
        col("dnorth"), col("deast"))
    val onIce = new OnIce(pos, Seq("k"))
    val alpha = onIce.flowDirectionAngle.head.getAs[Double]("alpha")
    assert(math.abs(alpha - math.atan(2.0)) < 1e-9) // dn/de slope = 2
    val vel = onIce.calcVelocity("dnorth", "6H")
    assert(vel.count() > 0)
    // dnorth advances 0.5/h -> 3 per 6h bucket -> 12 m/day
    assert(math.abs(vel.head.getAs[Double]("vel_mpd") - 12.0) < 1e-6)
    assert(onIce.smoothed("dnorth", "2H").count() === 48)
  }

  test("WeatherStation facade runs the melt pipeline with fillna(0)") {
    val aws = (0 until 48).map { h =>
      ("w1", f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:00:00",
        if (h % 24 > 8 && h % 24 < 20) 5.0 else -5.0, // melt only daytime
        math.max(0.0, 500.0 * math.sin((h % 24 - 6) / 12.0 * math.Pi)),
        math.max(0.0, 250.0 * math.sin((h % 24 - 6) / 12.0 * math.Pi)))
    }.toDF("k", "ts", "temp", "incoming", "reflected")
      .select(col("k"), col("ts").cast("timestamp").as("ts"),
        col("temp"), col("incoming"), col("reflected"))
    val ws = new WeatherStation(aws, Seq("k"))
    val melt = ws.calcMelt()
    assert(melt.count() === 48)
    val rates = melt.select("temp", "melt_rate").collect()
    assert(rates.filter(_.getDouble(0) <= 0).forall(_.getDouble(1) === 0.0))
    assert(rates.exists(_.getDouble(1) > 0.0))
    val alb = ws.calcAlbedo()
    assert(alb.count() === 3) // 2 days + the -1h shift day boundary

    // shadow-corrected chain: runs end to end on the corrected series
    val melt2 = ws.calcMeltShadowCorrected(("11:00", "13:15"))
    assert(melt2.count() === 48)
    assert(melt2.columns.contains("melt_rate"))
  }
}
