package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.operators.Hydro

/** The reference's end-to-end water-level pipelines (hydrotools.py:278-
  * 478): the compositions a `datatools` user calls directly, built from
  * graft's distributed primitives (as-of barometric correction,
  * broadcast piecewise intervals, unit conversions, overburden
  * fractions). Everything stays a lazy DataFrame plan — one shuffle for
  * the as-of join, broadcast joins for the interval tables, row-local
  * math for the rest — so each pipeline holds at 100 TB of sensor data
  * keyed by station.
  *
  * The reference hard-codes row-position slices for sensor-height
  * changes (e.g. `Z_array[881:920]`, hydrotools.py:361); those are
  * artifacts of one file's ordering, so the facades take dated
  * adjustment intervals instead — the same information, expressed in a
  * way that survives partitioned, unordered data.
  */
object HydroPipelines {

  /** hydrotools.py:392 `calc_submerged_depth`: vented-transducer level
    * in feet to submerged depth in meters relative to the zero reading.
    */
  def calcSubmergedDepth(df: DataFrame, lvlCol: String,
                         zeroReading: Double): DataFrame =
    df.withColumn("submerged_depth",
      -convertUnits("ft", "m", col(lvlCol)) + lit(zeroReading))

  /** hydrotools.py:278 `calc_stage_jeme`: dual distance-ranger stream
    * stage — water sensor gives stage (datum - distance), ablation
    * sensor gives logger-to-ground; readings at or beyond the sensor's
    * max range are dropped, and individually flagged bad picks
    * (`drop_list`) have their stage nulled (the reference sets NaN).
    */
  def calcStageJeme(df: DataFrame, dropList: Seq[String] = Nil,
                    refDatum: Double = 4.0,
                    waterCol: String = "water_reading",
                    ablationCol: String = "ablation_reading",
                    tsCol: String = "ts",
                    badDataReadout: Double = 80.0): DataFrame = {
    val dropped = dropList
      .map(t => col(tsCol) === lit(t).cast("timestamp"))
      .reduceOption(_ || _).getOrElse(lit(false))
    df.filter(col(waterCol) < badDataReadout)
      .withColumn("logger_to_stream", convertUnits("in", "m", col(waterCol)))
      .withColumn("logger_to_ground", convertUnits("in", "m", col(ablationCol)))
      .withColumn("stage",
        when(dropped, lit(null).cast("double"))
          .otherwise(lit(refDatum) - col("logger_to_stream")))
  }

  /** hydrotools.py:410 `calc_wlb_pira`: combine the 3-second lowering
    * log with the 15-minute monitoring log into one water-level-above-
    * bed series. The lowering log gets its sensor height from dated
    * adjustment intervals (rows outside any interval drop, matching the
    * reference's dropna over the slice-assigned heights); the
    * monitoring log runs at the final height. Rows where the water
    * level exceeds the ice thickness are physical impossibilities from
    * sensor moves and drop (hydrotools.py:466).
    */
  def calcWlbPira(spark: SparkSession, lowering: DataFrame,
                  monitoring: DataFrame, zeroReading: Double,
                  heightIntervals: Seq[(String, String, Double)],
                  finalHeight: Double,
                  iceThickness: Double = 503.0,
                  iceSurfaceMasl: Double = 764.9,
                  tsCol: String = "ts", lvlCol: String = "Lvl"): DataFrame = {
    val bedElevation = iceSurfaceMasl - iceThickness
    val low = Hydro.piecewiseIntervals(spark,
      calcSubmergedDepth(lowering, lvlCol, zeroReading),
      tsCol, heightIntervals, "piz_hgt")
    val mon = calcSubmergedDepth(monitoring, lvlCol, zeroReading)
      .withColumn("piz_hgt", lit(finalHeight))
    low.unionByName(mon)
      .withColumn("water_level_above_bed", col("submerged_depth") + col("piz_hgt"))
      // pandas NaN > x is False: null levels survive the sanity filter
      .filter(col("water_level_above_bed").isNull ||
        !(col("water_level_above_bed") > iceThickness))
      .withColumn("water_level_above_bed_fob",
        wlb2fob(col("water_level_above_bed"), lit(iceThickness)))
      .withColumn("ground_water_level_altitude",
        col("water_level_above_bed") + lit(bedElevation))
  }

  /** The shared shape of hydrotools.py:310 `calc_wlb_radi` and :479
    * `calc_wlb_jeme`: a moulin pressure-transducer series is corrected
    * for atmospheric-pressure drift against a barometric series, the
    * sensor's height above the bed comes from dated lowering-adjustment
    * intervals, and both raw and corrected water levels are emitted
    * with their overburden fractions and sea-level altitudes.
    *
    * @param zeroReading barometric pressure at instrumentation (mH2O);
    *        None = first barometric value per key
    * @param dropWindows [start, end) timestamp windows to discard
    *        (the reference's post-hoc cleanouts, hydrotools.py:388)
    */
  def calcWlbMoulin(spark: SparkSession, level: DataFrame, atm: DataFrame,
                    keys: Seq[String],
                    heightIntervals: Seq[(String, String, Double)],
                    iceThickness: Double, iceSurfaceMasl: Double,
                    zeroReading: Option[Double] = None,
                    dropWindows: Seq[(String, String)] = Nil,
                    tsCol: String = "ts", lvlCol: String = "lvl",
                    pAtmCol: String = "p_atm"): DataFrame = {
    val bedElevation = iceSurfaceMasl - iceThickness
    val corrected = Hydro.atmosphericCorrection(
      level, atm, keys, tsCol, lvlCol, pAtmCol, zeroReading)
    val withHgt = Hydro.piecewiseIntervals(spark, corrected, tsCol,
      heightIntervals, "sensor_hgt")
    val kept = dropWindows.foldLeft(withHgt) { case (d, (lo, hi)) =>
      d.filter(!(col(tsCol) >= lit(lo).cast("timestamp") &&
        col(tsCol) < lit(hi).cast("timestamp")))
    }
    kept
      .withColumn("submerged_depth", col(lvlCol))
      .withColumn("submerged_depth_corrected", col(s"${lvlCol}_corrected"))
      .withColumn("water_level_above_bed", col(lvlCol) + col("sensor_hgt"))
      .withColumn("water_level_above_bed_corrected",
        col(s"${lvlCol}_corrected") + col("sensor_hgt"))
      .withColumn("water_level_above_bed_fob",
        wlb2fob(col("water_level_above_bed"), lit(iceThickness)))
      .withColumn("ground_water_level_altitude",
        col("water_level_above_bed") + lit(bedElevation))
      .withColumn("ground_water_level_altitude_corrected",
        col("water_level_above_bed_corrected") + lit(bedElevation))
  }

  /** hydrotools.py:310 `calc_wlb_radi` with the reference's site
    * constants (depth_to_water=-244.38, ice 712 m, surface 933.2 masl).
    */
  def calcWlbRadi(spark: SparkSession, level: DataFrame, atm: DataFrame,
                  keys: Seq[String],
                  heightIntervals: Seq[(String, String, Double)],
                  zeroReading: Double,
                  dropWindows: Seq[(String, String)] = Nil,
                  tsCol: String = "ts", lvlCol: String = "lvl",
                  pAtmCol: String = "p_atm"): DataFrame =
    calcWlbMoulin(spark, level, atm, keys, heightIntervals,
      iceThickness = 712.0, iceSurfaceMasl = 933.2,
      zeroReading = Some(zeroReading), dropWindows = dropWindows,
      tsCol = tsCol, lvlCol = lvlCol, pAtmCol = pAtmCol)

  /** hydrotools.py:479 `calc_wlb_jeme` with the reference's site
    * constants (ice 503 m, surface 765.8 masl, P0 from the series).
    */
  def calcWlbJeme(spark: SparkSession, level: DataFrame, atm: DataFrame,
                  keys: Seq[String],
                  heightIntervals: Seq[(String, String, Double)],
                  dropWindows: Seq[(String, String)] = Nil,
                  tsCol: String = "ts", lvlCol: String = "lvl",
                  pAtmCol: String = "p_atm"): DataFrame =
    calcWlbMoulin(spark, level, atm, keys, heightIntervals,
      iceThickness = 503.0, iceSurfaceMasl = 765.8,
      zeroReading = None, dropWindows = dropWindows,
      tsCol = tsCol, lvlCol = lvlCol, pAtmCol = pAtmCol)
}
