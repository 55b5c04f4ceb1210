package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weather-station / melt-model operators (SURVEY §2 E1-E4; reference
  * melt_model.py `WeatherStation`).
  */
object Melt {

  /** Shadow correction (E1; melt_model.py:366 apply_shadow_correction):
    * inside the daily shaded time-of-day window, observations below
    * min(first, last) of that day's shaded subset are spurious drops;
    * they are nulled and linearly interpolated over (per key).
    *
    * @param shadeStartMin/shadeEndMin  shaded window as minutes-of-day,
    *        inclusive (reference between_time at minute resolution)
    */
  def shadowCorrection(df: DataFrame, keys: Seq[String], tsCol: String,
                       solarCol: String, shadeStartMin: Int, shadeEndMin: Int,
                       outCol: String = "solar_corrected"): DataFrame = {
    val mod = hour(col(tsCol)) * 60 + minute(col(tsCol))
    val shaded = mod >= shadeStartMin && mod <= shadeEndMin
    val dayPart = Window
      .partitionBy(keys.map(col) :+ date_trunc("day", col(tsCol)): _*)
      .orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val sFirst = first(when(shaded, col(solarCol)), ignoreNulls = true).over(dayPart)
    val sLast = last(when(shaded, col(solarCol)), ignoreNulls = true).over(dayPart)
    val masked = df.withColumn("_masked",
      when(shaded && col(solarCol) < least(sFirst, sLast), lit(null).cast("double"))
        .otherwise(col(solarCol)))
    TimeSeriesOps.interpolateLinear(masked, keys, tsCol, "_masked", outCol)
      .drop("_masked")
  }

  /** Continuous (per-observation) albedo (melt_model.py:408 calc_albedo
    * with daily=False): ratio of the 2 h c_rolling-smoothed reflected
    * and incoming series, >= 1 invalid -> null + forward-filled.
    */
  def continuousAlbedo(df: DataFrame, keys: Seq[String], tsCol: String,
                       incomingCol: String, reflectedCol: String): DataFrame = {
    val frame = Window.partitionBy(keys.map(col): _*)
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-(7200L * 1000000 - 1), 0)
    val raw = avg(col(reflectedCol)).over(frame) / avg(col(incomingCol)).over(frame)
    val d = df.withColumn("_alb",
      when(raw >= 1.0, lit(null).cast("double")).otherwise(raw))
    TimeSeriesOps.ffill(d, keys, tsCol, Seq("_alb"))
      .withColumnRenamed("_alb", "albedo")
  }

  /** Daily albedo at solar noon (E2; melt_model.py:408 calc_albedo):
    * incoming and reflected are 2 h c_rolling-smoothed (trailing mean,
    * index shifted -1 h), then per day the albedo is
    * reflected/incoming at the time of maximum smoothed incoming;
    * ratios >= 1 are invalid and forward-filled from the previous day.
    *
    * Output: keys..., day, albedo (ffilled).
    */
  def dailyAlbedo(df: DataFrame, keys: Seq[String], tsCol: String,
                  incomingCol: String, reflectedCol: String): DataFrame = {
    val frame = Window.partitionBy(keys.map(col): _*)
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-(7200L * 1000000 - 1), 0)
    val smoothed = df
      .withColumn("_inc_s", avg(col(incomingCol)).over(frame))
      .withColumn("_out_s", avg(col(reflectedCol)).over(frame))
      .withColumn("_ts_c", timestamp_micros(unix_micros(col(tsCol)) - 3600L * 1000000))
      .withColumn("_d", date_trunc("day", col("_ts_c")))
    val pickW = Window.partitionBy(keys.map(col) :+ col("_d"): _*)
      .orderBy(col("_inc_s").desc, col("_ts_c").asc)
    val daily = smoothed.withColumn("_rn", row_number().over(pickW))
      .filter(col("_rn") === 1)
      .select(keys.map(col) :+ col("_d").as("day") :+
        (col("_out_s") / col("_inc_s")).as("_raw"): _*)
      .withColumn("_albedo", when(col("_raw") >= 1.0, lit(null).cast("double"))
        .otherwise(col("_raw")))
    val ffill = Window.partitionBy(keys.map(col): _*).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("albedo", last(col("_albedo"), ignoreNulls = true).over(ffill))
      .drop("_raw", "_albedo")
  }
}
