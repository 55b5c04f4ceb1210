package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._

/** Hydrology operators (SURVEY §2 D1-D5; reference hydrotools.py). */
object Hydro {

  /** D3: atmospheric-pressure correction (hydrotools.py:479-545
    * calc_wlb_jeme): as-of join a barometric series onto the level
    * series per sensor and subtract the drift from the zero reading —
    * lvl_corrected = lvl - (p_atm - p_atm_zero).
    *
    * @param zeroReading barometric value at instrumentation time
    *        (hydrotools.py:310 calc_wlb_radi's zero_reading_value);
    *        None = the first barometric value per sensor (calc_wlb_jeme's
    *        P0_jeme convention)
    */
  def atmosphericCorrection(level: DataFrame, atm: DataFrame, keys: Seq[String],
                            tsCol: String, lvlCol: String,
                            pAtmCol: String,
                            zeroReading: Option[Double] = None): DataFrame = {
    val joined = TimeSeriesOps.asofJoinBackward(level, atm, keys, tsCol, Seq(pAtmCol))
    val withP0 = zeroReading match {
      case Some(z) => joined.withColumn("_p0", lit(z))
      case None =>
        val p0 = atm.groupBy(keys.map(col): _*)
          .agg(min_by(col(pAtmCol), col(tsCol)).as("_p0"))
        joined.join(p0, keys)
    }
    withP0
      .withColumn(s"${lvlCol}_corrected",
        col(lvlCol) - (col(pAtmCol) - col("_p0")))
      .drop("_p0")
  }

  /** D4: piecewise sensor-height assignment over dated adjustment
    * intervals (hydrotools.py:410-446's piz_hgt blocks): a tiny
    * interval table broadcast range-joined onto the observations
    * (BroadcastNestedLoopJoin — bounded by the handful of intervals).
    *
    * @param intervals (startInclusive, endExclusive, value) as
    *        timestamp strings
    */
  def piecewiseIntervals(spark: SparkSession, df: DataFrame, tsCol: String,
                         intervals: Seq[(String, String, Double)],
                         outCol: String): DataFrame = {
    import spark.implicits._
    val iv = intervals.toDF("_lo", "_hi", outCol)
      .select(col("_lo").cast("timestamp").as("_lo"),
        col("_hi").cast("timestamp").as("_hi"), col(outCol))
    df.join(broadcast(iv), col(tsCol) >= col("_lo") && col(tsCol) < col("_hi"))
      .drop("_lo", "_hi")
  }

  /** D5: stream stage from ultrasonic distance readings in inches
    * (hydrotools.py:239 calc_stage_radi): drop bad readouts (the
    * sensor's max-range sentinel), stage = datum - reading in meters.
    */
  def streamStageFromReadings(df: DataFrame, readingCol: String,
                              refDatum: Double = 4.0,
                              badDataReadout: Double = 67.0): DataFrame =
    df.filter(col(readingCol) < badDataReadout)
      .withColumn("logger_to_stream", convertUnits("in", "m", col(readingCol)))
      .withColumn("stage", lit(refDatum) - col("logger_to_stream"))
}
