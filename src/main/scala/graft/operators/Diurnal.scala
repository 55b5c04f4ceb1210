package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Diurnal extrema picking (SURVEY §2 B1-B6; reference diurnal.py
  * `DiurnalExtrema.find_diurnal_extrema`, diurnal.py:301-345).
  *
  * Picks exactly one minimum and one maximum per 24 h period of a noisy
  * diurnally-varying series. Ties break to the earliest observation,
  * matching pandas `idxmin`/`idxmax` first-occurrence semantics.
  *
  * Scale design: everything is windows over (key, day) plus one
  * group-by — a single hash shuffle. The cross-midnight max-next-day
  * variant never does an unbounded range join: each observation can
  * only serve the 18 h window anchored in its own day or the previous
  * one, so candidates are duplicated at most 2x (bounded explode) and
  * joined on (key, day) equality.
  */
object Diurnal {

  /** Per-key-per-day min/max values with first-occurrence timestamps
    * (B1; diurnal.py:301).
    * Output: keys..., day (timestamp at midnight), min_val, min_time,
    * max_val, max_time.
    */
  def extrema(df: DataFrame, keys: Seq[String], tsCol: String, valCol: String): DataFrame = {
    val dayCol = date_trunc("day", col(tsCol))
    val part = Window.partitionBy(keys.map(col) :+ dayCol: _*)
    df.withColumn("_day", dayCol)
      .withColumn("_minv", min(col(valCol)).over(part))
      .withColumn("_maxv", max(col(valCol)).over(part))
      .groupBy(keys.map(col) :+ col("_day").as("day"): _*)
      .agg(
        first(col("_minv")).as("min_val"),
        min(when(col(valCol) === col("_minv"), col(tsCol))).as("min_time"),
        first(col("_maxv")).as("max_val"),
        min(when(col(valCol) === col("_maxv"), col(tsCol))).as("max_time"))
  }

  /** Min-first + max-next-day variant (B2; diurnal.py:325-330): the
    * day's minimum is found in the calendar day; the maximum is then
    * searched in the 18 h window after the minimum, crossing midnight.
    * Days where the picked max < min are dropped (diurnal.py:335).
    */
  def extremaMinFirst(df: DataFrame, keys: Seq[String], tsCol: String,
                      valCol: String, maxWindowHours: Int = 18): DataFrame = {
    val dayCol = date_trunc("day", col(tsCol))
    val part = Window.partitionBy(keys.map(col) :+ dayCol: _*)
    val mins = df.withColumn("_day", dayCol)
      .withColumn("_minv", min(col(valCol)).over(part))
      .groupBy(keys.map(col) :+ col("_day").as("day"): _*)
      .agg(first(col("_minv")).as("min_val"),
        min(when(col(valCol) === col("_minv"), col(tsCol))).as("min_time"))

    // Bounded candidate duplication: an observation at ts can fall in the
    // [min_time, min_time+18h] window only for day(ts) or day(ts)-1.
    // The mins side renames its key columns to avoid self-join ambiguity.
    val wUs = maxWindowHours.toLong * 3600 * 1000000
    val minsR = keys.foldLeft(mins)((d, k) => d.withColumnRenamed(k, "_k_" + k))
    val cand = df
      .withColumn("_cday", explode(array(date_trunc("day", col(tsCol)),
        date_trunc("day", col(tsCol)) - expr("INTERVAL 1 DAY"))))
      .join(minsR, keys.map(k => col(k) === col("_k_" + k)).reduce(_ && _) &&
        col("_cday") === col("day"))
      .filter(unix_micros(col(tsCol)) >= unix_micros(col("min_time")) &&
        unix_micros(col(tsCol)) <= unix_micros(col("min_time")) + wUs)
      .select(keys.map(col) ++
        Seq(col("day"), col("min_val"), col("min_time"), col(tsCol), col(valCol)): _*)

    val candPart = Window.partitionBy(keys.map(col) :+ col("day"): _*)
    cand.withColumn("_maxv", max(col(valCol)).over(candPart))
      .groupBy(keys.map(col) :+ col("day"): _*)
      .agg(first(col("min_val")).as("min_val"),
        first(col("min_time")).as("min_time"),
        first(col("_maxv")).as("max_val"),
        min(when(col(valCol) === col("_maxv"), col(tsCol))).as("max_time"))
      .filter(!(col("min_val") > col("max_val")))
  }

  /** Daily amplitude (B3; diurnal.py:296-299). */
  def amplitude(ext: DataFrame): DataFrame =
    ext.withColumn("amplitude", col("max_val") - col("min_val"))

  /** Amplitude threshold filter (B4; diurnal.py:369 `apply_threshold`
    * drops days with max-min < threshold).
    */
  def applyThreshold(ext: DataFrame, threshold: Double): DataFrame =
    ext.filter(!(col("max_val") - col("min_val") < threshold))

  /** Decimal hours of an extremum after its day start (B5; diurnal.py:257). */
  def decimalHours(time: Column, day: Column): Column =
    (unix_micros(time) - unix_micros(day)) / lit(3600.0 * 1000000)

  /** Predicted-timing extrema (B6; diurnal.py:454 `predict_extrema` +
    * get_occurance_windows): mean occurrence-hours of the plain extrema
    * over a calibration window (each occurrence rounded to the nearest
    * hour, mean rounded to 3 dp — diurnal.py:570/595), then extrema are
    * picked only inside +/- `halfWindowHours` around the predicted hour
    * of each day. Days with no observation in a window keep a null pick
    * (the reference appends None rows); rows where both picks exist and
    * min > max are dropped.
    */
  def extremaPredicted(df: DataFrame, keys: Seq[String], tsCol: String,
                       valCol: String, calibEndExclusive: String,
                       halfWindowHours: Int = 8): DataFrame = {
    val calib = extrema(
      df.filter(col(tsCol) < lit(calibEndExclusive).cast("timestamp")),
      keys, tsCol, valCol)
    val occ = calib.groupBy(keys.map(col): _*).agg(
      round(avg(round(decimalHours(col("min_time"), col("day")))), 3).as("min_occ"),
      round(avg(round(decimalHours(col("max_time"), col("day")))), 3).as("max_occ"))

    val dayCol = date_trunc("day", col(tsCol))
    val days = df.select(keys.map(col) :+ dayCol.as("day"): _*).distinct()
      .join(occ, keys, "inner")
    val obs = df.select(keys.map(col) ++ Seq(col(tsCol), col(valCol)) :+
      dayCol.as("_oday"): _*)

    // window is 2*half <= 24h anchored around an in-day hour: candidates
    // come from the observation's own day or its neighbors -> bounded 3x
    // duplication, joined on (key, day) equality.
    val candDays = explode(array(col("_oday"),
      col("_oday") - expr("INTERVAL 1 DAY"), col("_oday") + expr("INTERVAL 1 DAY")))
    val cand = obs.withColumn("day", candDays).drop("_oday")
      .join(days, keys :+ "day")
    def pickAgg(occCol: String, tag: String): DataFrame = {
      val lo = unix_micros(col("day")) + ((col(occCol) - lit(halfWindowHours.toDouble)) * 3600e6).cast("long")
      val hi = unix_micros(col("day")) + ((col(occCol) + lit(halfWindowHours.toDouble)) * 3600e6).cast("long")
      val inWin = cand.filter(unix_micros(col(tsCol)) >= lo && unix_micros(col(tsCol)) <= hi)
      val part = Window.partitionBy(keys.map(col) :+ col("day"): _*)
      val ext = if (tag == "min") min(col(valCol)).over(part) else max(col(valCol)).over(part)
      inWin.withColumn("_ext", ext)
        .groupBy(keys.map(col) :+ col("day"): _*)
        .agg(first(col("_ext")).as(s"${tag}_val"),
          min(when(col(valCol) === col("_ext"), col(tsCol))).as(s"${tag}_time"))
    }
    val minPicks = pickAgg("min_occ", "min")
    val maxPicks = pickAgg("max_occ", "max")
    days.select(keys.map(col) :+ col("day"): _*)
      .join(minPicks, keys :+ "day", "left")
      .join(maxPicks, keys :+ "day", "left")
      .filter(col("min_val").isNull || col("max_val").isNull ||
        !(col("min_val") > col("max_val")))
  }
}
