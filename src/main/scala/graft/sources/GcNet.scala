package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** GC-NET AWS file reader (reference melt_model.py:169-272
  * read_gcnet_headers / read_JAR1_data).
  *
  * GC-NET files carry their column descriptions one-per-line at the top
  * (optionally numbered), separated from the space-delimited data block
  * by a blank line. Time is (year, julian decimal day); the reference
  * rounds the reconstructed timestamp to the hour and averages the air
  * temperature sensors.
  */
object GcNet {

  /** Canonical parameter names searched for in header lines (the
    * reference matches against its gcnet parameter table; this is the
    * subset its melt pipeline consumes).
    */
  private val knownParams = Seq(
    "Station Number", "Year", "Julian Decimal Time", "Atm_Pressure",
    "Air Temp 1", "Air Temp 2", "SW_down", "SW_up", "Albedo",
    "Net Radiation", "Wind Speed 1", "Wind Direction 1", "Snow Height 1")

  /** Parse the header block: drop a leading 'Data' line, strip leading
    * ordinal numbers, stop at the first blank line.
    */
  def parseHeaders(lines: Seq[String]): Seq[String] = {
    val body = lines.dropWhile(_.contains("Data"))
    body.takeWhile(_.trim.nonEmpty)
      .map(_.replaceFirst("^\\d\\d? ", "").trim)
  }

  /** Map raw header descriptions to canonical column names (reference
    * rename_gcnet_headers): first known parameter contained in the
    * description wins; unmatched headers keep a sanitized description.
    */
  def renameHeaders(headers: Seq[String]): Seq[String] =
    headers.map { h =>
      knownParams.find(h.contains).getOrElse(
        h.replaceAll("[^A-Za-z0-9]+", "_").stripSuffix("_"))
    }

  /** Read a GC-NET file into a timestamped DataFrame: header block
    * parsed driver-side (KBs), data block read as space-delimited
    * columns, timestamp = Jan 1 of `Year` + (julian decimal day - 1),
    * rounded to the hour; air-temperature sensors averaged.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val head = scala.io.Source.fromFile(path)
    val headerLines =
      try parseHeaders(head.getLines().toSeq)
      finally head.close()
    val cols = renameHeaders(headerLines)
    val skip = headerLines.length + 1 // header block + blank separator

    // The reference nulls sentinel TOKENS at parse time
    // (na_values=['999.0000','999.0'], melt_model.py:254). Do the same:
    // blank the tokens before the CSV parse — a post-parse na.replace
    // with string keys would never match double-typed columns, leaving
    // real 999.0 values in the sensor series.
    val naTokens = Set("999.0000", "999.0")
    val kept = spark.read.textFile(path).rdd.zipWithIndex()
      .filter { case (l, i) => i >= skip && l.trim.nonEmpty }
      .map(_._1.trim.split(" +")
        .map(t => if (naTokens(t)) "" else t).mkString(","))
    val ds = spark.createDataset(kept)(org.apache.spark.sql.Encoders.STRING)
    val raw = spark.read
      .option("inferSchema", "true")
      .csv(ds)
      .toDF(cols: _*)

    val yearStart = to_timestamp(concat(col("Year").cast("int"), lit("-01-01")))
    val us = (col("Julian Decimal Time") - 1.0) * 86400.0 * 1000000.0
    val ts = timestamp_micros(unix_micros(yearStart) + us.cast("long"))
    // round to hour like the reference (index.round('H'))
    val rounded = timestamp_seconds(
      ((unix_micros(ts) + 1800L * 1000000) / (3600L * 1000000)).cast("long") * 3600L)
    val airCols = cols.filter(_.contains("Air Temp"))
    val withTs = raw.withColumn("ts", rounded)
    if (airCols.isEmpty) withTs
    else withTs.withColumn("avg_air_temp",
      airCols.map(col).reduce(_ + _) / airCols.length)
  }

  /** JAR1 weather-station wrapper (melt_model.py:236 read_JAR1_data):
    * the GC-NET read narrowed to the columns the melt pipeline consumes
    * — timestamp, averaged air temperature, shortwave up/down, albedo,
    * pressure and wind when present.
    */
  def readJar1(spark: SparkSession, path: String): DataFrame = {
    val df = read(spark, path)
    val wanted = Seq("ts", "avg_air_temp", "SW_down", "SW_up", "Albedo",
      "Atm_Pressure", "Wind Speed 1", "Net Radiation")
    df.select(wanted.filter(df.columns.contains).map(col): _*)
  }
}
