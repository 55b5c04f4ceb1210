package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema'd readers mirroring the reference's field-data loaders
  * (SURVEY §2 K). Each reader yields a timestamped DataFrame ready for
  * the graft operators.
  *
  * The logger formats carry multi-line preambles (station metadata,
  * units, aggregation rows) that pandas skips with `skiprows`. Spark's
  * CSV reader has no row-index skip, so these readers drop the preamble
  * lines with a zipWithIndex filter before parsing — one extra pass
  * over what are single-logger files (MBs, not TBs; the 100 TB path is
  * parquet, these are ingest adapters).
  */
object Sources {

  /** NEU GPS daily-position files (reference gpstools.py:688
    * load_NEUgps): headerless CSV, timestamp index first, '  nan'
    * sentinel nulls, err_code dropped.
    */
  def readNeuGps(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("doy", DoubleType),
      StructField("dnorth", DoubleType),
      StructField("dnorth_err", DoubleType),
      StructField("deast", DoubleType),
      StructField("deast_err", DoubleType),
      StructField("dheight", DoubleType),
      StructField("dheight_err", DoubleType),
      StructField("err_code", LongType)))
    spark.read.schema(schema)
      .option("header", "false")
      .option("nullValue", "  nan")
      .csv(path)
      .drop("err_code")
  }

  /** NEUXT velocity files (gpstools.py:702 load_NEUXTvel). */
  def readNeuxtVel(spark: SparkSession, path: String): DataFrame = {
    val cols = Seq("N_vel", "E_vel", "U_vel", "X_vel", "T_vel")
    val schema = StructType(StructField("ts", TimestampType) +:
      cols.map(c => StructField(c, DoubleType)))
    spark.read.schema(schema)
      .option("header", "true")
      .option("nullValue", "  nan")
      .csv(path)
  }

  /** Drop preamble lines by index and parse the rest as CSV with the
    * header taken from the surviving first line. `extraNaTokens` are
    * nulled at the TOKEN level before the parse (pandas na_values
    * semantics) — a post-parse string na.replace never matches
    * double-typed columns (ADVICE r2; logger files carry no quoted
    * commas, so the token split is safe).
    */
  private def csvSkippingRows(spark: SparkSession, path: String,
                              skip: Set[Long], nullValue: String,
                              extraNaTokens: Set[String] = Set.empty): DataFrame = {
    val kept = spark.read.textFile(path).rdd.zipWithIndex()
      .filter { case (_, i) => !skip.contains(i) }
      .map { case (l, _) =>
        if (extraNaTokens.isEmpty) l
        else l.split(",", -1)
          .map(t => if (extraNaTokens(t)) "" else t).mkString(",")
      }
    val ds: Dataset[String] = spark.createDataset(kept)(Encoders.STRING)
    spark.read
      .option("header", "true")
      .option("nullValue", nullValue)
      .option("inferSchema", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(ds)
  }

  /** CR1000 logger files (hydrotools.py:207 read_cr1000_csv): TOA5
    * preamble on line 0, units/aggregation rows on lines 2-3, 'NAN'
    * nulls, diagnostic columns dropped.
    */
  def readCr1000(spark: SparkSession, path: String,
                 dropCols: Seq[String] = Seq("RECORD", "BattV", "Freq", "Amp",
                   "SNRat", "NFreq", "DRat", "Digits")): DataFrame = {
    val df = csvSkippingRows(spark, path, Set(0L, 2L, 3L), "NAN")
    val ts = df.columns.head
    df.withColumnRenamed(ts, "ts")
      .withColumn("ts", col("ts").cast("timestamp"))
      .drop(dropCols.filter(df.columns.contains): _*)
  }

  /** STR17 stage files (hydrotools.py:231 read_str17_csv): CR1000
    * format, only RECORD dropped, fully null rows removed.
    */
  def readStr17(spark: SparkSession, path: String): DataFrame =
    readCr1000(spark, path, Seq("RECORD")).na.drop()

  /** 2018 moulin CR1000 files (hydrotools.py:569 read_moulin18): level
    * in feet becomes submerged_depth in meters (negated); when the file
    * carries the ultrasonic Stage / ablation Abl rangers, their
    * distances convert to meters with the reference's fixed 4 m stage
    * datum; diagnostic columns drop unless `allData`.
    */
  def readMoulin18(spark: SparkSession, path: String,
                   allData: Boolean = false): DataFrame = {
    val drop = if (allData) Nil
      else Seq("RECORD", "BattV", "PTemp_C", "Freq", "Amp", "SNRat",
        "NFreq", "DRat", "TR", "TT", "Digits")
    val df = readCr1000(spark, path, drop)
    val withDepth = df
      .withColumn("submerged_depth",
        -graft.functions.convertUnits("ft", "m", col("Lvl")))
      .withColumnRenamed("Lvl", "submerged_depth_ft")
    // rename the raw columns FIRST: Spark's case-insensitive resolution
    // would otherwise make withColumn("stage", ...) overwrite "Stage"
    val withStage =
      if (!withDepth.columns.contains("Stage")) withDepth
      else withDepth
        .withColumnRenamed("Stage", "logger_to_stream_in")
        .withColumn("logger_to_stream",
          graft.functions.convertUnits("in", "m", col("logger_to_stream_in")))
        .withColumn("stage", lit(4.0) - col("logger_to_stream"))
    if (!withStage.columns.contains("Abl")) withStage
    else withStage
      .withColumnRenamed("Abl", "logger_to_ground_in")
      .withColumn("logger_to_ground",
        graft.functions.convertUnits("in", "m", col("logger_to_ground_in")))
  }

  /** HOBOware AWS export (melt_model.py:48 read_hobo_csv): title line
    * skipped, '#' column dropped, sensor columns renamed to canonical
    * names, consecutive solar sensors become Solar1/Solar2,
    * -888.88/-888.9 sentinel nulls.
    */
  def readHobo(spark: SparkSession, path: String): DataFrame = {
    val raw = csvSkippingRows(spark, path, Set(0L), "-888.88",
      extraNaTokens = Set("-888.9"))
    val newNames = Seq("RH", "Gust", "Wind Speed", "Wind Direction",
      "DewPt", "Abs Pres", "Rain", "Temp")
    var solarCount = 1
    val renames = raw.columns.map { label =>
      val base = newNames.find(label.contains).getOrElse(label)
      val renamed =
        if (label.contains("Solar")) {
          val n = s"Solar$solarCount"; solarCount += 1; n
        } else base
      label -> renamed
    }.toMap
    val dropped = raw.drop("#")
    dropped.columns.foldLeft(dropped)((d, c) =>
      d.withColumnRenamed(c, renames.getOrElse(c, c)))
  }
}
