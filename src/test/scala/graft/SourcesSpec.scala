package graft

import java.nio.file.Files
import graft.sources.Sources

class SourcesSpec extends SparkSpec {

  private def tmpCsv(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-src").toFile
    val f = new java.io.File(dir, name)
    Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  test("readNeuGps: headerless schema'd CSV with '  nan' nulls, err_code dropped") {
    val p = tmpCsv("neu.csv",
      """2024-01-01 00:00:00,1.0,100.5,0.01,200.5,0.02,50.0,0.05,0
        |2024-01-01 00:00:30,1.00035,  nan,0.01,200.6,0.02,50.1,0.05,0
        |""".stripMargin)
    val df = Sources.readNeuGps(spark, p)
    assert(df.columns.toSeq === Seq("ts", "doy", "dnorth", "dnorth_err",
      "deast", "deast_err", "dheight", "dheight_err"))
    val rows = df.orderBy("ts").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Double]("dnorth") === 100.5)
    assert(rows(1).isNullAt(rows(1).fieldIndex("dnorth"))) // '  nan' -> null
  }

  test("readCr1000: TOA5 preamble + units rows skipped, NAN null, diagnostics dropped") {
    val p = tmpCsv("cr1000.csv",
      """"TOA5","station","CR1000","serial","os","prog","sig","table"
        |"TIMESTAMP","RECORD","WL705012","BattV"
        |"TS","RN","","Volts"
        |"","","Smp","Smp"
        |"2018-07-10 12:00:00",1,42.5,12.1
        |"2018-07-10 12:15:00",2,NAN,12.2
        |""".stripMargin)
    val df = Sources.readCr1000(spark, p)
    assert(df.columns.toSeq === Seq("ts", "WL705012"))
    val rows = df.orderBy("ts").collect()
    assert(rows(0).getAs[Double]("WL705012") === 42.5)
    assert(rows(1).isNullAt(1))
    assert(rows(0).getAs[java.sql.Timestamp]("ts") === ts("2018-07-10 12:00:00"))
  }

  test("readStr17 drops fully-null observation rows (reference dropna)") {
    val p = tmpCsv("str17.csv",
      """"TOA5","x","y","z","a","b","c","d"
        |"TIMESTAMP","RECORD","WL705012"
        |"TS","RN",""
        |"","","Smp"
        |"2018-07-10 12:00:00",1,42.5
        |"2018-07-10 12:15:00",2,NAN
        |""".stripMargin)
    assert(Sources.readStr17(spark, p).count() === 1)
  }

  test("Tables.events adapts to both ts schemas: nanos-as-long and native timestamp") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evschema").toString
    // legacy generation: ts stored as int64 nanoseconds (what the old
    // parquet surfaced under nanosAsLong) — 2024-01-05 00:00:00 UTC
    // plus i hours, nanos chosen sub-microsecond-dirty (…999 ns) so
    // the integer-division truncation contract is exercised
    val base = 1704412800L * 1000000000L
    val legacy = (0 until 48).map(i =>
      (i.toLong, base + i * 3600L * 1000000000L + 999L, i.toLong % 4,
        "click", i.toDouble, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    legacy.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val lv = graft.tables.Tables.events(spark, dir)
    assert(lv.schema("ts").dataType.typeName === "timestamp")
    val first = lv.orderBy("event_id").select(date_format(col("ts"),
      "yyyy-MM-dd HH:mm:ss.SSSSSS")).head.getString(0)
    assert(first === "2024-01-05 00:00:00.000000") // 999 ns truncated
    // clip pushdown on the raw long: [05 01:00, 05 03:00) keeps hours 1-2
    val clipped = graft.tables.Tables.eventsClipped(spark, dir,
      "2024-01-05 01:00:00", "2024-01-05 03:00:00")
    assert(clipped.select("event_id").collect().map(_.getLong(0)).sorted
      === Array(1L, 2L))
    // current generation: native timestamp column — same loader, no
    // conversion, same clip result
    val dir2 = java.nio.file.Files.createTempDirectory("evschema2").toString
    legacy.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val nv = graft.tables.Tables.events(spark, dir2)
    assert(nv.schema("ts").dataType.typeName === "timestamp")
    val c2 = graft.tables.Tables.eventsClipped(spark, dir2,
      "2024-01-05 01:00:00", "2024-01-05 03:00:00")
    assert(c2.select("event_id").collect().map(_.getLong(0)).sorted
      === Array(1L, 2L))
  }

  test("partitioned parquet write prunes by partition directory") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-sink").toString + "/out"
    val df = Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0),
      (3L, "2024-01-02", 3.0)).toDF("id", "day", "v")
    graft.sources.Sinks.writePartitioned(df, dir, Seq("day"))
    val back = spark.read.parquet(dir).filter(col("day") === "2024-01-02")
    assert(back.count() === 2)
    // partition pruning: the physical scan only lists the matching dir
    val scan = back.queryExecution.executedPlan.toString
    assert(new java.io.File(dir, "day=2024-01-01").exists())
    assert(scan.contains("PartitionFilters"))
  }

  test("ORC roundtrip preserves schema and pushes filters (interchange format coverage)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-orc").toString + "/out"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
      .toDF("id", "k", "v")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // names + types survive (the reader widens nullability, as parquet does)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    val filtered = back.filter(col("id") > 1L)
    assert(filtered.count() === 2)
    // predicate pushdown reaches the ORC scan like the parquet paths
    val scan = filtered.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(id"),
      s"no pushed filter in ORC scan:\n$scan")
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 3.0)).toDF("k", "vb")
    // the in-memory catalog forgets tables between JVMs but their
    // warehouse dirs survive: clear both before writing
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm)
        f.delete()
      }
      if (loc.exists()) rm(loc)
    }
    graft.sources.Sinks.writeBucketed(a, "bkt_a", Seq("k"), 4)
    graft.sources.Sinks.writeBucketed(b, "bkt_b", Seq("k"), 4)
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() === 1000)
  }

  test("lines-of-text source reads one row per line") {
    val p = tmpCsv("lines.txt", "alpha\nbeta\ngamma\n")
    assert(graft.sources.Sinks.readLines(spark, p).count() === 3)
  }

  test("readHobo: title row skipped, '#' dropped, sensors renamed, Solar1/Solar2") {
    val p = tmpCsv("hobo.csv",
      """Plot Title: station X
        |#,Date Time - GMT,Temp  C,Solar Radiation  W/m2,Solar Radiation 2  W/m2,RH %
        |1,2017-06-01 00:00:00,3.5,120.0,80.0,55.0
        |2,2017-06-01 01:00:00,-888.88,130.0,85.0,56.0
        |3,2017-06-01 02:00:00,-888.9,140.0,90.0,57.0
        |""".stripMargin)
    val df = Sources.readHobo(spark, p)
    assert(df.columns.contains("Temp"))
    assert(df.columns.contains("Solar1") && df.columns.contains("Solar2"))
    assert(df.columns.contains("RH"))
    assert(!df.columns.contains("#"))
    val rows = df.orderBy(df.columns(0)).collect()
    assert(rows(1).isNullAt(rows(1).fieldIndex("Temp"))) // -888.88 sentinel
    // -888.9 is nulled at the TOKEN level pre-parse: a post-parse string
    // replace would leave it as a real double (ADVICE r2)
    assert(rows(2).isNullAt(rows(2).fieldIndex("Temp")))
    assert(rows(2).getAs[Double]("Solar1") === 140.0)
  }

  test("readMoulin18: level to meters, stage/ablation rangers, diagnostics dropped") {
    val p = tmpCsv("moulin18.csv",
      """"TOA5","station","CR1000","serial","os","prog","sig","table"
        |"TIMESTAMP","RECORD","Lvl","Stage","Abl","BattV","Digits"
        |"TS","RN","ft","in","in","Volts",""
        |"","","Smp","Smp","Smp","Smp","Smp"
        |"2018-07-10 12:00:00",1,10.0,40.0,20.0,12.1,8815
        |"2018-07-10 12:15:00",2,NAN,50.0,25.0,12.2,8816
        |""".stripMargin)
    val df = Sources.readMoulin18(spark, p)
    assert(!df.columns.contains("BattV") && !df.columns.contains("Digits"))
    assert(df.columns.contains("submerged_depth_ft")) // Lvl renamed
    val r = df.orderBy("ts").collect()
    assert(math.abs(r(0).getAs[Double]("submerged_depth") - (-(10.0 * 0.3048))) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("logger_to_stream") - 40.0 * 0.0254) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("stage") - (4.0 - 40.0 * 0.0254)) < 1e-12)
    assert(math.abs(r(0).getAs[Double]("logger_to_ground") - 20.0 * 0.0254) < 1e-12)
    // allData keeps the diagnostics
    assert(Sources.readMoulin18(spark, p, allData = true).columns.contains("BattV"))
  }

  test("Stations + BaseStn metadata plumbing matches the reference") {
    import graft.api.{BaseStn, Stations}
    // longitude normalization: >180 wraps to negative (gpstools.py:129)
    val stn = BaseStn("rock",
      sitePos = (1412215.2584, -1711212.5767, 5960386.7316),
      geodPos = (69.708219352, 309.531891746, 594.5942))
    assert(math.abs(stn.long - (-(360 - 309.531891746))) < 1e-12)
    assert(math.abs(stn.elevation(27.1274) - (594.5942 - 27.1274)) < 1e-12)
    assert(stn.geoidHeight(Map("ROCK" -> 27.1274)) === Some(27.1274))
    // file-name station ID + deployment name table
    assert(Stations.stationName("/data/usf1_18_neu.txt",
      Map("USF1" -> "LMID")) === ("USF1", "LMID"))
    assert(Stations.stationName("/data/xxxx_18.txt",
      Map("USF1" -> "LMID")) === ("XXXX", "ukwn"))
    assert(Stations.stationName("/data/usf1_18.txt") === ("USF1", "USF1"))
    // component labels and duration helpers
    assert(Stations.componentLabels("nxt") === Seq("dnorth", "xflow", "xtran"))
    assertThrows[IllegalArgumentException](Stations.componentLabels("q"))
    assert(Stations.samplesInTimespan("2H", 30.0) === 240L)
    assert(math.abs(Stations.pctDay("6H") - 0.25) < 1e-12)
    // pandas .seconds is within-day: 25h -> 1h (kept bug-for-bug)
    assert(math.abs(Stations.pctDay("25H") - (3600.0 / 86400.0)) < 1e-12)
  }
}
