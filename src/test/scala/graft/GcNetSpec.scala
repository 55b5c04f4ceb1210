package graft

import java.nio.file.Files
import graft.sources.GcNet

class GcNetSpec extends SparkSpec {

  test("parses the header block and reads space-delimited GC-NET data") {
    val content =
      """Data Description File
        |1 Station Number
        |2 Year
        |3 Julian Decimal Time
        |4 Atm_Pressure [mbar]
        |5 Air Temp 1 [deg C]
        |6 Air Temp 2 [deg C]
        |
        |1 2017.0 152.500 890.2 -3.5 -4.5
        |1 2017.0 152.5417 999.0000 -2.0 -3.0
        |""".stripMargin
    val dir = Files.createTempDirectory("gcnet").toFile
    val f = new java.io.File(dir, "jar1.dat")
    Files.writeString(f.toPath, content)
    val df = GcNet.read(spark, f.getAbsolutePath)
    assert(df.columns.contains("Atm_Pressure"))
    assert(df.columns.contains("avg_air_temp"))
    val rows = df.orderBy("ts").collect()
    assert(rows.length === 2)
    // julian decimal day 152.5 of 2017 = Jun 1 12:00 (day 1 = Jan 1)
    assert(rows(0).getAs[java.sql.Timestamp]("ts") === ts("2017-06-01 12:00:00"))
    // 999.0000 sentinel -> null
    assert(rows(1).isNullAt(rows(1).fieldIndex("Atm_Pressure")))
    assert(rows(0).getAs[Double]("avg_air_temp") === -4.0)
  }

  test("999.0 sentinel is nulled at the token level, and readJar1 narrows columns") {
    val content =
      """Data Description File
        |1 Station Number
        |2 Year
        |3 Julian Decimal Time
        |4 Atm_Pressure [mbar]
        |5 Air Temp 1 [deg C]
        |6 Air Temp 2 [deg C]
        |7 SW_down [W/m2]
        |8 Battery Voltage [V]
        |
        |1 2017.0 152.500 890.2 -3.5 -4.5 210.0 12.4
        |1 2017.0 152.5417 999.0 -2.0 999.0 215.0 12.3
        |""".stripMargin
    val dir = Files.createTempDirectory("gcnet2").toFile
    val f = new java.io.File(dir, "jar1.dat")
    Files.writeString(f.toPath, content)
    val df = GcNet.read(spark, f.getAbsolutePath)
    val rows = df.orderBy("ts").collect()
    // the short-form sentinel must null out too: a post-parse string
    // replace left these as real 999.0 doubles (ADVICE r2), corrupting
    // avg_air_temp downstream
    assert(rows(1).isNullAt(rows(1).fieldIndex("Atm_Pressure")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("avg_air_temp"))) // null propagates
    val jar1 = GcNet.readJar1(spark, f.getAbsolutePath)
    assert(jar1.columns.toSet === Set("ts", "avg_air_temp", "SW_down", "Atm_Pressure"))
  }
}
