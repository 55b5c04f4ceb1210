package graft

import org.apache.spark.sql.functions._
import graft.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("convertUnits applies the reference factor table incl. derived reverses") {
    val df = Seq(100.0).toDF("v")
    val r = df.select(
      convertUnits("mbar", "mH2O", col("v")).as("a"),
      convertUnits("mH2O", "mbar", col("v")).as("b"),
      convertUnits("ft", "m", col("v")).as("c"),
      convertUnits("in", "mm", col("v")).as("d")).head
    assert(r.getDouble(0) === 100.0 * 0.0102)
    assert(r.getDouble(1) === 100.0 * (1.0 / 0.0102))
    assert(r.getDouble(2) === 100.0 * 0.3048)
    assert(r.getDouble(3) === 100.0 * 25.4)
    // unknown pairs fail at plan-build time like the reference's ValueError
    assertThrows[IllegalArgumentException](convertUnits("mbar", "m", col("v")))
  }

  test("quadrature of zero args is 0 (reference running total)") {
    assert(Seq(1).toDF("x").select(quadrature().as("q")).head.getDouble(0) === 0.0)
    assert(Seq(1).toDF("x")
      .select(quadrature(lit(3.0), lit(4.0)).as("q")).head.getDouble(0) === 5.0)
  }

  test("decimalDoy: noon Jan 2 is 2.5") {
    val df = Seq("2024-01-02 12:00:00").toDF("t")
      .select(decimalDoy(col("t").cast("timestamp")).as("doy"))
    assert(df.head.getDouble(0) === 2.5)
  }

  test("meltEqu: melts only above threshold, null factors propagate") {
    val df = Seq(
      (5.0, Some(0.7), 400.0),   // melting
      (-5.0, Some(0.7), 400.0),  // frozen -> 0
      (5.0, None, 400.0)         // albedo missing -> null (caller coalesces)
    ).toDF("t", "a", "g")
    val out = df.select(meltEqu(col("t"), col("a"), col("g")).as("m"))
      .collect().map(r => Option(r.getAs[java.lang.Double]("m")))
    assert(out(0).get === 0.05 * 5.0 + 0.0094 * (1.0 - 0.7) * 400.0)
    assert(out(1).get === 0.0)
    assert(out(2).isEmpty)
  }

  test("wlb2fob/gwl2fob use the 917/1000 density ratio") {
    val r = Seq(230.6255).toDF("w")
      .select(wlb2fob(col("w"), lit(503.0)).as("f")).head.getDouble(0)
    assert(math.abs(r - 0.5) < 1e-9) // 0.917*503/2 = 230.6255
  }

  test("maslToPctOverburden and continuousAlbedo behave per reference") {
    val r = Seq((100.0, 200.0, 0.0)).toDF("w", "f", "b")
      .select(maslToPctOverburden(col("w"), col("f"), col("b")).as("p"))
      .head.getDouble(0)
    assert(r === 0.5)

    val aws = Seq(
      ("a", "2024-01-01 10:00:00", 100.0, 60.0),  // albedo 0.6
      ("a", "2024-01-01 11:00:00", 100.0, 260.0), // smoothed 160/100 >= 1 -> ffill
      ("a", "2024-01-01 13:30:00", 200.0, 100.0)) // own window only: 0.5
      .toDF("k", "t", "inc", "refl")
      .select(col("k"), col("t").cast("timestamp").as("t"), col("inc"), col("refl"))
    val alb = graft.operators.Melt.continuousAlbedo(aws, Seq("k"), "t", "inc", "refl")
      .orderBy("t").collect().map(_.getAs[Double]("albedo"))
    assert(alb.toSeq === Seq(0.6, 0.6, 0.5))
  }

  test("cosineSimilarity yields null for zero-norm vectors") {
    val df = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(df.select(cosineSimilarity(col("a"), col("b"))).head.isNullAt(0))
  }

  test("cosineSimilarity/dotProduct yield null on length-mismatched vectors") {
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    val r = df.select(cosineSimilarity(col("a"), col("b")),
      dotProduct(col("a"), col("b"))).head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("small time utilities match the reference's second-resolution math") {
    val df = Seq("2024-03-05 13:45:30.750").toDF("t")
      .select(col("t").cast("timestamp").as("t"))
    val r = df.select(
      endOfDay(col("t")).as("eod"),
      timestampToDecimalHours(col("t")).as("dh"),
      hoursBetween(col("t"), lit("2024-03-05 10:00:00").cast("timestamp")).as("hb"))
      .head
    assert(r.getAs[java.sql.Timestamp]("eod") === ts("2024-03-05 23:59:59"))
    // 13h + (45*60+30)/3600 — the .750 sub-second is dropped (reference)
    assert(math.abs(r.getAs[Double]("dh") - (13 + 2730.0 / 3600)) < 1e-12)
    // 3h45m30s (whole seconds) = 3.7583…h
    assert(math.abs(r.getAs[Double]("hb") - 13530.0 / 3600) < 1e-12)
  }
}
