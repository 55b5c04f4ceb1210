package graft

import org.apache.spark.sql.functions._
import graft.operators.Diurnal

class DiurnalSpec extends SparkSpec {
  import spark.implicits._

  private def series(rows: (String, String, Double)*) =
    rows.toDF("k", "t", "v").select(col("k"),
      col("t").cast("timestamp").as("t"), col("v"))

  test("extrema picks per-day min/max with first-occurrence tie-break (pandas idxmin/idxmax)") {
    val df = series(
      ("a", "2024-01-01 03:00:00", 5.0),
      ("a", "2024-01-01 06:00:00", 1.0), // first occurrence of min
      ("a", "2024-01-01 09:00:00", 1.0), // tied min, later -> ignored
      ("a", "2024-01-01 15:00:00", 9.0))
    val out = Diurnal.extrema(df, Seq("k"), "t", "v").collect().head
    assert(out.getAs[Double]("min_val") === 1.0)
    assert(out.getAs[java.sql.Timestamp]("min_time") === ts("2024-01-01 06:00:00"))
    assert(out.getAs[Double]("max_val") === 9.0)
    assert(out.getAs[java.sql.Timestamp]("max_time") === ts("2024-01-01 15:00:00"))
  }

  test("extremaMinFirst searches the max in the 18h window after the min, crossing midnight") {
    val df = series(
      ("a", "2024-01-01 02:00:00", 8.0), // day1 plain max — but before min
      ("a", "2024-01-01 20:00:00", 1.0), // day1 min at 20:00
      ("a", "2024-01-02 10:00:00", 9.0), // 14h after min: inside 18h window
      ("a", "2024-01-02 20:00:00", 2.0)) // day2 min
    val out = Diurnal.extremaMinFirst(df, Seq("k"), "t", "v")
      .orderBy("day").collect()
    // day1: max picked across midnight at 09:00 next day, not the 02:00 peak
    assert(out(0).getAs[Double]("min_val") === 1.0)
    assert(out(0).getAs[Double]("max_val") === 9.0)
    assert(out(0).getAs[java.sql.Timestamp]("max_time") === ts("2024-01-02 10:00:00"))
    // day2: window [20:00, +18h) only contains the min itself
    assert(out(1).getAs[Double]("max_val") === 2.0)
  }

  test("boundary-checked extrema reject picks that are window artifacts") {
    val df = series(
      ("a", "2024-01-01 23:00:00", 0.5), // day1's only obs, lower than day2's "min"
      ("a", "2024-01-02 00:30:00", 1.0), // day2 min, but on its first obs
      ("a", "2024-01-02 12:00:00", 5.0),
      ("a", "2024-01-02 18:00:00", 3.0))
    val out = Diurnal.extremaBoundaryChecked(df, Seq("k"), "t", "v")
      .orderBy("day").collect()
    // day1: single obs is both extrema; it IS the neighborhood min -> min
    // kept; it is not the neighborhood max (5.0 nearby) -> max rejected
    assert(out(0).getAs[java.lang.Double]("min_val") === 0.5)
    assert(out(0).getAs[java.lang.Double]("max_val") === null)
    // day2: min sits on the day's first obs and the neighborhood has a
    // lower value across midnight -> artifact, rejected
    assert(out(1).getAs[java.lang.Double]("min_val") === null)
    // day2 max is interior -> kept
    assert(out(1).getAs[java.lang.Double]("max_val") === 5.0)
  }

  test("applyThreshold drops days with amplitude below threshold") {
    val df = series(
      ("a", "2024-01-01 01:00:00", 1.0), ("a", "2024-01-01 12:00:00", 9.0), // amp 8
      ("a", "2024-01-02 01:00:00", 4.0), ("a", "2024-01-02 12:00:00", 5.0)) // amp 1
    val ext = Diurnal.extrema(df, Seq("k"), "t", "v")
    assert(Diurnal.applyThreshold(ext, 5.0).count() === 1)
  }
}
