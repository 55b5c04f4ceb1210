package graft

import org.apache.spark.sql.functions._
import graft.queries.RelationalQueries
import graft.tables.Tables

/** Accuracy contract for the sketch aggregates behind q_approx: the
  * raw sketch estimates are implementation-defined, so the guarantee
  * that matters — tracking the exact aggregates within tolerance — is
  * pinned here on the raw estimates, and the query's hash-oracled
  * accuracy-certificate flags (r10) must all hold.
  */
class RelationalSketchSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("raw sketches track the exact aggregates within tolerance") {
    val approx = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_orderkey")).as("nd_orders"),
        approx_count_distinct(col("l_partkey")).as("nd_parts"),
        expr("approx_percentile(l_extendedprice, array(0.25, 0.5, 0.75), 1000)")
          .as("_q"))
      .select(col("l_returnflag"), col("nd_orders"), col("nd_parts"),
        col("_q")(0).as("p25"), col("_q")(1).as("p50"), col("_q")(2).as("p75"))
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("nd_orders"),
        countDistinct(col("l_partkey")).as("nd_parts"),
        expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("q"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet === exact.keySet && approx.nonEmpty)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      // HLL++ default relative standard deviation is 5%; allow 2 sigma
      Seq("nd_orders", "nd_parts").foreach { c =>
        val ev = e.getAs[Long](c).toDouble
        assert(math.abs(a.getAs[Long](c) - ev) <= math.max(2.0, ev * 0.10),
          s"$k.$c: ${a.getAs[Long](c)} vs $ev")
      }
      // approx_percentile(accuracy=1000): rank error <= n/1000; on this
      // price distribution that is well within 5% of the exact value
      val eq = e.getSeq[Double](3)
      Seq("p25" -> eq(0), "p50" -> eq(1), "p75" -> eq(2)).foreach {
        case (c, ev) =>
          assert(math.abs(a.getAs[Double](c) - ev) <= math.abs(ev) * 0.05,
            s"$k.$c: ${a.getAs[Double](c)} vs $ev")
      }
    }
  }

  test("q_approx_sketch estimates agree with the exact twins (the bench-split entry)") {
    val est = RelationalQueries.qApproxSketch(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = RelationalQueries.qApprox(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(est.keySet === exact.keySet && est.nonEmpty)
    est.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a.getAs[Long]("est_nd_orders").toDouble /
        e.getAs[Long]("nd_orders") - 1.0) <= 0.1, s"$k nd_orders")
      assert(math.abs(a.getAs[Long]("est_nd_parts").toDouble /
        e.getAs[Long]("nd_parts") - 1.0) <= 0.1, s"$k nd_parts")
    }
  }

  test("q_approx accuracy-certificate flags all hold") {
    val rows = RelationalQueries.qApprox(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("est_orders_ok", "est_parts_ok", "p25_ok", "p50_ok", "p75_ok")
        .foreach { c =>
          assert(r.getAs[Boolean](c), s"${r.getString(0)}.$c is false")
        }
    }
  }
}
