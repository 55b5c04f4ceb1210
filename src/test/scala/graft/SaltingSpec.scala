package graft

import org.apache.spark.sql.functions._
import graft.operators.Salting

class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("saltedAgg equals direct groupBy for algebraic aggregates") {
    val df = (1 to 1000).map(i => (s"k${i % 3}", i.toLong, i * 0.5)).toDF("k", "id", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count("v").as("n"), min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Salting.saltedAgg(df, Seq("k"), "id", 8, Seq(
        ("s", "v", "sum"), ("n", "v", "count"), ("mn", "v", "min"), ("mx", "v", "max")))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (s, n, mn, mx)) =>
      val (ds, dn, dmn, dmx) = direct(k)
      assert(math.abs(s - ds) < 1e-6 && n == dn && mn == dmn && mx == dmx)
    }
  }

  test("saltedJoinSmall equals plain join and splits hot keys across salts") {
    val fact = (1 to 500).map(i => (s"hot", i.toLong)).toDF("k", "id")
    val dim = Seq(("hot", "HOT")).toDF("k", "label")
    val out = Salting.saltedJoinSmall(fact, dim, "k", "id", 4)
    assert(out.count() === 500)
    assert(out.columns.toSeq === Seq("k", "id", "label"))
  }
}
