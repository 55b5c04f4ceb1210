package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("vectorDot matches the higher-order-function reference implementation") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.0, 0.0), Array(0.0, 0.0)),
      (Array(-1.5, 2.5), Array(3.0, -4.0))).toDF("a", "b")
    val rows = df.select(
      VectorExpressions.vectorDot(col("a"), col("b")).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("ref")).collect()
    rows.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("vectorMean matches the posexplode reference: nulls, ragged lengths, empty groups") {
    import org.apache.spark.sql.graft.VectorAggregates.vectorMean
    val df = Seq(
      ("a", Array[java.lang.Double](1.0, 2.0, 3.0)),
      ("a", Array[java.lang.Double](3.0, null, 5.0)),  // null element: dim 1 averages over 1 value
      ("a", Array[java.lang.Double](2.0)),             // ragged: dims 1-2 average over fewer vectors
      ("b", null.asInstanceOf[Array[java.lang.Double]]), // null vector: contributes nothing
      ("b", Array[java.lang.Double](7.0, 9.0)),
      ("c", null.asInstanceOf[Array[java.lang.Double]])  // group with no vectors -> null mean
    ).toDF("k", "v")
    val got = df.groupBy($"k").agg(vectorMean($"v").as("m"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[java.lang.Double](1))).toMap
    assert(got("a") === Seq(2.0, 2.0, 4.0)) // (1+3+2)/3, 2/1, (3+5)/2
    assert(got("b") === Seq(7.0, 9.0))
    assert(got("c") === null)
    // agreement with the posexplode + per-dimension avg pipeline on a
    // dense fixture (the shape this aggregate replaces)
    val dense = (1L to 50L).map(i =>
      (i % 3, Array(i.toDouble, i * 0.5, 100.0 - i))).toDF("k", "v")
    val viaAgg = dense.groupBy($"k").agg(vectorMean($"v").as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaExplode = dense
      .select($"k", posexplode($"v").as(Seq("d", "x")))
      .groupBy($"k", $"d").agg(avg($"x").as("m"))
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq).toMap
    viaAgg.foreach { case (k, m) =>
      m.zip(viaExplode(k)).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-12, s"k=$k") }
    }
  }

  test("char_entropy is callable from plain SQL via GraftExtensions") {
    val out = spark.sql("SELECT char_entropy('abcd') AS e").head.getDouble(0)
    assert(math.abs(out - 2.0) < 1e-12)
  }

  test("vector_mean is callable from plain SQL via GraftExtensions") {
    Seq((1L, Array(1.0, 3.0)), (1L, Array(3.0, 5.0)), (2L, Array(7.0, 7.0)))
      .toDF("k", "v").createOrReplaceTempView("vm_t")
    val got = spark.sql("SELECT k, vector_mean(v) AS m FROM vm_t GROUP BY k")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) === Seq(2.0, 4.0))
    assert(got(2L) === Seq(7.0, 7.0))
  }

  test("vectorDot implicit-casts float arrays and stays codegen (no fallback)") {
    val floats = Seq((1L, Array(1f, 2f), Array(3f, 4f))).toDF("id", "a", "b")
    assert(floats.select(VectorExpressions.vectorDot(col("a"), col("b")))
      .head.getDouble(0) === 11.0)
    // real scan input so constant folding can't collapse the projection:
    // the dot-product projection must sit inside a WholeStageCodegen span
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = emb.select(
      VectorExpressions.vectorDot(col("embedding"), col("embedding")).as("d"))
    val plan = out.queryExecution.executedPlan.toString
    val codegenSpan = plan.split("\n").exists(l =>
      l.contains("Project") && !l.contains("*(0)") && l.trim.startsWith("*"))
    assert(codegenSpan, s"projection not codegen'd:\n$plan")
    assert(out.collect().forall(!_.isNullAt(0)))
  }

  test("null input yields null, not a crash") {
    val df = Seq((Some(Array(1.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(df.select(VectorExpressions.vectorDot(col("a"), col("b"))).head.isNullAt(0))
  }

  test("vector_dot is callable from plain SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head
    assert(r.getDouble(0) === 11.0)
  }

  test("signature expressions are callable from plain SQL via GraftExtensions") {
    val sig = spark.sql(
      "SELECT minhash_signature('a b c d e', 3, 8) AS s").head.getSeq[Long](0)
    assert(sig.length === 8 && sig.forall(_ != Long.MaxValue))
    val bands = spark.sql(
      "SELECT simhash_bands('a b c') AS b").head.getSeq[Long](0)
    assert(bands.length === 4)
    val fp = spark.sql(
      "SELECT min_shingle_md5('a b c d e f', 5) AS f").head.getString(0)
    assert(fp.matches("[0-9a-f]{32}"))
    val sh = spark.sql(
      "SELECT shingle_hashes('a b c d', 3, true, true) AS h").head.getSeq[Long](0)
    assert(sh.length === 2) // "a b c", "b c d"
    val strict = spark.sql(
      "SELECT shingle_hashes('solo', 2, false, false) AS h").head.getSeq[Long](0)
    assert(strict.isEmpty)
  }

  test("vector_cosine: fused single pass matches composed form, null on zero norm") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0)),
      (Array(0.0, 0.0), Array(1.0, 1.0))).toDF("a", "b")
    val rows = df.select(
      VectorExpressions.vectorCosine(col("a"), col("b")).as("fused"),
      (VectorExpressions.vectorDot(col("a"), col("b")) /
        (sqrt(VectorExpressions.vectorDot(col("a"), col("a"))) *
          sqrt(VectorExpressions.vectorDot(col("b"), col("b"))))).as("ref")).collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(0).getDouble(0) === rows(0).getDouble(1))
    assert(rows(1).getDouble(0) === 0.0)
    assert(rows(2).isNullAt(0)) // fused: null; composed form would be NaN/null
    val sqlR = spark.sql(
      "SELECT vector_cosine(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c").head
    assert(math.abs(sqlR.getDouble(0) - 1.0) < 1e-12)
  }
}
