package graft

import org.apache.spark.sql.functions._

/** ScaleGen contracts: the scale-stress results in SCALING.md are only
  * meaningful if the generated data really is a faithful stand-in for
  * the driver's testdata — same schemas, deterministic, and (in skew
  * mode) actually adversarial.
  */
class ScaleGenSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("scalegen").toString

  test("generated tables match the driver testdata schemas exactly") {
    val gen = Map(
      "region" -> ScaleGen.region(spark),
      "nation" -> ScaleGen.nation(spark),
      "supplier" -> ScaleGen.supplier(spark, 10),
      "customer" -> ScaleGen.customer(spark, 10),
      "part" -> ScaleGen.part(spark, 10),
      "orders" -> ScaleGen.orders(spark, 10, 10),
      "lineitem" -> ScaleGen.lineitem(spark, 10, 10, 10, 10),
      "events" -> ScaleGen.events(spark, 10, 5, skew = false),
      "documents" -> ScaleGen.documents(spark, 10, skew = false),
      "embeddings" -> ScaleGen.embeddings(spark, 10))
    for ((name, df) <- gen) {
      val ref = spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")
      val got = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      val want = ref.schema.fields.map(f => (f.name, f.dataType)).toSeq
      assert(got == want, s"$name schema drift: got $got want $want")
    }
  }

  test("generation is deterministic and partition-independent") {
    val a = ScaleGen.documents(spark, 200, skew = false)
      .orderBy("doc_id").collect().toSeq
    val b = ScaleGen.documents(spark, 200, skew = false)
      .repartition(7) // different physical parallelism, same values
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    val e = ScaleGen.events(spark, 200, 30, skew = false)
      .agg(sum(hash(col("ts"), col("user_id"), col("value"))))
      .head.getLong(0)
    val e2 = ScaleGen.events(spark, 200, 30, skew = false)
      .repartition(5)
      .agg(sum(hash(col("ts"), col("user_id"), col("value"))))
      .head.getLong(0)
    assert(e == e2)
  }

  test("uniform documents mirror driver stats: vocab, lengths, langs, dup plants") {
    val docs = ScaleGen.documents(spark, 5000, skew = false).cache()
    try {
      val toks = docs.select(explode(split(col("text"), " ")).as("w"))
      assert(toks.select(countDistinct("w")).head.getLong(0) == 31L)
      val lens = docs.select(size(split(col("text"), " ")).as("n"))
        .agg(min("n"), max("n"), avg("n")).head
      assert(lens.getInt(0) >= 10 && lens.getInt(1) <= 99)
      assert(math.abs(lens.getDouble(2) - 54.5) < 2.0)
      val en = docs.filter(col("lang") === "en").count().toDouble / 5000
      assert(math.abs(en - 0.456) < 0.04)
      // planted exact dups at the observed sf0.1 rate (~0.16%)
      val dups = 5000L - docs.select(countDistinct("text")).head.getLong(0)
      assert(dups >= 2 && dups <= 25, s"planted dup count off: $dups")
      // n_chars is the real text length (the driver invariant)
      assert(docs.filter(length(col("text")) =!= col("n_chars")).count() == 0)
    } finally docs.unpersist()
  }

  test("skew fixture is genuinely adversarial: hot user, hot source, boilerplate, giant near-dup cluster") {
    val ev = ScaleGen.events(spark, 10000, 1500, skew = true)
    val hotUser = ev.filter(col("user_id") === 0).count().toDouble / 10000
    assert(math.abs(hotUser - 0.30) < 0.03, s"hot user share $hotUser")

    val docs = ScaleGen.documents(spark, 2000, skew = true).cache()
    try {
      val hotSrc = docs.filter(col("source") === "src0").count().toDouble / 2000
      assert(math.abs(hotSrc - 0.30 - 0.70 / 20) < 0.04, s"hot source share $hotSrc")
      val boiler = docs.filter(col("text").contains("the slow query waits"))
        .count().toDouble / 2000
      assert(math.abs(boiler - 0.60) < 0.04, s"boilerplate share $boiler")
      // the near-dup cluster: ≥7% of docs share ≥60% token-set Jaccard
      // with doc 0 (10% planted at ~5% mutation, minus chance overlap)
      val doc0 = docs.filter(col("doc_id") === 0)
        .select(split(col("text"), " ")).head.getSeq[String](0).toSet
      val simCount = docs
        .select(col("doc_id"), split(col("text"), " ").as("w")).collect()
        .count { r =>
          val s = r.getSeq[String](1).toSet
          val j = (s & doc0).size.toDouble / (s | doc0).size
          r.getLong(0) != 0L && j >= 0.6
        }
      assert(simCount >= 0.07 * 2000,
        s"near-dup cluster too small: $simCount of 2000")
    } finally docs.unpersist()
  }

  test("uniform events mirror driver stats: 30-day span, exp values, uniform users") {
    val ev = ScaleGen.events(spark, 10000, 150, skew = false).cache()
    try {
      val r = ev.agg(min("ts"), max("ts"), avg("value"), stddev("value"),
        countDistinct("user_id")).head
      assert(r.getTimestamp(0).toString.startsWith("2024-01-01"))
      assert(r.getTimestamp(1).toString.startsWith("2024-01-30"))
      assert(math.abs(r.getDouble(2) - 49.6) < 3.0) // exp mean
      assert(math.abs(r.getDouble(3) - 49.6) < 5.0) // exp: mean == sd
      assert(r.getLong(4) == 150L)
    } finally ev.unpersist()
  }

  test("embeddings are unit-norm with 10 separable clusters") {
    val emb = ScaleGen.embeddings(spark, 500).cache()
    try {
      val norms = emb.select(
        sqrt(aggregate(col("embedding"), lit(0.0d),
          (a, x) => a + x.cast("double") * x.cast("double"))).as("n"))
        .agg(min("n"), max("n")).head
      assert(math.abs(norms.getDouble(0) - 1.0) < 1e-5)
      assert(math.abs(norms.getDouble(1) - 1.0) < 1e-5)
      assert(emb.select(countDistinct("label")).head.getLong(0) == 10L)
      // separable: same-label mean cosine far above cross-label. One
      // centroid estimate per label, then compare its self-cosine vs
      // the max cross cosine.
      val cents = emb.groupBy("label")
        .agg(array((0 until 64).map(i =>
          avg(element_at(col("embedding"), i + 1))): _*).as("c"))
        .collect().map(r => r.getInt(0) ->
          r.getSeq[Double](1).toArray).toMap
      def cos(a: Array[Double], b: Array[Double]) = {
        val d = a.zip(b).map { case (x, y) => x * y }.sum
        d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
      }
      val cross = for (i <- 0 to 9; j <- 0 to 9 if i != j)
        yield cos(cents(i), cents(j))
      assert(cross.max < 0.5, s"clusters not separable: ${cross.max}")
    } finally emb.unpersist()
  }
}
