package graft

import org.apache.spark.sql.functions._
import graft.mix.Mix
import graft.operators.Funnel
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Semantic contracts of the late-r7 curation/analytics operators:
  * ordered funnel, stratified hash sample, JL random projection, and
  * the bigram LM score. (Their cross-engine numerics are pinned by the
  * DuckDB oracles; these tests pin the SEMANTICS on crafted fixtures.)
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- orderedFunnel ------------------------------------------------

  private def funnelEvents = Seq(
    // user 1 completes all three steps in order
    (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "purchase"),
    // user 2: click BEFORE view — view counts, click/purchase do not
    (2L, 10L, 4L, "click"), (2L, 20L, 5L, "view"), (2L, 30L, 6L, "purchase"),
    // user 3: view and click SIMULTANEOUS — strictly-after fails
    (3L, 10L, 7L, "view"), (3L, 10L, 8L, "click"), (3L, 20L, 9L, "purchase"),
    // user 4: view only
    (4L, 10L, 10L, "view"),
    // user 5: no view at all — contributes to no step
    (5L, 10L, 11L, "purchase")
  ).toDF("user_id", "ts", "event_id", "event_type")

  test("orderedFunnel: strictly-ordered step completion per user") {
    val out = Funnel.orderedFunnel(funnelEvents, "user_id", "ts",
        "event_id", "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("step") ->
        (r.getAs[String]("event_type"), r.getAs[Long]("users"))).toMap
    assert(out(1L) === ("view", 4L))     // users 1-4
    assert(out(2L) === ("click", 1L))    // only user 1 clicks after viewing
    assert(out(3L) === ("purchase", 1L)) // only user 1
  }

  test("orderedFunnel: conversion ratios chain off the previous step; empty prev is null") {
    val rows = Funnel.orderedFunnel(funnelEvents, "user_id", "ts",
        "event_id", "event_type", Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Long]("step") -> r).toMap
    assert(rows(1L).getAs[Double]("conv_prev") === 1.0)
    assert(rows(2L).getAs[Double]("conv_prev") === 0.25)
    assert(rows(3L).getAs[Double]("conv_prev") === 1.0)
    // a funnel whose first step never fires: later conv_prev is null
    val none = Funnel.orderedFunnel(funnelEvents, "user_id", "ts",
        "event_id", "event_type", Seq("signup", "purchase"))
      .collect().map(r => r.getAs[Long]("step") -> r).toMap
    assert(none(1L).getAs[Long]("users") === 0L)
    assert(none(2L).isNullAt(none(2L).fieldIndex("conv_prev")))
  }

  test("orderedFunnel is invariant under input partitioning") {
    val a = Funnel.orderedFunnel(funnelEvents, "user_id", "ts",
      "event_id", "event_type", Seq("view", "click", "purchase")).collect().toSet
    val b = Funnel.orderedFunnel(funnelEvents.repartition(7), "user_id", "ts",
      "event_id", "event_type", Seq("view", "click", "purchase")).collect().toSet
    assert(a === b)
  }

  // ---- stratifiedHashSample ----------------------------------------

  /** Plain-Scala twin of [[Mix.hashU32]] for golden membership checks. */
  private def hashU32Ref(id: Long): Long = {
    val m32 = 4294967296L
    val idn = ((id % m32) + m32) % m32
    val hi = idn >> 16
    val lo = idn & 65535L
    ((hi * 2654435761L % 65536L) * 65536L + lo * 2654435761L) % m32
  }

  test("stratifiedHashSample: exactly min(k, group size) rows per group, hash-order membership") {
    val df = (1L to 100L).map(i => (s"g${i % 3}", i)).toDF("source", "doc_id")
      .union(Seq(("tiny", 999L)).toDF("source", "doc_id"))
    val out = Mix.stratifiedHashSample(df, "source", "doc_id", k = 5)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("sample_rank")))
    val byGroup = out.groupBy(_._1)
    assert(byGroup("g0").length === 5 && byGroup("g1").length === 5 &&
      byGroup("g2").length === 5)
    assert(byGroup("tiny").length === 1) // undersized group keeps all
    // golden check: membership is the k smallest (hash, id) per group
    val expected = (1L to 100L).groupBy(i => s"g${i % 3}").map { case (g, ids) =>
      g -> ids.sortBy(i => (hashU32Ref(i), i)).take(5).toSet
    }
    byGroup.filterKeys(_ != "tiny").foreach { case (g, rows) =>
      assert(rows.map(_._2).toSet === expected(g), s"membership drift in $g")
      // and sample_rank is the 1-based position in that hash order
      val ranked = (1L to 100L).filter(i => s"g${i % 3}" == g)
        .sortBy(i => (hashU32Ref(i), i)).take(5).zipWithIndex
        .map { case (id, ix) => (id, ix + 1L) }.toSet
      assert(rows.map(r => (r._2, r._3)).toSet === ranked)
    }
  }

  test("stratifiedHashSample is invariant under input partitioning") {
    val df = (1L to 100L).map(i => (s"g${i % 3}", i)).toDF("source", "doc_id")
    val a = Mix.stratifiedHashSample(df, "source", "doc_id", 5).collect().toSet
    val b = Mix.stratifiedHashSample(df.repartition(11), "source", "doc_id", 5)
      .collect().toSet
    assert(a === b)
  }

  // ---- randomProject -----------------------------------------------

  /** Plain-Scala twin of [[Mix.hashMix32]]. */
  private def hashMix32Ref(key: Long): Long = {
    val m32 = 4294967296L
    val k0 = ((key % m32) + m32) % m32
    val s1 = ((k0 ^ (k0 >> 16)) * 73244475L) % m32
    val s2 = ((s1 ^ (s1 >> 16)) * 73244475L) % m32
    s2 ^ (s2 >> 16)
  }

  test("hashMix32 column matches the plain-Scala twin across the key domain") {
    val keys = Seq(0L, 1L, 2L, 65535L, 65536L, 2147483647L, 2147483648L,
      4294967295L, 4294967296L, -1L, -4294967297L, Long.MaxValue, Long.MinValue)
    val out = keys.toDF("k")
      .select(col("k"), Mix.hashMix32(col("k")).as("h"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("h")).toMap
    keys.foreach { k =>
      // the Scala twin normalizes with the same pmod, so compare via it
      assert(out(k) === hashMix32Ref(k), s"hashMix32 drift at key $k")
    }
  }

  test("randomProject matches a plain-Scala fold of the derived sign matrix bit-for-bit") {
    val outDim = 4
    val seed = 42L
    val vecs = Seq((1L, Array(1.0f, 2.5f, -3.25f, 0.0f, 7.125f)),
      (2L, Array(-0.5f, 0.0f, 0.0f, 1.0f, -1.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.randomProject(df, "vec_id", "embedding", 5, outDim, seed)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Double]]("proj")).toMap
    vecs.foreach { case (id, v) =>
      val expected = (0 until outDim).map { j =>
        var acc = 0.0
        for (i <- v.indices) {
          val s = if (hashMix32Ref(i.toLong * outDim + j + seed) < 2147483648L)
            1.0 else -1.0
          acc += v(i).toDouble * s
        }
        acc * (1.0 / math.sqrt(outDim.toDouble))
      }
      assert(out(id) === expected, s"projection drift for vec $id")
    }
  }

  test("randomProject: different seeds give different projections; JL preserves norm roughly") {
    val dim = 64
    val vecs = (1L to 50L).map(i =>
      (i, Array.tabulate(dim)(d => (((i * 31 + d * 7) % 13) - 6).toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val p1 = Similarity.randomProject(df, "vec_id", "embedding", dim, 16, 1L)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Double]]("proj")).toMap
    val p2 = Similarity.randomProject(df, "vec_id", "embedding", dim, 16, 2L)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Double]]("proj")).toMap
    assert(p1(1L) !== p2(1L))
    // E[||proj||^2] = ||v||^2 for sign-JL; with 16 output dims the
    // aggregate ratio over 50 vectors concentrates near 1
    val ratios = vecs.map { case (id, v) =>
      val orig = v.map(x => x.toDouble * x).sum
      val proj = p1(id).map(x => x * x).sum
      proj / orig
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"norm-preservation ratio drifted: $mean")
  }

  test("randomProject: wrong-length vectors project to nulls, not truncated dots") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.randomProject(df, "vec_id", "embedding", 3, 2, 0L)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[java.lang.Double]]("proj")).toMap
    assert(out(1L).forall(_ != null))
    assert(out(2L).forall(_ == null))
  }

  // ---- lmScore ------------------------------------------------------

  test("lmScore: repeated-gram docs score better than rare-gram docs; ppl = exp(avg_nll)") {
    val common = Seq.fill(20)("the cat sat").mkString(" ")
    val docs = Seq(
      (1L, common),          // made of the corpus's dominant bigrams
      (2L, common),
      (3L, "zyx wvu tsr qpo nml") // every bigram unique in the corpus
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Double]("avg_nll") < out(3L).getAs[Double]("avg_nll"))
    assert(out(1L).getAs[Double]("ppl") < out(3L).getAs[Double]("ppl"))
    // n_bigrams = token count - 1
    assert(out(3L).getAs[Long]("n_bigrams") === 4L)
    // ppl is exactly exp(avg_nll) (same sum, same two float ops)
    out.values.foreach { r =>
      assert(r.getAs[Double]("ppl") === math.exp(r.getAs[Double]("avg_nll")))
    }
  }

  test("lmScore: docs without bigrams are absent, not zero-scored") {
    val docs = Seq((1L, "two tokens"), (2L, "single"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val ids = TextAnalysis.lmScore(docs, "doc_id", "text")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids === Set(1L))
  }

  // ---- dsirWeights --------------------------------------------------

  test("dsirWeights: docs made of target-like bigrams outscore off-target docs") {
    val targetish = "clean careful prose with structure and citations"
    val junk = "buy now click here free offer buy now click here"
    val docs = Seq(
      (1L, targetish), (2L, targetish),           // the curated target
      (3L, targetish + " plus a little more"),    // target-like raw doc
      (4L, junk), (5L, junk)                      // off-target raw docs
    ).toDF("doc_id", "text")
    val out = Mix.dsirWeights(docs, "doc_id", "text",
        isTarget = col("doc_id") <= 2, numBuckets = 256)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size === 5)
    // target-like raw doc strictly outscores the junk docs
    assert(out(3L).getAs[Double]("logw") > out(4L).getAs[Double]("logw"))
    // identical docs get identical weights (pure function of content)
    assert(out(4L).getAs[Double]("logw") === out(5L).getAs[Double]("logw"))
    // n_bigrams = token count - 1
    assert(out(3L).getAs[Long]("n_bigrams") === 10L)
  }

  test("dsirWeights: docs without bigrams are absent; weights don't depend on partitioning") {
    val docs = Seq((1L, "two tokens here"), (2L, "single"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val out = Mix.dsirWeights(docs, "doc_id", "text", col("doc_id") === 1L)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(out === Set(1L))
    // determinism under repartitioning: counts are exact integers and
    // the ratio table is keyed, so only float-sum order could differ —
    // and each doc's grams land in one group
    val big = Seq.tabulate(50)(i =>
      (i.toLong, s"word$i common text shared tail ${i % 5}"))
      .toDF("doc_id", "text")
    val w1 = Mix.dsirWeights(big, "doc_id", "text", col("doc_id") % 7 === 0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    val w2 = Mix.dsirWeights(big.repartition(13), "doc_id", "text",
        col("doc_id") % 7 === 0)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    assert(w1 === w2)
  }

  test("dsirResample: deterministic Gumbel-top-k, weight-dominant docs always selected") {
    val weights = Seq.tabulate(100)(i => (i.toLong, (i % 10).toDouble / 10.0))
      .toDF("doc_id", "logw")
      // doc 7 gets an overwhelming weight: e^50 times any other —
      // Gumbel noise (a few units) can never knock it out of the top
      .withColumn("logw", when(col("doc_id") === 7L, lit(50.0))
        .otherwise(col("logw")))
    val out = Mix.dsirResample(weights, "doc_id", "logw", k = 10).collect()
    assert(out.length === 10)
    assert(out.map(_.getAs[Long]("sample_rank")).sorted.toSeq === (1L to 10L))
    assert(out.exists(_.getAs[Long]("doc_id") === 7L))
    // ranks follow (score desc, id asc)
    val sorted = out.sortBy(_.getAs[Long]("sample_rank"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      val c = java.lang.Double.compare(a.getAs[Double]("score"),
        b.getAs[Double]("score"))
      assert(c > 0 || (c == 0 &&
        a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
    }
    // re-run + repartition select the SAME docs in the SAME order
    val again = Mix.dsirResample(weights.repartition(9), "doc_id", "logw", 10)
      .collect().sortBy(_.getAs[Long]("sample_rank"))
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(again === sorted.map(_.getAs[Long]("doc_id")).toSeq)
  }
}
