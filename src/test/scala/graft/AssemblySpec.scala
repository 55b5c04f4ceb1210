package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.mix.Mix
import graft.text.TextAnalysis

/** End-to-end dataset assembly over real test parquet: the full
  * curation chain a training-data pipeline runs, each stage feeding
  * the next — quality gate → exact dedup keep-one → eval-set
  * decontamination → reproducible sample → token budget → packing —
  * with the funnel accounting cross-checked against the actual stage
  * outputs. The point is INTEGRATION: every operator is spec'd alone
  * elsewhere; this pins that they compose (schemas line up, counts
  * flow monotonically, the final packing is dense).
  */
class AssemblySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("gate -> dedup -> decontam -> sample -> budget -> pack composes over real data") {
    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val total = docs.count()
    assert(total > 0)

    // 1. quality gate (row-local filters)
    val gated = docs
      .withColumn("n_tokens", TextAnalysis.wsTokenCount(col("text")).cast("long"))
      .filter(col("n_tokens") >= 5 && TextAnalysis.digitRatio(col("text")) <= 0.5)
    val nGated = gated.count()
    assert(nGated <= total && nGated > 0)

    // 2. exact dedup keep-one (smallest id per content)
    val keepIds = Dedup.exact(gated, "doc_id", "text").select(col("keep_id"))
    val deduped = gated.join(keepIds,
      gated("doc_id") === keepIds("keep_id"), "left_semi")
    val nDeduped = deduped.count()
    assert(nDeduped <= nGated && nDeduped > 0)

    // 3. decontamination against a benchmark slice
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val contaminated = Dedup.contaminatedIds(deduped, "doc_id", "text",
      bench, "text", shingleN = 5, minOverlap = 3)
    val clean = deduped.join(contaminated.select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    val nClean = clean.count()
    assert(nClean <= nDeduped && nClean > 0)

    // 4. reproducible half sample, then a per-source token budget
    val sampled = Mix.sampleByHash(clean, "doc_id", 0.5)
    val budgeted = Mix.sampleToTokenBudget(sampled, "doc_id", "source",
      "n_tokens", 2000L)
    val nBudgeted = budgeted.count()
    assert(nBudgeted > 0 && nBudgeted <= sampled.count())
    // budget holds in expectation; assert the hard upper bound per
    // source: expected tokens <= budget + one doc's max tokens
    val maxDoc = budgeted.agg(max(col("n_tokens"))).head.getLong(0)
    budgeted.groupBy(col("source")).agg(sum(col("n_tokens")).as("toks"))
      .collect().foreach { r =>
        // Bernoulli sampling: not a hard cap, but a blown-out source
        // (>3x budget) would mean the rate derivation is wrong
        assert(r.getAs[Long]("toks") <= 3 * 2000L + maxDoc,
          s"source ${r.getString(0)} far over budget: ${r.getAs[Long]("toks")}")
      }

    // 5. pack: offsets dense per shard, every doc starts in its pack
    val packed = Mix.packSequencesScalable(budgeted, "source", "doc_id",
      "n_tokens", 512, numSubShards = 8)
    assert(packed.count() === nBudgeted)
    packed.groupBy(col("source"))
      .agg(max(col("tok_offset") + col("n_tokens")).as("end"),
        sum(col("n_tokens")).as("tot")).collect()
      .foreach(r => assert(r.getAs[Long]("end") === r.getAs[Long]("tot")))

    // 6. the funnel report agrees with the independently-computed stages
    val funnel = Mix.curationFunnel(docs, Seq(
        "quality" -> (TextAnalysis.wsTokenCount(col("text")) >= 5 &&
          TextAnalysis.digitRatio(col("text")) <= 0.5)))
      .collect().map(r => r.getAs[String]("gate") -> r.getAs[Long]("n")).toMap
    assert(funnel("quality") === total - nGated)
    assert(funnel("kept") === nGated)
  }

  test("curationPipeline matches the independently-run standalone stage chain") {
    // The fused one-plan pipeline (ds_pipeline) must report EXACTLY
    // the per-source counts the six standalone operators produce when
    // chained by hand — same gate, keep-one, decontam set, hash
    // sample, budget rate, and pack offsets (packSequences' id order).
    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val bench = docs.filter(col("doc_id") % 97 === 0)

    val gated = docs
      .withColumn("n_toks", TextAnalysis.wsTokenCount(col("text")).cast("long"))
      .filter(col("text").isNotNull && col("n_toks") >= 5 &&
        TextAnalysis.digitRatio(col("text")) <= 0.5)
    val keepIds = Dedup.exact(gated, "doc_id", "text").select(col("keep_id"))
    val deduped = gated.join(keepIds,
      gated("doc_id") === keepIds("keep_id"), "left_semi")
    val clean = deduped.join(
      Dedup.contaminatedIds(deduped, "doc_id", "text", bench, "text",
        shingleN = 5, minOverlap = 3).select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    val sampled = Mix.sampleByHash(clean, "doc_id", 0.5)
    val budgeted = Mix.sampleToTokenBudget(sampled, "doc_id", "source",
      "n_toks", 2000L)
    val packed = Mix.packSequences(budgeted, "source", "doc_id", "n_toks", 512)

    def bySource(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.groupBy(col("source")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expSampled = bySource(sampled)
    val expBudgeted = bySource(budgeted)
    val expPack = packed.groupBy(col("source"))
      .agg(sum(col("n_toks")).as("toks"),
        sum(col("tok_offset")).as("sum_off"),
        (max(col("pack_id")) + 1L).as("n_packs"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    val pipe = Mix.curationPipeline(docs, "doc_id", "source", "text",
      bench, "text").collect()
    assert(pipe.nonEmpty)
    pipe.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_sampled") === expSampled.getOrElse(src, 0L),
        s"$src n_sampled")
      assert(r.getAs[Long]("n_budgeted") === expBudgeted.getOrElse(src, 0L),
        s"$src n_budgeted")
      val (toks, sumOff, nPacks) =
        expPack.getOrElse(src, (0L, 0L, 0L))
      assert(r.getAs[Long]("toks_budgeted") === toks, s"$src toks_budgeted")
      assert(r.getAs[Long]("sum_tok_offset") === sumOff, s"$src sum_tok_offset")
      assert(r.getAs[Long]("n_packs") === nPacks, s"$src n_packs")
      // funnel monotonicity inside one report row
      val chain = Seq("n_total", "n_gated", "n_deduped", "n_clean",
        "n_sampled", "n_budgeted").map(r.getAs[Long])
      assert(chain.sliding(2).forall(p => p(0) >= p(1)), s"$src not monotone")
    }
  }

  test("curationPipeline decontam size valve: join path row-identical to the membership path") {
    // r14 (verdict-r13 item 2): above maxMembershipHashes distinct
    // bench shingle hashes the pipeline swaps the row-local
    // LongMembership literal for contaminatedIds' broadcast semi-join
    // shape. The two paths must report IDENTICAL rows on the same
    // fixture — forced here by threshold 0 (always-valve) vs the
    // default (never-valve at this fixture size).
    val docs = graft.tables.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val bench = docs.filter(col("doc_id") % 53 === 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val membership = canon(Mix.curationPipeline(docs, "doc_id", "source",
      "text", bench, "text"))
    val joined = canon(Mix.curationPipeline(docs, "doc_id", "source",
      "text", bench, "text", maxMembershipHashes = 0L))
    assert(membership === joined,
      "valve path diverged from the membership path")
    assert(membership.nonEmpty)
  }
}
