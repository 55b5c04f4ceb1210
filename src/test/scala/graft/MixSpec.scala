package graft

import org.apache.spark.sql.functions._
import graft.mix.Mix

class MixSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (0L until 10000L).toDF("doc_id")

  test("hashUniform is deterministic, in [0,1), and roughly uniform") {
    val u = ids.select(Mix.hashUniform($"doc_id").as("u"))
    val stats = u.agg(min($"u"), max($"u"), avg($"u")).head
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) < 1.0)
    assert(math.abs(stats.getDouble(2) - 0.5) < 0.02) // uniform mean
    // deterministic: two evaluations agree exactly
    val again = ids.select(Mix.hashUniform($"doc_id").as("u"))
    assert(u.except(again).isEmpty && again.except(u).isEmpty)
  }

  test("sampleByHash keeps ~rate and is monotone in rate (nested samples)") {
    val s25 = Mix.sampleByHash(ids, "doc_id", 0.25)
    val s50 = Mix.sampleByHash(ids, "doc_id", 0.50)
    val n25 = s25.count().toDouble / 10000
    assert(math.abs(n25 - 0.25) < 0.03, s"got $n25")
    // the 25% sample is a strict subset of the 50% sample — the
    // property rand()-sampling cannot give you
    assert(s25.except(s50).isEmpty)
    assert(s50.count() > s25.count())
  }

  test("sampleByHash is a pure pushed filter — no shuffle in the plan") {
    val plan = Mix.sampleByHash(ids, "doc_id", 0.25)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("mixBySourceRates keeps everything at rate 1.0, nothing at 0.0, strata independent") {
    val docs = (0L until 3000L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val rates = Seq(("src0", 1.0), ("src1", 0.0), ("src2", 0.5)).toDF("source", "rate")
    val out = Mix.mixBySourceRates(docs, "doc_id", "source", rates)
    val bySrc = out.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") === 1000L)
    assert(!bySrc.contains("src1"))
    assert(math.abs(bySrc("src2") - 500L) < 60)
    // broadcast dim join: the corpus side must not shuffle
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("packSequences: offsets are per-shard prefix sums; packs bounded by capacity + straddle") {
    val docs = Seq(
      ("a", 1L, 100L), ("a", 2L, 200L), ("a", 3L, 150L), ("a", 4L, 300L),
      ("a", 5L, 50L), ("b", 1L, 400L), ("b", 2L, 400L))
      .toDF("source", "doc_id", "n_toks")
    val out = Mix.packSequences(docs, "source", "doc_id", "n_toks", 512)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("tok_offset"), r.getAs[Long]("pack_id")))
      .sortBy(t => (t._1, t._2))
    // shard a: offsets 0,100,300,450,750 -> packs 0,0,0,0,1
    assert(out.filter(_._1 == "a").map(t => (t._4, t._5)).toSeq ===
      Seq((0L, 0L), (100L, 0L), (300L, 0L), (450L, 0L), (750L, 1L)))
    // shard b restarts at 0: offsets 0,400 -> packs 0,0
    assert(out.filter(_._1 == "b").map(t => (t._4, t._5)).toSeq ===
      Seq((0L, 0L), (400L, 0L)))
    // every doc STARTS inside its pack's capacity window (straddle only
    // past the end, never the start)
    assert(out.forall(t => t._4 >= t._5 * 512 && t._4 < (t._5 + 1) * 512))
  }

  test("hashU32 matches the wrapping formula on the full int64 domain") {
    // the overflow-free split multiply must equal pmod(id * C, 2^32)
    // (Spark longs wrap, so the naive form is valid HERE — it is the
    // oracle engines that cannot compute it) on negatives and on ids
    // past the naive formula's 3.47e9 overflow point
    val hard = Seq(Long.MinValue, Long.MinValue + 1, -3470000000L, -1L, 0L,
      1L, 3469999999L, 3470000001L, Int.MaxValue.toLong, Long.MaxValue)
    val df = (hard ++ (0 until 1000).map(i => i * 9007199254740993L))
      .toDF("doc_id")
    val bad = df.select(
        Mix.hashU32($"doc_id").as("split"),
        pmod($"doc_id" * lit(2654435761L), lit(4294967296L)).as("naive"))
      .filter($"split" =!= $"naive")
    assert(bad.isEmpty, bad.collect().mkString(","))
    val range = df.select(Mix.hashU32($"doc_id").as("h"))
      .agg(min($"h"), max($"h")).head
    assert(range.getLong(0) >= 0L && range.getLong(1) < 4294967296L)
  }

  test("mixBySourceRates defaultRate keeps unlisted sources; default None drops them") {
    val docs = (0L until 3000L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val rates = Seq(("src0", 1.0), ("src1", 0.5)).toDF("source", "rate")
    val dropped = Mix.mixBySourceRates(docs, "doc_id", "source", rates)
    assert(dropped.filter($"source" === "src2").isEmpty)
    val kept = Mix.mixBySourceRates(docs, "doc_id", "source", rates, Some(1.0))
    assert(kept.filter($"source" === "src2").count() === 1000L)
    // listed sources behave identically under either mode
    assert(kept.filter($"source" =!= "src2").except(dropped).isEmpty)
  }

  test("sampleToTokenBudget caps over-budget sources, passes under-budget sources whole") {
    val docs = (0L until 1000L)
      .map(i => (i, if (i < 900) "big" else "small", 10L))
      .toDF("doc_id", "source", "n_toks")
    // big: 9000 tokens -> rate 1/3; small: 1000 tokens -> rate 1.0
    val out = Mix.sampleToTokenBudget(docs, "doc_id", "source", "n_toks", 3000L)
    val by = out.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by("small") === 100L) // under budget: whole source kept
    assert(math.abs(by("big") - 300L) < 60, s"got ${by("big")}")
    // the derived rate reproduces plain hash sampling exactly
    val manual = Mix.sampleByHash(
      docs.filter($"source" === "big"), "doc_id", 3000.0 / 9000.0).count()
    assert(by("big") === manual)
  }

  test("curationFunnel attributes each row to its first failing gate in one pass") {
    val docs = Seq(
      (1L, "good doc with enough words", "en"),
      (2L, "short", "en"),            // fails gate 0
      (3L, "also short", "en"),       // fails gate 0
      (4L, "12345 67890 1 2 3", "en"),// fails gate 1 (digits)
      (5L, "ceci est assez long non", "fr"), // fails gate 2 (lang)
      (6L, "another good english document here", "en"),
      (7L, null, "en"))               // null text -> fails gate 0
      .toDF("doc_id", "text", "lang")
    val len = length($"text").cast("double")
    val out = Mix.curationFunnel(docs, Seq(
        "min_tokens" -> (graft.text.TextAnalysis.wsTokenCount($"text") >= 3),
        "digit_ratio" -> ((len - length(regexp_replace($"text", "[0-9]", ""))
          .cast("double")) / len <= 0.3),
        "lang_en" -> ($"lang" === "en")))
      .collect().map(r => r.getAs[String]("gate") ->
        (r.getAs[Long]("n"), r.getAs[Long]("survivors_after"))).toMap
    assert(out === Map(
      "min_tokens" -> (3L, 4L),  // 2,3,7 dropped -> 4 remain
      "digit_ratio" -> (1L, 3L), // 4 dropped -> 3 remain
      "lang_en" -> (1L, 2L),     // 5 dropped -> 2 remain
      "kept" -> (2L, 2L)))       // 1 and 6 survive
    // zero-drop gates and an empty kept row still appear: "dropped
    // nothing" must be distinguishable from "not run"
    val allFail = Mix.curationFunnel(docs,
        Seq("open" -> lit(true), "closed" -> lit(false)))
      .collect().map(r => r.getAs[String]("gate") ->
        (r.getAs[Long]("n"), r.getAs[Long]("survivors_after"))).toMap
    assert(allFail === Map(
      "open" -> (0L, 7L), "closed" -> (7L, 0L), "kept" -> (0L, 0L)))
  }

  test("packSequencesScalable: conserves totals, equals packSequences at 1 sub-shard, no whole-shard window") {
    val docs = (0L until 2000L)
      .map(i => (s"src${i % 3}", i, (i % 37) + 1)).toDF("source", "doc_id", "n_toks")
    // with ONE sub-shard the layout order degenerates to plain id order
    // → bit-identical to the single-pass operator
    val one = Mix.packSequencesScalable(docs, "source", "doc_id", "n_toks", 512, 1)
      .select($"doc_id", $"source", $"tok_offset", $"pack_id")
    val ref = Mix.packSequences(docs, "source", "doc_id", "n_toks", 512)
      .select($"doc_id", $"source", $"tok_offset", $"pack_id")
    assert(one.except(ref).isEmpty && ref.except(one).isEmpty)
    // with many sub-shards: per-shard offsets are still a dense prefix
    // layout — max(offset + n_toks) == shard token total, all offsets
    // distinct, every doc starts inside its pack
    val out = Mix.packSequencesScalable(docs, "source", "doc_id", "n_toks", 512, 16)
    val perShard = out.groupBy($"source")
      .agg(max($"tok_offset" + $"n_toks").as("end"), sum($"n_toks").as("total"),
        count(lit(1)).as("n"), countDistinct($"tok_offset").as("nd"))
      .collect()
    perShard.foreach { r =>
      assert(r.getAs[Long]("end") === r.getAs[Long]("total"))
      assert(r.getAs[Long]("n") === r.getAs[Long]("nd"))
    }
    assert(out.filter(!($"tok_offset" >= $"pack_id" * 512 &&
      $"tok_offset" < ($"pack_id" + 1) * 512)).isEmpty)
    // scale shape, checked on the Window NODES (a plan-string contains
    // test is vacuously true — "_ss" appears in every projection): the
    // corpus-side prefix-sum window must include the sub-shard in its
    // partition keys; shard-only windows may exist only above the tiny
    // totals Aggregate
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val windows = out.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    def partKeys(w: LWindow) =
      w.partitionSpec.flatMap(_.references.toSeq).map(_.name).toSet
    assert(windows.exists(w => partKeys(w).exists(_.contains("_ss"))))
    assert(windows.forall(w => partKeys(w).exists(_.contains("_ss")) ||
      w.child.collectFirst { case a: Aggregate => a }.isDefined),
      "corpus-row window partitioned by the shard alone")
  }

  test("splitByHash: total assignment, ~fractions, membership stable under corpus changes") {
    val splits = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val out = Mix.splitByHash(ids, "doc_id", splits, salt = 7919L)
    val counts = out.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 10000L) // every row assigned
    assert(math.abs(counts("train") - 9000L) < 200)
    assert(math.abs(counts("val") - 500L) < 80)
    assert(math.abs(counts("test") - 500L) < 80)
    // the property rank/rand splits lack: dropping half the corpus
    // reassigns NOBODY (assignment is a function of the id alone)
    val half = Mix.splitByHash(ids.filter($"doc_id" % 2 === 0), "doc_id",
      splits, salt = 7919L)
    assert(half.except(out).isEmpty)
    // row-local: no shuffle in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    // a different salt is a different (still total) assignment
    val other = Mix.splitByHash(ids, "doc_id", splits, salt = 1L)
    assert(other.except(out).count() > 0)
  }

  test("shardAssign: shards in range, deterministic, size-balanced, row-local") {
    val out = Mix.shardAssign(ids, "doc_id", 32)
    val byShard = out.groupBy($"shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byShard.keySet.forall(s => s >= 0 && s < 32))
    assert(byShard.size === 32)
    assert(byShard.values.sum === 10000L)
    // multiplicative hashing balances sequential ids well: every shard
    // within ±25% of the 312.5 mean
    byShard.values.foreach(n => assert(math.abs(n - 312.5) < 80, s"shard of $n"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("interleaveWeighted: prefix frequencies track weights; seq dense per source") {
    val docs = (0L until 3000L).map(i => (i, s"src${i % 2}")).toDF("doc_id", "source")
    val weights = Seq(("src0", 1.0), ("src1", 0.25)).toDF("source", "weight")
    val out = Mix.interleaveWeighted(docs, "doc_id", "source", weights)
    // seq is a dense 0..n-1 numbering within each source
    val dense = out.groupBy($"source")
      .agg(count(lit(1)).as("n"), countDistinct($"seq").as("nd"),
        min($"seq").as("lo"), max($"seq").as("hi")).collect()
    dense.foreach { r =>
      assert(r.getAs[Long]("n") === r.getAs[Long]("nd"))
      assert(r.getAs[Long]("lo") === 0L)
      assert(r.getAs[Long]("hi") === r.getAs[Long]("n") - 1)
    }
    // in the first 1000 positions of the global order, src0 (w=1.0)
    // appears ~4x as often as src1 (w=0.25): 800 vs 200
    val prefix = out.orderBy($"interleave_key", $"source", $"doc_id")
      .limit(1000).groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(prefix("src0") - 800L) <= 2, s"got $prefix")
    assert(math.abs(prefix("src1") - 200L) <= 2, s"got $prefix")
    // scale shape: the corpus-side rank window must include the
    // sub-shard in its partition keys (same contract as
    // packSequencesScalable; shard-only windows only above aggregates)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val windows = out.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    def partKeys(w: LWindow) =
      w.partitionSpec.flatMap(_.references.toSeq).map(_.name).toSet
    assert(windows.exists(w => partKeys(w).exists(_.contains("_ss"))))
    assert(windows.forall(w => partKeys(w).exists(_.contains("_ss")) ||
      w.child.collectFirst { case a: Aggregate => a }.isDefined),
      "corpus-row window partitioned by source alone")
  }

  test("hash-keyed operators reject non-integral ids; null ids surface as null splits") {
    val strIds = Seq(("doc-1", "a"), ("doc-2", "b")).toDF("doc_id", "source")
    val splits = Seq("train" -> 0.9, "test" -> 0.1)
    // a string id would hash to null for EVERY row (silent 100%-one-split)
    intercept[IllegalArgumentException] {
      Mix.splitByHash(strIds, "doc_id", splits)
    }
    intercept[IllegalArgumentException] { Mix.shardAssign(strIds, "doc_id", 8) }
    intercept[IllegalArgumentException] {
      Mix.interleaveWeighted(strIds, "doc_id", "source",
        Seq(("a", 1.0)).toDF("source", "weight"))
    }
    // a null id among integral ids gets a NULL split, not the last one
    val withNull = Seq(Some(1L), Some(2L), None).toDF("doc_id")
    val out = Mix.splitByHash(withNull, "doc_id", splits)
      .collect().map(r => Option(r.get(0)) -> r.getString(1))
    assert(out.count(_._2 == null) === 1)
    assert(out.forall { case (id, s) => id.isEmpty == (s == null) })
    // non-positive target shares fail loudly instead of poisoning T
    intercept[IllegalArgumentException] {
      Mix.reweightToShares(Seq(("a", 10L)).toDF("source", "n_toks"),
        "source", "n_toks", Seq(("a", 0.0)).toDF("source", "share"))
    }
  }

  test("epochAllocation: cap binds, shortfall accounts, realized shares renormalize") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // source a: 100 tokens (scarce), source b: 1000 tokens (plentiful)
    val corpus = (Seq.fill(10)(("a", 10L)) ++ Seq.fill(10)(("b", 100L)))
      .toDF("source", "n_toks")
    val shares = Seq(("a", 0.5), ("b", 0.5)).toDF("source", "share")
    val out = Mix.epochAllocation(corpus, "source", "n_toks", shares,
        tokenBudget = 2000L, maxEpochs = 4.0)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = out("a"); val b = out("b")
    // a: desired 1000, cap 400 -> alloc 400, 4 epochs, capped, 600 short
    assert(a.getAs[Double]("desired_tokens") === 1000.0)
    assert(a.getAs[Double]("alloc_tokens") === 400.0)
    assert(a.getAs[Double]("epochs") === 4.0)
    assert(a.getAs[Boolean]("capped"))
    assert(a.getAs[Double]("shortfall_tokens") === 600.0)
    // b: desired 1000 under cap 4000 -> whole desire, 1 epoch
    assert(b.getAs[Double]("alloc_tokens") === 1000.0)
    assert(b.getAs[Double]("epochs") === 1.0)
    assert(!b.getAs[Boolean]("capped"))
    assert(b.getAs[Double]("shortfall_tokens") === 0.0)
    // realized mixture renormalizes over what was achievable
    assert(math.abs(a.getAs[Double]("realized_share") - 400.0 / 1400.0) < 1e-12)
    assert(math.abs(b.getAs[Double]("realized_share") - 1000.0 / 1400.0) < 1e-12)
    // multiple form: budget = 2 x (1100 total) = 2200
    val byMult = Mix.epochAllocationByMultiple(corpus, "source", "n_toks",
        shares, budgetMultiple = 2.0, maxEpochs = 4.0)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Double]("desired_tokens")).toMap
    assert(byMult("a") === 1100.0 && byMult("b") === 1100.0)
    // shares-dim validation (driver-side, ADVICE r10): a duplicated
    // source would double-join the totals row — rejected up front
    val dupShares = Seq(("a", 0.3), ("a", 0.2), ("b", 0.5))
      .toDF("source", "share")
    val dupErr = intercept[IllegalArgumentException] {
      Mix.epochAllocation(corpus, "source", "n_toks", dupShares, 2000L)
    }
    assert(dupErr.getMessage.contains("duplicate source"))
    val badShares = Seq(("a", 0.5), ("b", -0.5)).toDF("source", "share")
    intercept[IllegalArgumentException] {
      Mix.epochAllocation(corpus, "source", "n_toks", badShares, 2000L)
    }
  }

  test("reweightToShares: binding source at rate 1.0, realized shares hit targets, unlisted excluded") {
    val rows = Seq.fill(10)(("a", 100L)) ++ Seq.fill(3)(("b", 100L)) ++
      Seq.fill(2)(("c", 100L)) ++ Seq.fill(5)(("d", 100L)) // d unlisted
    val df = rows.toDF("source", "n_toks")
    val shares = Seq(("a", 0.5), ("b", 0.3), ("c", 0.2)).toDF("source", "share")
    val out = Mix.reweightToShares(df, "source", "n_toks", shares)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // T = min(1000/0.5, 300/0.3, 200/0.2) = 1000; b and c bind at 1.0
    assert(out.keySet === Set("a", "b", "c")) // d excluded by contract
    assert(out("a") === ((1000L, 0.5, 0.5, 500.0)))
    assert(out("b") === ((300L, 0.3, 1.0, 300.0)))
    assert(out("c") === ((200L, 0.2, 1.0, 200.0)))
    // realized shares equal the targets: expected_tokens / T == share
    val t = 1000.0
    out.values.foreach { case (_, share, _, exp) => assert(exp / t === share) }
  }

  test("histogramQuantile: exact lower quantiles from the value histogram") {
    // source a: lengths 1..8 -> lower quartile = 2 (cum 2/8), median = 4
    // source b: constant 5 -> every quantile is 5
    // source c: skewed {1,1,1,100} -> p25 = 1, p50 = 1
    val df = ((1 to 8).map(i => ("a", i.toLong)) ++
      (1 to 4).map(_ => ("b", 5L)) ++
      Seq(("c", 1L), ("c", 1L), ("c", 1L), ("c", 100L)))
      .toDF("source", "n")
    def q(num: Int, den: Int) =
      Mix.histogramQuantile(df, "source", "n", num, den)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q(1, 4) === Map("a" -> 2L, "b" -> 5L, "c" -> 1L))
    assert(q(1, 2) === Map("a" -> 4L, "b" -> 5L, "c" -> 1L))
    assert(q(1, 1) === Map("a" -> 8L, "b" -> 5L, "c" -> 100L)) // max
    // nulls are excluded from the distribution, not counted in totals
    val withNull = df.union(Seq(("a", null.asInstanceOf[java.lang.Long]))
      .toDF("source", "n"))
    assert(Mix.histogramQuantile(withNull, "source", "n", 1, 2)
      .filter(col("source") === "a").head.getLong(1) === 4L)
    // multi-quantile one-pass form agrees with the single-quantile calls
    val multi = Mix.histogramQuantiles(df, "source", "n",
        Seq((1, 4), (1, 2), (1, 1)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(multi === Map("a" -> ((2L, 4L, 8L)), "b" -> ((5L, 5L, 5L)),
      "c" -> ((1L, 1L, 100L))))
  }

  test("pplBuckets labels per-key terciles from exact lower-quantile cutpoints") {
    val df = (
      (1 to 6).map(i => ("a", i.toLong, Some(i.toDouble))) ++ // a: 1..6
        Seq(("b", 7L, Some(10.0)), ("b", 8L, Some(10.0)),     // b: all tied
          ("b", 9L, Some(10.0)),
          ("a", 10L, None))                                   // unscorable
      ).toDF("source", "id", "ppl")
    val out = Mix.pplBuckets(df, "source", "ppl")
      .collect().map(r => r.getLong(1) -> Option(r.getAs[String]("bucket")))
      .toMap
    // a: n=6, cut1 = first v with cum*3 >= 6 -> 2.0; cut2 -> 4.0
    assert(out(1L) === Some("head") && out(2L) === Some("head"))
    assert(out(3L) === Some("middle") && out(4L) === Some("middle"))
    assert(out(5L) === Some("tail") && out(6L) === Some("tail"))
    // b: every value ties at the cutpoints -> all take the lower bucket
    assert(out(7L) === Some("head") && out(8L) === Some("head") &&
      out(9L) === Some("head"))
    // null score -> null bucket, never a silent tail
    assert(out(10L) === None)
  }

  test("histogramDivergence: 0 for identical distributions, 1 for disjoint, known midpoint") {
    val a = Seq(("s", 1L), ("s", 1L), ("s", 2L), ("t", 5L), ("t", 6L))
      .toDF("k", "v")
    // identical distribution (same values, doubled counts) -> JS = 0
    val same = Mix.histogramDivergence(a, a.union(a), "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(same.values.forall(v => math.abs(v) < 1e-12))
    // disjoint value sets with both sides non-empty -> JS = 1 bit
    val b = Seq(("s", 9L), ("s", 10L), ("t", 11L)).toDF("k", "v")
    val disj = Mix.histogramDivergence(a, b, "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(disj.values.forall(v => math.abs(v - 1.0) < 1e-12))
    // hand-computed midpoint: P = {1: 1}, Q = {1: .5, 2: .5}
    //   JS = .5*(1*log2(2*1/1.5)) + .5*(.5*log2(2*.5/1.5) + .5*log2(2*.5/.5))
    val c1 = Seq(("s", 1L)).toDF("k", "v")
    val c2 = Seq(("s", 1L), ("s", 2L)).toDF("k", "v")
    val exp = 0.5 * (1.0 * (math.log(2.0 / 1.5) / math.log(2))) +
      0.5 * (0.5 * (math.log(1.0 / 1.5) / math.log(2)) + 0.5 * 1.0)
    val mid = Mix.histogramDivergence(c1, c2, "k", "v").head.getDouble(1)
    assert(math.abs(mid - exp) < 1e-12, s"got $mid expected $exp")
    // counts ride along
    val r = Mix.histogramDivergence(a, b, "k", "v")
      .filter($"k" === "s").head
    assert(r.getLong(2) === 3L && r.getLong(3) === 2L)
  }

  test("floorByLengthQuantile keeps per-source upper three quartiles; sourceReport exact") {
    val df = ((1 to 8).map(i => (i.toLong, "a", i.toLong)) ++
      (11 to 14).map(i => (i.toLong, "b", 5L)))
      .toDF("doc_id", "source", "n")
    val kept = Mix.floorByLengthQuantile(df, "source", "n", 1, 4)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    // source a floor = 2 -> docs 2..8 survive; source b floor = 5 -> all
    assert(kept === ((2L to 8L) ++ (11L to 14L)).toSet)
    val rep = Mix.sourceReport(df, "source", "n")
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rep("a")
    assert(a.getAs[Long]("n_docs") === 8L)
    assert(a.getAs[Long]("n_tokens") === 36L)
    assert(a.getAs[Double]("mean_tokens") === 4.5)
    assert(a.getAs[Long]("min_tokens") === 1L)
    assert(a.getAs[Long]("p50_tokens") === 4L)
    assert(a.getAs[Long]("max_tokens") === 8L)
  }

  test("chunkByTokens: exact windows, stride overlap, short and empty docs") {
    val docs = Seq(
      (1L, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"), // 10 tokens
      (2L, "a b"),                           // shorter than one chunk
      (3L, ""))                              // empty -> split yields [""]
      .toDF("doc_id", "text")
    val out = Mix.chunkByTokens(docs, "doc_id", "text", chunkTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(t => (t._1, t._2))
    val doc1 = out.filter(_._1 == 1L)
    assert(doc1 === Array(
      (1L, 0L, 0L, 4L, "w0 w1 w2 w3"),
      (1L, 1L, 3L, 4L, "w3 w4 w5 w6"),
      (1L, 2L, 6L, 4L, "w6 w7 w8 w9"),
      (1L, 3L, 9L, 1L, "w9")))
    assert(out.filter(_._1 == 2L) === Array((2L, 0L, 0L, 2L, "a b")))
    assert(out.filter(_._1 == 3L) === Array((3L, 0L, 0L, 1L, "")))
    // every token position is covered by at least one chunk
    val covered = doc1.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered === (0L until 10L).toSet)
  }

  test("winsorize clips to exact per-key quantile band and tags the direction") {
    // key A: values 1..10 -> p20 (2/10) = 2, p80 (8/10) = 8
    val a = (1L to 10L).map(v => ("A", v, v))
    // key B: constant -> lo = hi = 5, nothing clips
    val b = (11L to 14L).map(i => ("B", i, 5L))
    val df = (a ++ b).toDF("src", "id", "v")
    val out = Mix.winsorize(df, "src", "v", 1, 5, 4, 5)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("clipped"), r.getAs[String]("clip_tag")))).toMap
    assert(out(1L) === ((2L, "low")))
    assert(out(2L) === ((2L, "in_range")))  // exactly at the cutpoint
    assert(out(5L) === ((5L, "in_range")))
    assert(out(8L) === ((8L, "in_range")))
    assert(out(9L) === ((8L, "high")))
    assert(out(10L) === ((8L, "high")))
    (11L to 14L).foreach(i => assert(out(i) === ((5L, "in_range"))))
    // null value -> null clipped, null tag (never a silent in_range);
    // an ALL-null key has no cutpoint row but its rows must survive
    val withNull = Seq(("A", 99L, Option.empty[Long]), ("A", 98L, Some(3L)),
      ("Z", 97L, Option.empty[Long]), ("Z", 96L, Option.empty[Long]))
      .toDF("src", "id", "v")
    val nw = Mix.winsorize(withNull, "src", "v", 1, 2, 1, 1)
    Seq(99L, 97L, 96L).foreach { id =>
      val nr = nw.filter(col("id") === id).head
      assert(nr.isNullAt(nr.fieldIndex("clipped")))
      assert(nr.isNullAt(nr.fieldIndex("clip_tag")))
    }
    assert(nw.count() === 4) // the all-null key Z was not dropped
  }
}
