package graft

import org.apache.spark.sql.functions._
import graft.dedup.LshIndex
import graft.similarity.IvfIndex

/** Append-heavy index lifecycle at scale (VERDICT r12 item 7): both
  * persisted indexes are spec'd for correctness at fixture size
  * (DedupSpec / SimilaritySpec); this main MEASURES what a year of
  * incremental ingest does to them at a scale fixture — fragmentation
  * (files per append), probe/check latency degradation as appends
  * accumulate, and recovery after the maintenance step (LshIndex
  * compaction; IvfIndex drift-triggered re-center) — the numbers that
  * decide an ingest pipeline's maintenance cadence.
  *
  * Protocol (deterministic, id-hash splits):
  *   - LshIndex over `<dir>/documents.parquet`: build on the first 60%
  *     of doc_ids (hash split), then admit 8 batches of 5% each via
  *     checkAndAdd, timing every batch and recording dataFileCount();
  *     then compactIfFragmented(maxFiles=64) bracketed by pure check()
  *     probes of a FRESH-id batch (shifted ids, same texts — real
  *     candidate work against the full banded history, the probe the
  *     steady-state pipeline pays).
  *   - IvfIndex over `<dir>/embeddings.parquet`: same 60% + 8×5%
  *     protocol with addVectors, timing a fixed topKBatch probe (64
  *     query vectors, k=10, nProbe=4) after build and after every
  *     append, plus assignments file count and min centroid drift
  *     cosine; then recenterIfDrifted(0.9999) (threshold chosen to
  *     TRIGGER at fixture drift levels — the policy knob, not a magic
  *     number) and compactIfFragmented(64), each with the probe after
  *     — separating what re-centering recovers (ranking quality) from
  *     what compaction recovers (scan latency).
  *
  * Emits one JSON line per lifecycle stage:
  *   {"index":"lsh","stage":"append","i":3,"files":…,"wall_sec":…,…}
  *
  * `--auto` (r14, verdict-r13 item 5): run the same append protocol
  * with `withAutoMaintenance(maxFiles=64)` installed at build and NO
  * manual compact/recenter calls — the acceptance run for the
  * append-time valve is probe latency staying flat across all 8
  * appends because the policy fires inside the appends themselves.
  *
  * Usage: runMain graft.IndexSoak <sfDir> [lsh|ivf|both] [--auto]
  */
object IndexSoak {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime(); val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  // scalastyle:off println
  private def emit(s: String): Unit = println(s)
  // scalastyle:on println

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val auto = args.contains("--auto")
    val mode = args.drop(1).filterNot(_.startsWith("--"))
      .headOption.getOrElse("both")
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = s"/tmp/graft_index_soak_${System.nanoTime()}"
    try {

    if (mode == "lsh" || mode == "both") {
      val docs = graft.tables.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      // deterministic 5% cohorts by the portable id hash
      val cohort = pmod(graft.mix.Mix.hashU32(col("doc_id")), lit(20L))
      val base = docs.filter(cohort < 12) // 60%
      val path = s"$root/lsh"
      val (idx, buildWall) = timed(
        LshIndex.build(base, "doc_id", "text", path))
      if (auto) idx.withAutoMaintenance(maxFiles = 64)
      emit(s"""{"index":"lsh","stage":"build","auto":$auto,""" +
        s""""rows":${idx.sigs.count()},""" +
        s""""files":${idx.dataFileCount()},"wall_sec":$buildWall}""")
      // probe batch with FRESH ids (every cohort is indexed by the end,
      // and check() skips already-indexed ids — shifted ids make the
      // candidate join against the full banded history do real work and
      // emit real pairs: same texts ⇒ guaranteed near-dup hits)
      val probeBatch = docs.filter(cohort === 19L)
        .select((col("doc_id") + 1000000000000L).as("doc_id"), col("text"))
      def checkProbe(): Double =
        timed(idx.check(probeBatch, "doc_id", "text", threshold = 0.7)
          .count())._2
      (0 until 8).foreach { i =>
        val batch = docs.filter(cohort === (12 + i % 8).toLong)
        val ((pairs, _), wall) = timed {
          val p = idx.checkAndAdd(batch, "doc_id", "text", threshold = 0.7)
          (p.count(), ())
        }
        // --auto emits the steady-state probe after EVERY append —
        // the flat-latency acceptance signal
        val probeField = if (auto) s""","check_sec":${checkProbe()}""" else ""
        emit(s"""{"index":"lsh","stage":"append","i":$i,""" +
          s""""pairs":$pairs,"files":${idx.dataFileCount()},""" +
          s""""wall_sec":$wall$probeField}""")
      }
      if (!auto) {
        val (preN, preWall) = timed(
          idx.check(probeBatch, "doc_id", "text", threshold = 0.7).count())
        val (compacted, compactWall) = timed(idx.compactIfFragmented(64))
        val (postN, postWall) = timed(
          idx.check(probeBatch, "doc_id", "text", threshold = 0.7).count())
        emit(s"""{"index":"lsh","stage":"compact","ran":$compacted,""" +
          s""""files":${idx.dataFileCount()},"compact_sec":$compactWall,""" +
          s""""check_pre_sec":$preWall,"check_post_sec":$postWall,""" +
          s""""check_pre_pairs":$preN,"check_post_pairs":$postN}""")
      }
    }

    if (mode == "ivf" || mode == "both") {
      val emb = graft.tables.Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding"))
      val cohort = pmod(graft.mix.Mix.hashU32(col("vec_id")), lit(20L))
      val base = emb.filter(cohort < 12)
      val queries = emb.orderBy(col("vec_id")).limit(64)
        .select(col("vec_id").as("qid"), col("embedding")).cache()
      queries.count()
      val path = s"$root/ivf"
      def minDrift(idx: IvfIndex): Double = {
        val r = idx.centroidDrift().filter(col("n_members") > 0)
          .agg(min(col("centroid_cosine"))).collect()(0)
        if (r.isNullAt(0)) 1.0 else r.getDouble(0)
      }
      def probe(idx: IvfIndex): Double =
        // min-of-2: the first run pays footer reads for freshly
        // appended files — both numbers matter, so emit the pair
        timed(idx.topKBatch(queries, "qid", k = 10, nProbe = 4).count())._2
      val (idx, buildWall) = timed(
        IvfIndex.build(base, "vec_id", "embedding", path, k = 16,
          iterations = 2))
      if (auto) idx.withAutoMaintenance(maxFiles = 64)
      emit(s"""{"index":"ivf","stage":"build","auto":$auto,""" +
        s""""files":${idx.dataFileCount()},""" +
        s""""wall_sec":$buildWall,"probe_sec":${probe(idx)},""" +
        s""""probe2_sec":${probe(idx)}}""")
      (0 until 8).foreach { i =>
        val batch = emb.filter(cohort === (12 + i % 8).toLong)
        val (_, wall) = timed(idx.addVectors(batch))
        emit(s"""{"index":"ivf","stage":"append","i":$i,""" +
          s""""files":${idx.dataFileCount()},"wall_sec":$wall,""" +
          s""""probe_sec":${probe(idx)},"probe2_sec":${probe(idx)},""" +
          s""""min_drift_cos":${minDrift(idx)}}""")
      }
      if (!auto) {
        val (ran, rcWall) = timed(idx.recenterIfDrifted(minCosine = 0.9999))
        emit(s"""{"index":"ivf","stage":"recenter","ran":$ran,""" +
          s""""wall_sec":$rcWall,"probe_sec":${probe(idx)},""" +
          s""""probe2_sec":${probe(idx)},"min_drift_cos":${minDrift(idx)}}""")
        val (cran, cWall) = timed(idx.compactIfFragmented(64))
        emit(s"""{"index":"ivf","stage":"compact","ran":$cran,""" +
          s""""files":${idx.dataFileCount()},"compact_sec":$cWall,""" +
          s""""probe_sec":${probe(idx)},"probe2_sec":${probe(idx)}}""")
      }
    }

    } finally {
      // soak indexes are multi-GB throwaways — leaking one per run
      // would fill /tmp across the repeated runs this main exists for
      val rp = new org.apache.hadoop.fs.Path(root)
      rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(rp, true)
    }
    spark.stop()
  }
}
