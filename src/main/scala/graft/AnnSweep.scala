package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall-vs-cost sweep (r15, verdict-r14 item 2): the number a
  * 100 TB operator actually tunes is the knee of the recall@k-vs-cost
  * curve per index, and the r14 CHECKS floors (ann_lsh 0.1, ann_ivf_pq
  * 0.2) were set before any curve existed — loose enough to pass a
  * mistuned index. This main sweeps each index family's tuning knob on
  * a fixture, reporting per config:
  *
  *   - recall@10 — |returned ∩ brute-force top-10| / 10 (id match);
  *   - quality@10 — sum(cosine of returned) / sum(cosine of brute
  *     top-10): the score-mass ratio, robust to the near-tie id
  *     lottery the synthetic fixtures produce (CHECKS r13 note);
  *   - candidates — rows the index actually scores (the scale-honest
  *     cost: wall at fixture size is scheduling floor);
  *   - wall_sec — min of 2 runs, corroboration only.
  *
  * Knobs swept: LSH bitsPerBand at numBits=48 (bands = 48/b, candidate
  * mass ~ bands x 2^-b); IVF nProbe at kIvf=16; PQ kSub (codebook
  * resolution; scores everything, so cost is flat); IVFxPQ nProbe.
  *
  * Usage: runMain graft.AnnSweep <sfDir>
  * Results land in SCALING.md's r15 curve table; CHECKS floors are
  * pinned at >= 80% of the measured default-config values.
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    require(args.length >= 1, "usage: AnnSweep <sfDir>")
    val spark = GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val emb = graft.tables.Tables.embeddings(spark, dir)
    val corpus = emb.filter(col("vec_id") =!= 0).localCheckpoint(true)
    val query = emb.filter(col("vec_id") === 0).localCheckpoint(true)
    val k = 10

    import graft.similarity.Similarity
    val brute = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      query, k).collect()
    val bruteIds = brute.map(_.getLong(0)).toSet
    val bruteMass = brute.map(_.getDouble(1)).sum

    // scalastyle:off println
    def report(index: String, config: String, candidates: Long)
              (body: => DataFrame): Unit = {
      def once(): (Array[(Long, Double)], Double) = {
        val t0 = System.nanoTime()
        val rows = body.collect().map(r => (r.getLong(0), r.getDouble(1)))
        ((rows, (System.nanoTime() - t0) / 1e9))
      }
      val (rows1, w1) = once()
      val (_, w2) = once()
      val ids = rows1.map(_._1).toSet
      val recall = ids.intersect(bruteIds).size.toDouble / k
      // quality is the EXACT cosine mass of the returned ids (PQ
      // returns ADC approximations, so re-score against the corpus)
      import spark.implicits._
      val idsDf = rows1.map(_._1).toSeq.toDF("vec_id")
      val mass =
        if (rows1.isEmpty) 0.0
        else Similarity.bruteForceTopK(
            corpus.join(idsDf, Seq("vec_id"), "left_semi"),
            "vec_id", "embedding", query, k)
          .agg(sum(col("cosine"))).head().getDouble(0)
      println(s"""{"index":"$index","config":"$config",""" +
        s""""recall_at_10":$recall,"quality_at_10":${mass / bruteMass},""" +
        s""""candidates":$candidates,"wall_sec":${math.min(w1, w2)}}""")
    }

    val nCorpus = corpus.count()
    println(s"""{"fixture":"$dir","corpus_rows":$nCorpus}""")

    // ---- LSH: bitsPerBand sweep at numBits=48 ----
    for (b <- Seq(4, 6, 8, 12)) {
      val bands = Similarity.lshBands(corpus, "vec_id", "embedding", 64,
        48, b)
      val qb = Similarity.lshBands(
          query.select(lit(0L).as("_qid"), col("embedding")),
          "_qid", "embedding", 64, 48, b)
        .select(col("band").as("qband"), col("bv").as("qbv"))
      val nCand = bands.join(broadcast(qb),
          col("band") === col("qband") && col("bv") === col("qbv"))
        .select(col("vec_id")).distinct().count()
      report("lsh", s"numBits=48,bitsPerBand=$b", nCand) {
        Similarity.lshTopK(corpus, "vec_id", "embedding", 64, query, k,
          numBits = 48, bitsPerBand = b)
      }
    }

    // ---- IVF: nProbe sweep at kIvf=16 (persisted-index path) ----
    val san = dir.replaceAll("[^A-Za-z0-9.]+", "_")
    val idx = graft.similarity.IvfIndex.buildOrRefresh(corpus, "vec_id",
      "embedding", s"spark-warehouse/ivf_sweep_${san}_k16")
    for (p <- Seq(1, 2, 4, 8, 16)) {
      // candidate mass = corpus rows in the p probed buckets
      report("ivf", s"kIvf=16,nProbe=$p", (nCorpus.toDouble * p / 16).toLong) {
        idx.topK(query, k, nProbe = p)
      }
    }

    // ---- PQ: codebook resolution sweep (cost flat: scores all) ----
    for ((m, kSub) <- Seq((8, 16), (8, 64), (8, 256), (16, 16))) {
      report("pq", s"m=$m,kSub=$kSub", nCorpus) {
        Similarity.pqTopK(corpus, "vec_id", "embedding", 64, query, k,
            m = m, kSub = kSub, iterations = 2)
          .select(col("vec_id"), col("adc_score"))
      }
    }

    // ---- IVFxPQ: nProbe sweep at kIvf=16, m=8, kSub=64 (the r15
    // default; kSub=16 row kept for the before/after) ----
    for ((p, ks) <- Seq((4, 16), (2, 64), (4, 64), (8, 64))) {
      report("ivf_pq", s"kIvf=16,nProbe=$p,m=8,kSub=$ks",
        (nCorpus.toDouble * p / 16).toLong) {
        Similarity.ivfPqTopK(corpus, "vec_id", "embedding", 64, query, k,
            kIvf = 16, ivfIterations = 2, nProbe = p, m = 8, kSub = ks,
            pqIterations = 2)
          .select(col("vec_id"), col("adc_score"))
      }
    }

    // ---- kNN self-join: nProbe sweep, MEAN recall@5 over all queries
    // (brute twin is all-pairs — fixture-bounded harness cost) ----
    val bruteKnn = {
      val a = corpus.select(col("vec_id").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
      val b = corpus.select(col("vec_id").as("cid"),
        col("embedding").cast("array<double>").as("cv"))
      import org.apache.spark.sql.expressions.Window
      a.crossJoin(b).filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"),
          graft.functions.cosineSimilarity(col("qv"), col("cv")).as("cos"))
        .withColumn("_r", row_number().over(Window.partitionBy(col("qid"))
          .orderBy(col("cos").desc, col("cid"))))
        .filter(col("_r") <= 5).select(col("qid"), col("cid"))
        .localCheckpoint(true)
    }
    // r16 (verdict-r15 item 4): sweep kIvf TOO — the candidate mass per
    // query is corpus x nProbe/kIvf, so a finer coarse quantizer cuts
    // the batch join's quadratic-ish pair count structurally where
    // nProbe only scales it. Candidate counts are MEASURED (sum over
    // queries of probed-bucket occupancy), not the uniform-bucket
    // estimate, because k-means buckets are not uniform.
    for ((kIvf, p) <- Seq((16, 2), (16, 4), (64, 4), (64, 8), (64, 16))) {
      val kIdx =
        if (kIvf == 16) idx
        else graft.similarity.IvfIndex.buildOrRefresh(corpus, "vec_id",
          "embedding", s"spark-warehouse/ivf_sweep_${san}_k$kIvf", k = kIvf)
      val nCand = {
        val probes = corpus
          .select(col("vec_id").as("qid"),
            explode(org.apache.spark.sql.graft.CentroidExpressions
              .nearestCentroidIds(col("embedding").cast("array<double>"),
                graft.similarity.Similarity.collectCentroids(
                  kIdx.centroids, "cid", "centroid"), p)).as("cid"))
        val occ = kIdx.assignments.groupBy(col("cid"))
          .agg(count(lit(1)).as("_n"))
        probes.join(occ, Seq("cid"))
          .agg(coalesce(sum(col("_n")), lit(0L))).head.getLong(0)
      }
      val t0 = System.nanoTime()
      val got = kIdx.topKBatch(corpus, "vec_id", 5, nProbe = p,
          excludeSelf = true)
        .select(col("query_id").as("qid"), col("vec_id").as("cid"))
      val hit = got.join(bruteKnn, Seq("qid", "cid"), "left_semi").count()
      val total = bruteKnn.count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(s"""{"index":"knn_join","config":"kIvf=$kIvf,nProbe=$p",""" +
        s""""mean_recall_at_5":${hit.toDouble / total},""" +
        s""""candidates":$nCand,"wall_sec":$wall}""")
    }
    // scalastyle:on println
    spark.stop()
  }
}
