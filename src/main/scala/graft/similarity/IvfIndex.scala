package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.cosineSimilarity

/** A persisted IVF index (SURVEY §8 #3): the k-means centroid table and
  * the per-vector centroid assignments are computed ONCE at build time
  * and written as parquet — queries only probe.
  *
  * This is the shape real vector stores use (an IVF index is an ingest
  * artifact, not per-query work), and it is the 100 TB story:
  *   - `centroids/` is k×dim — trivially broadcastable;
  *   - `assignments/` is the corpus partitioned BY CENTROID
  *     (`partitionBy("cid")`), so a probe of nProbe centroids is a
  *     partition-pruned scan reading ~nProbe/k of the data; the filter
  *     shows up as PartitionFilters in the scan, not a post-read filter.
  *   - the only driver-side materialization is k×dim centroids and the
  *     nProbe probed centroid ids (both bounded by k, same convention
  *     as kmeansCentroids).
  */
final class IvfIndex private (val spark: SparkSession, val path: String,
                              val idCol: String, val vecCol: String) {

  /** Opt-in append-time maintenance (r14, verdict-r13 item 5): when
    * set, every [[addVectors]] finishes by running
    * [[compactIfFragmented]] with this policy, so an append-heavy
    * lifecycle can never fragment probes into the r13 IndexSoak
    * degradation (240→2,146 files, 0.68→3.2 s probes) without the
    * valve firing. Off by default — compaction belongs to the
    * single-writer ingest owner, and opting in here keeps it on that
    * same writer thread (no new concurrency). IndexSoak --auto
    * measures the policy: probe latency stays flat across 8 appends
    * with NO manual compact call.
    */
  @volatile private var autoPolicy: Option[(Int, Long)] = None

  def withAutoMaintenance(maxFiles: Int = 64,
                          targetFileRows: Long = 4000000L): IvfIndex = {
    require(maxFiles > 0 && targetFileRows > 0,
      "auto-maintenance thresholds must be positive")
    autoPolicy = Some((maxFiles, targetFileRows))
    this
  }

  private def maintainIfDue(): Unit =
    autoPolicy.foreach { case (mf, tr) => compactIfFragmented(mf, tr) }

  def centroids: DataFrame = spark.read.parquet(s"$path/centroids")

  /** Corpus vectors partitioned by their nearest centroid. */
  def assignments: DataFrame = spark.read.parquet(s"$path/assignments")

  /** ANN top-k: rank centroids against the query (k×dim, driver-side),
    * then scan only the nProbe winning partitions and rank exactly.
    */
  def topK(query: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val qv = query.select(col(vecCol).cast("array<double>").as("_qv"))
    // probed cids: |centroids| is k (small by construction) — ranking it
    // against the 1-row query on the driver is bounded work and yields
    // LITERAL partition predicates the parquet scan can prune with.
    val probed = centroids.crossJoin(broadcast(qv))
      .select(col("cid"),
        cosineSimilarity(col("centroid"), col("_qv")).as("_csim"))
      .orderBy(col("_csim").desc, col("cid"))
      .limit(nProbe)
      .collect().map(_.getLong(0))
    val cand = assignments.filter(col("cid").isin(probed.map(Long.box): _*))
    Similarity.bruteForceTopK(cand, idCol, vecCol, query, k)
  }

  /** Incremental maintenance: assign NEW vectors to the existing
    * centroids and append them to the cid-partitioned assignments (no
    * rebuild — appended files land inside the right cid= directories,
    * so probes keep pruning). Centroids do drift as the corpus grows;
    * when [[IvfIndex.isStale]]-style monitoring says the drift matters,
    * rebuild with [[IvfIndex.build]]. The meta row count is refreshed
    * so staleness probes stay meaningful.
    *
    * Ids already present in the index are SKIPPED (anti-join against
    * the assignments' id column — a columnar one-column scan): blindly
    * appending a re-sent id would duplicate the vector in its bucket,
    * skewing topK ranks and double-counting in meta. To UPDATE a
    * vector, rebuild (the partitioned-append file layout cannot rewrite
    * a row in place).
    */
  def addVectors(newVectors: DataFrame): Unit = {
    val cents = Similarity.collectCentroids(centroids, "cid", "centroid")
    newVectors
      .select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
      // a NULL vector has no nearest centroid: skip it (writing it
      // would land a meaningless cid=null partition the probes never
      // read)
      .filter(col(vecCol).isNotNull)
      .join(assignments.select(col(idCol)), Seq(idCol), "left_anti")
      .select(org.apache.spark.sql.graft.CentroidExpressions
          .nearestCentroidId(col(vecCol), cents).as("cid"),
        col(idCol), col(vecCol))
      .write.mode("append").partitionBy("cid").parquet(s"$path/assignments")
    assignments.agg(count(lit(1)).as("n_vectors"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    maintainIfDue()
  }

  /** Centroid drift after incremental [[addVectors]] appends: per
    * bucket, the cosine between the STORED centroid and the current
    * mean of the bucket's members, plus the member count. One
    * map-side-combining VectorMean pass over assignments (the same
    * one-aggregate shape k-means iterations use — never a corpus x dim
    * posexplode) joined against the k-row centroid table — no driver
    * materialization beyond the k-row result the caller reads.
    *
    * Drift is the re-centering signal: appended vectors land in their
    * nearest EXISTING bucket, so as the corpus grows the stored
    * centroids stop being the members' means and probe ranking quality
    * decays. cosine ≈ 1 → fresh; lower → stale.
    */
  def centroidDrift(): DataFrame = {
    val memberMeans = assignments
      .groupBy(col("cid"))
      .agg(org.apache.spark.sql.graft.VectorAggregates
        .vectorMean(col(vecCol)).as("mean_vec"))
    val counts = assignments.groupBy(col("cid")).agg(count(lit(1)).as("n_members"))
    centroids.join(memberMeans, Seq("cid"), "left")
      .join(counts, Seq("cid"), "left")
      .select(col("cid"), col("n_members"),
        cosineSimilarity(col("centroid"), col("mean_vec")).as("centroid_cosine"))
  }

  /** Re-center WITHOUT re-bucketing: overwrite each stored centroid
    * with its bucket's current member mean (one aggregation pass), so
    * probe ranking reflects the corpus that actually lives in each
    * bucket. Membership — and therefore the partition layout — is
    * untouched: this is the cheap periodic maintenance step between
    * incremental appends. When drift is severe enough that vectors
    * belong in DIFFERENT buckets (centroid_cosine low and appends
    * dominated the corpus), a full [[IvfIndex.build]] re-bucket is the
    * honest fix; re-centering cannot move a vector.
    */
  def recenter(): Unit = {
    val memberMeans = assignments
      .groupBy(col("cid"))
      .agg(org.apache.spark.sql.graft.VectorAggregates
        .vectorMean(col(vecCol)).as("centroid"))
      .filter(col("centroid").isNotNull)
    // keep empty buckets' stored centroids (no members to mean over)
    val updated = centroids.select(col("cid"), col("centroid").as("_old"))
      .join(memberMeans, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("centroid"), col("_old")).as("centroid"))
    // two-step write: parquet cannot overwrite the path it is reading
    val tmp = s"$path/centroids_next"
    updated.coalesce(1).write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    val tp = new org.apache.hadoop.fs.Path(tmp)
    tp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(tp, true)
  }

  /** Parquet data files currently holding the assignments. Every
    * [[addVectors]] append lands a file per task per touched cid
    * directory, so an append-heavy lifecycle fragments the bucket scans
    * probes prune to — measured at the r13 IndexSoak: 8 appends took
    * the sg100 index from 240 to 2,146 files and topKBatch from 0.8 s
    * to ~3 s, and [[recenter]] (which rewrites only the k-row centroid
    * table) cannot recover it. This count is the compaction signal.
    */
  private def hadoopFs =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def hp(s: String) = new org.apache.hadoop.fs.Path(s"$path/$s")

  def dataFileCount(): Int =
    graft.IndexMaintenance.parquetFileCount(hadoopFs, Seq(hp("assignments")))

  /** Size-triggered maintenance: when accumulated appends exceed
    * `maxFiles` data files, rewrite the assignments into right-sized
    * files (content-preserving — same rows, same by-cid partition
    * layout, so probes prune identically). Returns true when a
    * compaction ran. Same single-writer contract as appends. Recovery
    * of an interrupted prior compaction runs FIRST, before the file
    * count reads the live directory.
    */
  def compactIfFragmented(maxFiles: Int = 64,
                          targetFileRows: Long = 4000000L): Boolean = {
    graft.IndexMaintenance.finishStagedSwap(hadoopFs,
      hp("assignments"), hp("assignments_next"))
    val fragmented = dataFileCount() > maxFiles
    if (fragmented) compact(targetFileRows)
    fragmented
  }

  /** Rewrite assignments/ into right-sized files, keeping the BY-CID
    * partition layout probes prune with: rows are hash-salted into
    * `ceil(bucketRows / targetFileRows)` sub-files per bucket (one
    * task per (cid, salt) ⇒ bounded, right-sized files at any corpus
    * scale — a 100 TB index with k buckets of 25M vectors compacts to
    * ~targetFileRows-row files, never one monolith per bucket). Stages
    * fully to `assignments_next` BEFORE the live table is touched,
    * then swaps by directory rename; a crash between delete and rename
    * leaves the complete staged copy, and the next compact() finishes
    * the swap first — the [[graft.dedup.LshIndex.compact]] contract.
    */
  def compact(targetFileRows: Long = 4000000L): Unit = {
    require(targetFileRows > 0, "targetFileRows must be positive")
    val fs = hadoopFs
    def p(s: String) = hp(s)
    // recovery: a previous compact crashed after deleting the live
    // table but before renaming its staged replacement
    graft.IndexMaintenance.finishStagedSwap(fs,
      p("assignments"), p("assignments_next"))
    val n = assignments.count()
    val nCids = math.max(1L, centroids.count())
    // sub-files per bucket sized from the MEAN bucket (k-means buckets
    // are ~n/k by construction; a pathologically skewed bucket writes
    // proportionally more rows per file, which is the rebuild-k signal,
    // not a compaction failure)
    val filesPerCid = math.max(1L,
      (n / nCids + targetFileRows - 1) / targetFileRows).toInt
    assignments
      .repartition((nCids * filesPerCid).toInt, col("cid"),
        pmod(xxhash64(col(idCol)), lit(filesPerCid.toLong)))
      .write.mode("overwrite").partitionBy("cid")
      .parquet(s"$path/assignments_next")
    graft.IndexMaintenance.swapStaged(fs, p("assignments"),
      p("assignments_next"))
  }

  /** Drift-triggered maintenance policy (SURVEY §9 #4): re-center when
    * any non-empty bucket's stored centroid has drifted below
    * `minCosine` against its member mean. Returns true when a re-center
    * ran. The drift probe is one aggregation over assignments; callers
    * run this after append batches, not per query.
    */
  def recenterIfDrifted(minCosine: Double = 0.995): Boolean = {
    val drifted = centroidDrift()
      .filter(col("n_members") > 0 && col("centroid_cosine") < minCosine)
      .limit(1).count() > 0
    if (drifted) recenter()
    drifted
  }

  /** Batch ANN: top-k neighbors for EVERY row of a query table in one
    * pass — the shape of real retrieval/dedup workloads (score a new
    * document batch against the corpus).
    *
    * Plan: per-query probes are a ROW-LOCAL top-nProbe centroid rank
    * (NearestCentroidIds over the k×dim driver-side table — the same
    * bounded materialization the class contract already allows) + one
    * explode, so the query table never joins or exchanges to find its
    * buckets; the union of probed cids is still ≤ |centroids|, so the
    * assignments scan stays partition-prunable via a dynamic filter
    * (cid semi-join); candidates join probes ON cid — each query's
    * vectors come only from its own probed buckets — and a per-query
    * window takes the exact top-k. Shuffles: one on cid (bounded by
    * nProbe × queries), one for the final per-query ranking.
    *
    * Null-vector queries have no nearest centroids and are DROPPED
    * from the output (no probes to run — the r7 contract; the old
    * window path emitted arbitrary probes and all-null cosines for
    * them).
    *
    * @param queryIdCol column naming each query row (output column
    *        `query_id`)
    * @param excludeSelf drop corpus rows whose id equals the query's id
    *        BEFORE ranking — the kNN SELF-join shape (every doc's top-k
    *        neighbors, trivial self-match at cosine 1 excluded), so a
    *        full k neighbors survive instead of k-1
    */
  def topKBatch(queries: DataFrame, queryIdCol: String, k: Int,
                nProbe: Int, excludeSelf: Boolean = false): DataFrame = {
    val cents = Similarity.collectCentroids(centroids, "cid", "centroid")
    val probes = queries
      .select(col(queryIdCol).as("query_id"),
        col(vecCol).cast("array<double>").as("_qv"))
      .select(col("query_id"), col("_qv"),
        explode(org.apache.spark.sql.graft.CentroidExpressions
          .nearestCentroidIds(col("_qv"), cents, nProbe)).as("cid"))
      .select(col("query_id"), col("cid"), col("_qv"))
    val cand = assignments
      .join(probes.select(col("cid")).distinct(), Seq("cid"), "left_semi")
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col(idCol))
    val scored = cand.join(probes, Seq("cid"))
      .select(col("query_id"), col(idCol),
        cosineSimilarity(col(vecCol), col("_qv")).as("cosine"))
    val pool = if (excludeSelf) scored.filter(col(idCol) =!= col("query_id"))
               else scored
    pool.withColumn("_rk", row_number().over(rankW))
      .filter(col("_rk") <= k)
      .select(col("query_id"), col(idCol), col("cosine"))
  }
}

object IvfIndex {

  /** Build the index: k-means centroids (Lloyd's, deterministic seeds),
    * assign every vector to its nearest centroid, write both tables
    * plus a one-row meta table recording the indexed corpus size (the
    * staleness handle for [[IvfIndex.isStale]]). One pass over the
    * corpus beyond the k-means iterations; the assignment join
    * broadcasts the centroid table.
    */
  def build(df: DataFrame, idCol: String, vecCol: String, path: String,
            k: Int = 16, iterations: Int = 2,
            fitSampleRate: Double = 1.0): IvfIndex = {
    val spark = df.sparkSession
    val cents = Similarity.kmeansCentroids(df, idCol, vecCol, k, iterations,
      fitSampleRate)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    // assign from the PERSISTED table (exact doubles survive the parquet
    // roundtrip) via the row-local argmax projection — one zero-exchange
    // pass over the corpus
    val stored = Similarity.collectCentroids(
      spark.read.parquet(s"$path/centroids"), "cid", "centroid")
    df.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
      .filter(col(vecCol).isNotNull) // null vectors are unindexable
      .select(org.apache.spark.sql.graft.CentroidExpressions
          .nearestCentroidId(col(vecCol), stored).as("cid"),
        col(idCol), col(vecCol))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$path/assignments")
    spark.read.parquet(s"$path/assignments")
      .agg(count(lit(1)).as("n_vectors"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    new IvfIndex(spark, path, idCol, vecCol)
  }

  /** Open an already-built index. */
  def load(spark: SparkSession, path: String, idCol: String,
           vecCol: String): IvfIndex =
    new IvfIndex(spark, path, idCol, vecCol)

  /** True when a completed index exists at `path` — checked through the
    * Hadoop filesystem of the path, so it works on HDFS/S3/etc., not
    * just the local disk.
    */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/assignments/_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Load if the index exists, else build and persist — the
    * ingest-once/query-many lifecycle. NOTE the contract: the index is
    * an ingest artifact keyed by `path`; this does NOT detect that the
    * corpus changed underneath an existing index (that check is a full
    * corpus count — call [[IvfIndex.isStale]] explicitly when the
    * source may have been rewritten, and rebuild with [[build]]).
    */
  def buildOrLoad(df: DataFrame, idCol: String, vecCol: String, path: String,
                  k: Int = 16, iterations: Int = 2): IvfIndex =
    if (exists(df.sparkSession, path)) load(df.sparkSession, path, idCol, vecCol)
    else build(df, idCol, vecCol, path, k, iterations)

  /** [[buildOrLoad]] plus the [[isStale]] count probe on the load path:
    * an existing index whose recorded vector count no longer matches
    * the corpus is REBUILT instead of served. This closes the
    * regenerated-dataset-at-the-same-path hole in buildOrLoad's
    * path-keyed contract at the cost of one corpus count per call —
    * the right default for harness/entry-point callers; ingest
    * pipelines that own the index lifecycle can keep the cheaper
    * buildOrLoad.
    */
  def buildOrRefresh(df: DataFrame, idCol: String, vecCol: String, path: String,
                     k: Int = 16, iterations: Int = 2): IvfIndex =
    if (exists(df.sparkSession, path)) {
      val idx = load(df.sparkSession, path, idCol, vecCol)
      if (isStale(idx, df)) build(df, idCol, vecCol, path, k, iterations)
      else idx
    } else build(df, idCol, vecCol, path, k, iterations)

  /** Cheap-but-not-free staleness probe: compares the indexed vector
    * count recorded at build time with the current corpus count (one
    * count scan of each). A matching count does not PROVE freshness —
    * an equal-size rewrite slips through — but it catches the common
    * regenerated/filtered-dataset case the path-only contract misses.
    */
  def isStale(index: IvfIndex, corpus: DataFrame): Boolean = {
    // an index with no meta record (pre-meta build, partial write)
    // cannot prove freshness — report stale rather than crash
    val metaSuccess = new org.apache.hadoop.fs.Path(s"${index.path}/meta/_SUCCESS")
    val fs = metaSuccess.getFileSystem(
      index.spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(metaSuccess)) return true
    val indexed = index.spark.read.parquet(s"${index.path}/meta")
      .head.getLong(0)
    indexed != corpus.count()
  }
}
