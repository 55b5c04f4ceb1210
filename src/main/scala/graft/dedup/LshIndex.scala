package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A persisted MinHash-LSH index for INCREMENTAL near-dup detection —
  * the production dedup shape: the corpus is indexed once at ingest,
  * and each new batch is checked against ALL history (and itself)
  * without recomputing or even rescanning the historical text.
  *
  * Two parquet tables, written at build and appended per batch:
  *   - `sigs/`   (doc_id, sig: array<long>[numHashes]) — the row-local
  *     MinHash signatures ([[org.apache.spark.sql.graft.MinHashSignature]]);
  *   - `banded/` (doc_id, band, bh), partitioned BY BAND — the LSH
  *     bucket keys.
  *
  * Cross-batch verification uses the STANDARD MinHash estimator
  * (fraction of equal signature components — an unbiased estimator of
  * Jaccard, stderr sqrt(J(1-J)/numHashes) ≈ 0.057 at k=64, J=0.7)
  * instead of exact shingle intersection: exact verify needs both
  * documents' text, which the index deliberately does not store —
  * history stays signatures-only (8 bytes × numHashes per doc,
  * independent of document length). Callers wanting exact Jaccard on
  * a batch's INTERNAL pairs can still run [[Dedup.minhashLsh]] over
  * the batch; the cross-batch contract is estimator-based and says so.
  *
  * Scale design (100 TB of history): a batch's banded rows are tiny
  * next to history, so the candidate join BROADCASTS the batch side
  * and streams the banded history scan — history is never shuffled;
  * signatures join on doc_id for candidate pairs only.
  */
final class LshIndex private[dedup] (val spark: SparkSession, val path: String,
                                     val shingleN: Int, val numHashes: Int,
                                     val bands: Int) {
  require(numHashes % bands == 0, "bands must divide numHashes")

  def sigs: DataFrame = spark.read.parquet(s"$path/sigs")
  def banded: DataFrame = spark.read.parquet(s"$path/banded")

  private[dedup] def signatures(docs: DataFrame, idCol: String,
                                textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        org.apache.spark.sql.graft.TextExpressions
          .minhashSignature(col(textCol), shingleN, numHashes).as("sig"))

  private[dedup] def bandRows(sig: DataFrame): DataFrame = {
    val rowsPerBand = numHashes / bands
    val bandStructs = (0 until bands).map { b =>
      val hs = (0 until rowsPerBand).map(r =>
        element_at(col("sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(hs: _*).as("bh"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Estimated-Jaccard near-dup pairs between `newDocs` and everything
    * indexed so far, PLUS within-batch pairs — then the batch is
    * appended to the index. Ids already indexed are skipped (anti-join,
    * the same re-send contract as IvfIndex.addVectors). Cross-batch
    * pairs are oriented (least, greatest) by id — membership in the
    * batch, not id order, decides which side a doc joins from, so a
    * new doc with a SMALLER id than its historical dup still pairs.
    */
  def checkAndAdd(newDocs: DataFrame, idCol: String, textCol: String,
                  threshold: Double = 0.7): DataFrame = {
    val newSigs = signatures(newDocs, idCol, textCol)
      .join(sigs.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .localCheckpoint(true) // reused: bands, verify, and the append
    val newBanded = bandRows(newSigs)
    val bandEq = col("a.band") === col("b.band") && col("a.bh") === col("b.bh")
    val cross = banded.as("a")
      .join(broadcast(newBanded).as("b"),
        bandEq && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
    val within = newBanded.as("a")
      .join(broadcast(newBanded).as("b"),
        bandEq && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val cand = cross.union(within).distinct()
    val allSigs = sigs.union(newSigs)
    // fraction of equal components, row-local on candidate pairs only
    val matches = expr("aggregate(zip_with(_sig_a, _sig_b, (x, y) -> " +
      "CASE WHEN x = y THEN 1 ELSE 0 END), 0, (acc, v) -> acc + v)")
    val out = cand
      .join(allSigs.select(col("doc_id").as("doc_a"), col("sig").as("_sig_a")), "doc_a")
      .join(allSigs.select(col("doc_id").as("doc_b"), col("sig").as("_sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (matches.cast("double") / numHashes).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
      .localCheckpoint(true) // materialize BEFORE appending below: out
                             // reads sigs/ and banded/, and an append
                             // first would double-count the batch
    newSigs.write.mode("append").parquet(s"$path/sigs")
    bandRows(newSigs).write.mode("append")
      .partitionBy("band").parquet(s"$path/banded")
    out
  }
}

object LshIndex {

  /** Build the index over an initial corpus and persist it. */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
            shingleN: Int = 3, numHashes: Int = 64,
            bands: Int = 16): LshIndex = {
    val idx = new LshIndex(docs.sparkSession, path, shingleN, numHashes, bands)
    idx.signatures(docs, idCol, textCol)
      .write.mode("overwrite").parquet(s"$path/sigs")
    // band rows derive from the PERSISTED signatures: one signature
    // computation total, and the two tables cannot disagree
    idx.bandRows(idx.sigs)
      .write.mode("overwrite").partitionBy("band").parquet(s"$path/banded")
    idx
  }

  /** Open an existing index (parameters must match the build). */
  def load(spark: SparkSession, path: String, shingleN: Int = 3,
           numHashes: Int = 64, bands: Int = 16): LshIndex =
    new LshIndex(spark, path, shingleN, numHashes, bands)
}
