package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines (SURVEY §2
  * G1-G5).
  *
  * Scale design (100 TB): signatures are computed row-local in one
  * projection (whole-stage codegen, no UDFs); candidate generation is
  * always a bounded equi-join on (band, hash) buckets — never an
  * all-pairs product. The only shuffles are the band-bucket join and
  * the final distinct.
  */
object Dedup {

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val words = split(text, " ")
    array_distinct(transform(
      sequence(lit(1), greatest(size(words) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(words, i, lit(n)))))
  }

  /** Exact Jaccard similarity of two string-array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** G1: exact dedup via content hash — one hash-shuffle groupBy on
    * sha2(text); survivor = smallest id.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
      .select(col("keep_id"), col("n_dups"))

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min of xxhash64(seed, shingle) over the shingle set. Row-local.
    */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleCol, s => xxhash64(i, s))))

  /** G2: MinHash + banded LSH near-dup pairs.
    *
    * numHashes signature positions grouped into `bands` bands; docs
    * sharing any band-hash become candidates (equi-join on (band,
    * bandHash) — shuffle bounded by bands x rows); candidates are
    * verified with exact shingle Jaccard >= threshold.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 64, bands: Int = 16,
                 threshold: Double = 0.7): DataFrame = {
    val rows = bands.ensuring(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sh = docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol), shingleN).as("sh"))
    val sig = sh.select(col("doc_id"), col("sh"),
      minhashSignature(col("sh"), numHashes).as("sig"))
    val banded = sig.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("bh"))))
        .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val shA = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    cand.join(shA, "doc_a").join(shB, "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over the word multiset, materialized as per-bit
    * vote counts in a single aggregate pass (one array of 64 +/-1
    * contributions per word, summed with zip_with).
    */
  private def simhashCounts(words: Column): Column = {
    val zeros = array((0 until 64).map(_ => lit(0L)): _*)
    aggregate(words, zeros, (acc, w) => {
      val contribs = array((0 until 64).map(j =>
        shiftright(xxhash64(w), j).bitwiseAND(lit(1L)) * 2L - 1L): _*)
      zip_with(acc, contribs, (a, b) => a + b)
    })
  }

  /** SimHash as a 64-char bit string plus 4 x 16-bit band values. */
  def simhashBands(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counts = simhashCounts(split(col(textCol), " "))
    val bits = array_join(transform(counts, c =>
      when(c > 0, lit("1")).otherwise(lit("0"))), "")
    val withBits = docs.select(col(idCol).as("doc_id"), bits.as("bits"))
    (0 until 4).foldLeft(withBits)((d, b) =>
      d.withColumn(s"band$b",
        conv(substring(col("bits"), b * 16 + 1, 16), 2, 10).cast("long")))
  }

  /** G3: SimHash near-dup pairs — candidates share at least one 16-bit
    * band (equi-join per band), verified by total Hamming distance
    * (sum of bit_count over the xor'd bands) <= maxHamming.
    */
  def simhashNearDup(docs: DataFrame, idCol: String, textCol: String,
                     maxHamming: Int = 8): DataFrame = {
    val sb = simhashBands(docs, idCol, textCol)
    val banded = sb.select(col("doc_id"), col("band0"), col("band1"),
      col("band2"), col("band3"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), col(s"band$b").as("bv"))): _*)).as("bb"))
      .select(Seq(col("doc_id")) ++ (0 until 4).map(b => col(s"band$b")) ++
        Seq(col("bb.band").as("band"), col("bb.bv").as("bv")): _*)
    val a = banded.as("a")
    val b = banded.as("b")
    val hamming = (0 until 4)
      .map(i => bit_count(col(s"a.band$i").bitwiseXOR(col(s"b.band$i"))))
      .reduce(_ + _)
    a.join(b, col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** G4: blocked n-gram Jaccard verify — exact Jaccard over word
    * n-grams for candidate pairs inside a blocking key (e.g. source),
    * never across the full corpus.
    */
  def blockedJaccard(docs: DataFrame, idCol: String, textCol: String,
                     blockCol: String, shingleN: Int = 3,
                     threshold: Double = 0.3): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"), col(blockCol).as("blk"),
      shingles(col(textCol), shingleN).as("sh"))
    sh.as("a").join(sh.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        jaccard(col("a.sh"), col("b.sh")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
