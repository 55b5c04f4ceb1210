package graft.mix

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for LLM training pipelines: deterministic
  * sampling, per-source mixture weighting, and sequence packing — the
  * curation steps that sit between dedup/quality filtering and the
  * trainer.
  *
  * Scale design (100 TB): sampling and mixing are pure row-local
  * filters (no shuffle — the predicate is pushable work over the scan);
  * packing is one window prefix-sum per shard. Everything is exact
  * integer arithmetic, so a re-run over the same corpus reproduces the
  * same dataset bit-for-bit — reproducibility is a correctness
  * requirement for training-data lineage, which is why none of these
  * use `rand()`.
  */
object Mix {

  /** Deterministic uniform in [0,1) from an integer id: Knuth
    * multiplicative hashing (TAOCP vol. 3 §6.4) — `(id * 2654435761)
    * mod 2^32`, scaled. Exact 64-bit integer arithmetic, so the value
    * is portable across engines (unlike engine-native hash builtins,
    * which differ between Spark, DuckDB, and pandas and would make
    * sampled datasets irreproducible off-Spark).
    */
  def hashUniform(id: Column): Column =
    pmod(id * lit(2654435761L), lit(4294967296L)) / lit(4294967296.0)

  /** Reproducible Bernoulli sampling: keep rows whose [[hashUniform]]
    * falls under `rate`. A pure filter — no shuffle, no state, stable
    * under re-runs and partition changes (rand()-based sampling is
    * neither). Different non-overlapping samples of the same corpus
    * come from disjoint [lo, hi) slices of the hash space.
    */
  def sampleByHash(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(hashUniform(col(idCol)) < rate)

  /** Data mixing by per-source rates: each source is down/up-weighted
    * by its own Bernoulli rate from a small dim table `(sourceCol,
    * rate)` — the "mixture weights" step of corpus assembly. The dim is
    * broadcast (sources number in the hundreds, never corpus-scale) so
    * the whole operator is scan + broadcast-hash-join + row-local
    * filter: no shuffle of the corpus.
    */
  def mixBySourceRates(df: DataFrame, idCol: String, sourceCol: String,
                       rates: DataFrame): DataFrame =
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(hashUniform(col(idCol)) < col("rate"))
      .drop("rate")

  /** Sequence packing: assign documents to fixed-capacity token bins
    * ("packs") for training-batch assembly. Per shard, documents are
    * laid out in deterministic `idCol` order; each doc's `tok_offset`
    * is the running token count before it, and its pack is
    * `tok_offset / capacity`.
    *
    * This is OFFSET packing, the distributed-friendly strategy: one
    * window prefix-sum per shard, order-stable and reproducible. A pack
    * can overflow by at most its last document (the trainer's chunker
    * absorbs the straddle). Exact greedy first-fit ("close the bin
    * when the next doc would overflow") is inherently a sequential scan
    * per shard — at 100 TB that is the wrong trade against a single
    * codegen'd window pass.
    */
  def packSequences(df: DataFrame, shardCol: String, idCol: String,
                    tokenCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("tok_offset",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)).cast("long"))
      .withColumn("pack_id", (col("tok_offset") / capacity).cast("long"))
  }
}
