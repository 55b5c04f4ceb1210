package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column wrappers over Spark's own runtime-filter Bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind `spark.sql.optimizer.runtime.bloomFilter.enabled`), which
  * Spark registers for internal use but does not expose through
  * `functions._`. Both sides key on a caller-supplied LONG hash (pair
  * them with `xxhash64`): the aggregate `putLong`s each value into a
  * bits-bounded filter with map-side partials OR-merged (bitwise OR is
  * commutative, so the built filter is deterministic regardless of
  * partitioning), and the probe is a row-local `mightContainLong`
  * against the filter bytes embedded as a foldable literal
  * (`BloomFilterMightContain` requires a constant or scalar-subquery
  * filter side — an attribute from a cross-joined 1-row frame fails
  * its input check by design).
  */
object BloomFunctions {

  /** Aggregate a LONG hash column into serialized Bloom filter bytes.
    * `numBits` bounds the filter (and therefore driver/executor
    * buffer) size: numBits/8 bytes regardless of input cardinality.
    */
  def bloomFilterAgg(valueHash: Column, expectedItems: Long,
                     numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(valueHash),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Row-local membership probe of a LONG hash against filter bytes
    * (no false negatives; false-positive rate set by the build's
    * numBits-per-item). Null filter bytes (empty build side) and null
    * hashes both yield null, matching Spark's runtime-filter
    * semantics.
    */
  def mightContain(bloom: Array[Byte], valueHash: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ExpressionUtils.expression(valueHash)))
}
