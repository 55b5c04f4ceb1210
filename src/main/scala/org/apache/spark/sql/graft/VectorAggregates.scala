package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Per-dimension running sums + non-null counts for [[VectorMean]].
  * Arrays grow to the longest vector seen, so ragged inputs aggregate
  * like the posexplode reference (each dimension averages over the
  * vectors that HAVE it).
  */
final class VectorMeanBuffer(var sums: Array[Double], var counts: Array[Long]) {
  def ensure(n: Int): Unit = if (n > sums.length) {
    sums = java.util.Arrays.copyOf(sums, n)
    counts = java.util.Arrays.copyOf(counts, n)
  }
}

/** Element-wise mean of a double-array column — ONE map-side-combining
  * aggregate instead of the `posexplode -> groupBy(key, dim) ->
  * groupBy(key)` shape, which amplifies the corpus x dim through an
  * exchange (64-dim embeddings = 64x the rows, twice) just to average
  * per dimension. This is the centroid-update primitive of the k-means
  * / IVF family: per-cid vector means in a single pass whose partial
  * state is one (sums, counts) pair of dim-length arrays per group.
  *
  * Semantics match the posexplode reference exactly:
  *   - null vectors contribute nothing;
  *   - a null ELEMENT is skipped for its dimension only (avg ignores
  *     nulls), so each dimension divides by its own non-null count;
  *   - ragged lengths average per dimension over the vectors that have
  *     it; a dimension with no observations yields a null element;
  *   - a group with no non-null vectors yields null (the posexplode
  *     pipeline emits no row at all — callers treat both as "no mean").
  */
case class VectorMean(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VectorMeanBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "vector_mean"

  override def createAggregationBuffer(): VectorMeanBuffer =
    new VectorMeanBuffer(Array.emptyDoubleArray, Array.emptyLongArray)

  override def update(buf: VectorMeanBuffer, input: InternalRow): VectorMeanBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      buf.ensure(n)
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          buf.sums(i) += arr.getDouble(i)
          buf.counts(i) += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: VectorMeanBuffer, b: VectorMeanBuffer): VectorMeanBuffer = {
    a.ensure(b.sums.length)
    var i = 0
    while (i < b.sums.length) {
      a.sums(i) += b.sums(i)
      a.counts(i) += b.counts(i)
      i += 1
    }
    a
  }

  override def eval(buf: VectorMeanBuffer): Any = {
    val n = buf.sums.length
    if (n == 0) return null
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = if (buf.counts(i) == 0) null
               else java.lang.Double.valueOf(buf.sums(i) / buf.counts(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: VectorMeanBuffer): Array[Byte] = {
    val n = buf.sums.length
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.sums(i)); i += 1 }
    i = 0
    while (i < n) { bb.putLong(buf.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorMeanBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val sums = new Array[Double](n)
    val counts = new Array[Long](n)
    var i = 0
    while (i < n) { sums(i) = bb.getDouble; i += 1 }
    i = 0
    while (i < n) { counts(i) = bb.getLong; i += 1 }
    new VectorMeanBuffer(sums, counts)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMean =
    copy(child = newChild)
}

/** Fixed-width histogram counts of a cell-index column — the
  * MERGE-ABLE quantile-sketch primitive behind the skew-robust rolling
  * median (r16, verdict-r15 item 5). The buffer is one long[nCells]
  * vector: update is O(1) (bump one cell), merge is element-wise add —
  * a monoid, so the [[graft.operators.TimeSeriesOps.cRollingScalable]]
  * prefix/suffix bucket decomposition applies to quantiles exactly as
  * it does to min/max/sum. Evaluated over a GROWING window frame Spark
  * feeds it one row at a time (no per-row frame rescan), so per-key
  * work is O(rows x nCells) regardless of frame width — where the
  * exact frame form (collect_list + sort) is O(rows x frame-rows) and
  * one dense hot key serializes into a straggler task.
  *
  * Semantics: null cells are skipped (they carry no order position);
  * out-of-range cells are the CALLER's bug (clamp before calling);
  * a group that saw no rows at all evaluates to null. This is a
  * fixed-universe degenerate of a KLL/t-digest sketch: rank error is
  * bounded by the grid resolution instead of adapting to the data,
  * which is the right trade when the value range is known from one
  * linear pre-pass (the ts_mad grid convention).
  */
final class CellCountsBuffer(var counts: Array[Long]) {
  def ensure(n: Int): Unit =
    if (counts.length < n) counts = java.util.Arrays.copyOf(counts, n)
}

case class CellCounts(child: Expression, nCells: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CellCountsBuffer]
  with ImplicitCastInputTypes with UnaryLike[Expression] {
  require(nCells > 0, s"nCells must be positive, got $nCells")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.IntegerType)
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "cell_counts"

  override def createAggregationBuffer(): CellCountsBuffer =
    new CellCountsBuffer(Array.emptyLongArray)

  override def update(buf: CellCountsBuffer, input: InternalRow): CellCountsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val c = v.asInstanceOf[Int]
      require(c >= 0 && c < nCells, s"cell $c out of [0, $nCells)")
      buf.ensure(nCells)
      buf.counts(c) += 1
    }
    buf
  }

  override def merge(a: CellCountsBuffer, b: CellCountsBuffer): CellCountsBuffer = {
    a.ensure(b.counts.length)
    var i = 0
    while (i < b.counts.length) { a.counts(i) += b.counts(i); i += 1 }
    a
  }

  override def eval(buf: CellCountsBuffer): Any = {
    if (buf.counts.length == 0) return null
    // pad to the full grid so consumers can zip prefix/suffix blindly;
    // UnsafeArrayData keeps the longs primitive (a GenericArrayData
    // would box 512 Longs per row per window — pure GC pressure on
    // the rolling-median hot path)
    val out = new Array[Long](nCells)
    System.arraycopy(buf.counts, 0, out, 0, buf.counts.length)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override def serialize(buf: CellCountsBuffer): Array[Byte] = {
    val n = buf.counts.length
    val bb = ByteBuffer.allocate(4 + 8 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(buf.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CellCountsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val counts = new Array[Long](n)
    var i = 0
    while (i < n) { counts(i) = bb.getLong; i += 1 }
    new CellCountsBuffer(counts)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CellCounts =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CellCounts =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CellCounts =
    copy(child = newChild)
}

object VectorAggregates {
  /** Element-wise mean of a double-array column as a single
    * map-side-combining aggregate (null elements skipped per
    * dimension, null when the group saw no vectors).
    */
  def vectorMean(c: Column): Column =
    ExpressionUtils.column(
      VectorMean(ExpressionUtils.expression(c)).toAggregateExpression())

  /** long[nCells] histogram of a clamped cell-index column (null cells
    * skipped; null when the group saw no rows) — the merge-able
    * rolling-quantile primitive (see [[CellCounts]]).
    */
  def cellCounts(c: Column, nCells: Int): Column =
    ExpressionUtils.column(
      CellCounts(ExpressionUtils.expression(c), nCells).toAggregateExpression())
}
