package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression for the dot product of two double-array
  * columns, with whole-stage codegen.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: higher-order
  * functions are CodegenFallback — every row allocates intermediate
  * ArrayData and evaluates the lambda interpreter-style. On the
  * similarity hot path (cosine per corpus row, 100 TB of embeddings)
  * that measured ~10x slower than this tight primitive loop, which
  * stays inside whole-stage codegen with zero allocation.
  */
case class VectorDotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot"

  // Length-mismatched arrays yield null (same convention as zero-norm
  // cosine): a silently truncated dot over a corrupt/mixed-dimension
  // embedding would feed a plausible-looking similarity into the
  // dedup/ANN thresholds built on top (ADVICE r2).
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VectorDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity: dot(a,b), |a| and |b| accumulated in ONE
  * loop over the arrays (vs three separate dot-product traversals).
  * Zero-norm and length-mismatched inputs yield null — a degenerate or
  * corrupt embedding must not abort a 100 TB job, and must not produce
  * a plausible-looking truncated similarity either (ADVICE r1/r2).
  */
case class VectorCosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi"); val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = $a.getDouble($i); double $yi = $b.getDouble($i);
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VectorCosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Row-local hyperplane-LSH banding: all `planes.length` sign bits of
  * one embedding row, packed into `numPlanes / bitsPerBand` band
  * values, in ONE expression — the [[NearestCentroidIds]] /
  * MinHashSignature shape applied to sign-LSH.
  *
  * Why not `numBits` separate `when(vectorDot(v, plane) > 0, ...)`
  * columns summed into band values: that 64-dot expression tree blows
  * past the whole-stage-codegen budget, so the WHOLE projection falls
  * back to interpreted eval — measured 1.8 s of the 2.9 s dedup_embed
  * wall at sf0.1, on 2000 rows. Here the generated code calls
  * [[bandValues]], a tight primitive loop over an embedded plane
  * matrix, and the surrounding operators stay in codegen.
  *
  * Bit-compatibility with the replaced formulation: dots accumulate
  * left-to-right (the VectorDotProduct order); bit j of band b is
  * `dot(v, planes(b·bitsPerBand + j)) > 0` (NaN and a length-mismatched
  * vector give bit 0, exactly like `when(null > 0, ...)`). One
  * DELIBERATE divergence: a NULL vector now yields a null array (no
  * band rows after posexplode) instead of the old all-zero bands —
  * bucketing every null-vector doc together was the same null-collapse
  * the Bloom gate fixed.
  *
  * `planes` is a Seq-of-Seq so case-class equality is structural and
  * plan canonicalization still recognizes identical bandings.
  */
case class HyperplaneBandValues(child: Expression,
                                planes: Seq[Seq[Double]], bitsPerBand: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(planes.nonEmpty && planes.length % bitsPerBand == 0,
    s"numBits (${planes.length}) must be a positive multiple of " +
      s"bitsPerBand ($bitsPerBand)")
  require(bitsPerBand >= 1 && bitsPerBand <= 63,
    s"bitsPerBand must be in [1, 63], got $bitsPerBand")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hyperplane_band_values"

  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  @transient private lazy val planeDim: Int = planeArr(0).length

  /** Pack one row's sign bits into band values; called per row from
    * both interpreted eval and the generated code.
    */
  def bandValues(v: ArrayData): ArrayData = {
    val nBands = planeArr.length / bitsPerBand
    val out = new Array[Long](nBands)
    if (v.numElements() == planeDim) {
      var p = 0
      while (p < planeArr.length) {
        val pl = planeArr(p)
        var dot = 0.0
        var i = 0
        while (i < planeDim) { dot += v.getDouble(i) * pl(i); i += 1 }
        if (dot > 0) out(p / bitsPerBand) |= 1L << (p % bitsPerBand)
        p += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(input: Any): Any =
    bandValues(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hyperplaneBands", this,
      classOf[HyperplaneBandValues].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $self.bandValues($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBandValues =
    copy(child = newChild)
}

/** lo+up median-cell index sum of a two-part grid histogram — the
  * row-local back half of the skew-robust rolling median (r16): given
  * the prefix and suffix count vectors and the frame's non-null count
  * n, one compiled pass finds the lower/upper median cells (smallest
  * cells whose cumulative count reaches ceil(n/2) and floor(n/2)+1 —
  * integer reach arithmetic, the ts_mad convention) and returns
  * lo + up, from which the caller's estimate is
  * gmin + (lo + up + 1) · cellWidth / 2.
  *
  * Why an expression and not `zip_with` + `aggregate`: higher-order
  * functions are CodegenFallback and evaluate their lambda
  * interpreter-style PER ELEMENT — at 512 cells x 3 passes per row
  * that measured ~10 s on a 10k-row fixture (guide §4); this loop is
  * one compiled pass with zero allocation. n <= 0 returns 0 (the
  * caller's minPeriods gate nulls the estimate before it is read).
  * Histograms shorter than the other's length are read as
  * zero-padded; both null-intolerant inputs are coalesced upstream.
  */
case class GridMedianCellSum(first: Expression, second: Expression,
                             third: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
  with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType),
      org.apache.spark.sql.types.LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  override def prettyName: String = "grid_median_cell_sum"

  def cellSum(pRaw: Any, sRaw: Any, n: Long): Long = {
    if (n <= 0) return 0L
    val p = pRaw.asInstanceOf[ArrayData]
    val s = sRaw.asInstanceOf[ArrayData]
    val np = p.numElements()
    val ns = s.numElements()
    val len = math.max(np, ns)
    val rLo = (n + 1) / 2
    val rUp = n / 2 + 1
    var cum = 0L
    var lo = -1L
    var up = -1L
    var i = 0
    while (i < len && up < 0) {
      cum += (if (i < np) p.getLong(i) else 0L) +
        (if (i < ns) s.getLong(i) else 0L)
      if (lo < 0 && cum >= rLo) lo = i
      if (up < 0 && cum >= rUp) up = i
      i += 1
    }
    lo + up
  }

  override protected def nullSafeEval(p: Any, s: Any, n: Any): Any =
    cellSum(p, s, n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("gridMedianCellSum", this,
      classOf[GridMedianCellSum].getName)
    nullSafeCodeGen(ctx, ev,
      (p, s, n) => s"${ev.value} = $self.cellSum($p, $s, $n);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): GridMedianCellSum =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VectorExpressions {
  /** Codegen'd dot product of two array<double> columns. */
  def vectorDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorDotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd packed sign-LSH band values of an array<double> column
    * against an embedded hyperplane matrix.
    */
  def hyperplaneBands(v: Column, planes: Seq[Seq[Double]],
                      bitsPerBand: Int): Column =
    ExpressionUtils.column(HyperplaneBandValues(
      ExpressionUtils.expression(v.cast(ArrayType(DoubleType))),
      planes, bitsPerBand))

  /** Codegen'd single-pass cosine similarity (null on zero norms). */
  def vectorCosine(a: Column, b: Column): Column =
    ExpressionUtils.column(VectorCosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Codegen'd lo+up median-cell sum of a two-part grid histogram
    * (see [[GridMedianCellSum]]).
    */
  def gridMedianCellSum(prefix: Column, suffix: Column, n: Column): Column =
    ExpressionUtils.column(GridMedianCellSum(
      ExpressionUtils.expression(prefix),
      ExpressionUtils.expression(suffix),
      ExpressionUtils.expression(n)))
}
