package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for graft's vector kernels.
  *
  * Lives under `org.apache.spark.sql` because the expression-to-Column
  * bridge (`classic.ExpressionUtils`) and `TypeCollection` are
  * `private[sql]` in Spark 4 — the standard extension-library packaging
  * for custom expressions.
  *
  * The higher-order-function formulation (`zip_with` + `aggregate`)
  * allocates an intermediate array per row; on O(n²) similarity-join
  * paths that allocation dominates. These expressions evaluate the same
  * left-to-right double-accumulation loop (bit-identical results — the
  * DuckDB oracle contract is preserved) inside whole-stage codegen with
  * zero allocation. Element access adapts to float or double arrays, so
  * the same expression serves raw embeddings (`array<float>`) and
  * computed centroids (`array<double>`).
  */
abstract class VecFoldExpression extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType

  // null on length mismatch AND on any null element — matches the
  // higher-order-function formulation exactly (zip_with null-pads the
  // shorter array; a null element nulls its product; null propagates
  // through the fold), so RewriteHofDotProduct is semantics-preserving
  // even on ArrayType(..., containsNull = true) inputs.
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private def mayHaveNulls(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  @transient private lazy val leftFloat = isFloat(left)
  @transient private lazy val rightFloat = isFloat(right)
  @transient private lazy val anyNullableElems = mayHaveNulls(left) || mayHaveNulls(right)

  private def get(fl: Boolean, arr: ArrayData, i: Int): Double =
    if (fl) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected def getterJava(e: Expression, arr: String, i: String): String =
    if (isFloat(e)) s"(double)$arr.getFloat($i)" else s"$arr.getDouble($i)"

  /** Per-element accumulation term given element expressions x, y. */
  protected def combineJava(x: String, y: String): String
  protected def combine(x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (anyNullableElems && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += combine(get(leftFloat, x, i), get(rightFloat, y, i))
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // the per-element null check is emitted only when the schema says
      // elements may be null — containsNull=false keeps the tight loop
      val nullCheck =
        if (anyNullableElems)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += ${combineJava(getterJava(left, a, i), getterJava(right, b, i))};
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $s;
         |  }
         |}
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — codegen'd dot product. */
case class VecDot(left: Expression, right: Expression) extends VecFoldExpression {
  protected def combineJava(x: String, y: String): String = s"$x * $y"
  protected def combine(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² — codegen'd squared L2 distance. */
case class VecSqDist(left: Expression, right: Expression) extends VecFoldExpression {
  protected def combineJava(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  protected def combine(x: Double, y: Double): Double = (x - y) * (x - y)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Static kernel for the φ-harmonic weighted cosine — the float64 loop
  * of `similarity.py:52-74` operating directly on [[ArrayData]] (no
  * per-row Seq materialization, no UDF encoder round-trip). Generated
  * code calls this one static method — the same pattern Spark built-ins
  * use for nontrivial kernels (e.g. UTF8String ops).
  */
object PhiKernel {
  /** φⁿ for n in [-3, 6] — the reference's harmonic anchor set. */
  val PhiPowers: Array[Double] =
    (-3 to 6).map(n => math.pow((1.0 + math.sqrt(5.0)) / 2.0, n)).toArray

  def phiWeighted(x: ArrayData, y: ArrayData, xFloat: Boolean, yFloat: Boolean): Double = {
    val n = x.numElements()
    val wRaw = new Array[Double](n)
    var wSum = 0.0
    var i = 0
    while (i < n) {
      val a = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val b = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val avgMag = (math.abs(a) + math.abs(b)) / 2.0 + 1e-12
      var minD = Double.MaxValue
      var p = 0
      while (p < PhiPowers.length) {
        val dd = math.abs(avgMag - PhiPowers(p))
        if (dd < minD) minD = dd
        p += 1
      }
      wRaw(i) = 1.0 / (minD + 1e-8)
      wSum += wRaw(i)
      i += 1
    }
    val norm = wSum + 1e-12
    var dot = 0.0; var na = 0.0; var nb = 0.0
    i = 0
    while (i < n) {
      val a = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val b = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val w = wRaw(i) / norm
      val wa = a * w
      val wb = b * w
      dot += wa * wb; na += wa * wa; nb += wb * wb
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb) + 1e-12)
  }
}

/** φ-weighted cosine as a native expression — replaces the one UDF that
  * sat on a search path. Same null contract as [[VecFoldExpression]]:
  * null on length mismatch, null on null elements (checked only when
  * the schema allows them).
  */
case class VecPhiSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def mayHaveNulls(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].containsNull

  @transient private lazy val leftFloat = isFloat(left)
  @transient private lazy val rightFloat = isFloat(right)
  @transient private lazy val anyNullableElems = mayHaveNulls(left) || mayHaveNulls(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    if (anyNullableElems) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        i += 1
      }
    }
    PhiKernel.phiWeighted(x, y, leftFloat, rightFloat)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val nullCheck =
        if (anyNullableElems)
          s"""for (int $i = 0; $i < $n; $i++) {
             |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
             |}""".stripMargin
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  $nullCheck
         |  if (!${ev.isNull}) {
         |    ${ev.value} = org.apache.spark.sql.graftx.PhiKernel.phiWeighted(
         |      $a, $b, $leftFloat, $rightFloat);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VecExpressions {
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def vecSqDist(a: Column, b: Column): Column =
    ExpressionUtils.column(VecSqDist(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def vecPhiSim(a: Column, b: Column): Column =
    ExpressionUtils.column(VecPhiSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
