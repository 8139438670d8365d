package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for vector math over `array<double>` columns.
  *
  * Hosted under `org.apache.spark.sql` because `ImplicitCastInputTypes`'s
  * `inputTypes` signature and the Column<->Expression bridge
  * (`classic.ExpressionUtils`) are `private[sql]` — the standard idiom for
  * deep Catalyst extensions.
  *
  * Rationale: the higher-order-function formulation
  * (`aggregate(zip_with(...))`) is CodegenFallback — every element
  * evaluates through the interpreted expression tree, allocating per
  * element. These compile to a tight primitive loop inside whole-stage
  * codegen, while keeping the exact left-to-right double accumulation
  * order, so results stay bit-identical to the HOF form and to any engine
  * that folds sequentially.
  *
  * Null semantics: null array → null result (null-intolerant); elements
  * are assumed non-null (embedding vectors).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $s = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $s += $a.getDouble($i) * $b.getDouble($i);
        |}
        |${ev.value} = $s;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity with the fixed formula dot(a,b)/sqrt(dot(a,a)*dot(b,b)),
  * all three folds sequential — one pass over both arrays.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      ab += xi * yi; aa += xi * xi; bb += yi * yi
      i += 1
    }
    ab / math.sqrt(aa * bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $xi = $a.getDouble($i);
        |  double $yi = $b.getDouble($i);
        |  $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
        |}
        |${ev.value} = $ab / java.lang.Math.sqrt($aa * $bb);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Element-wise difference a − b over the common prefix length — the
  * residual-vector primitive (IVF/PQ encode subtracts the assigned
  * centroid from every corpus vector). The `zip_with` formulation is not
  * just slower itself: ONE CodegenFallback expression expels the whole
  * projection from whole-stage codegen, so every OTHER expression in the
  * stage (cell-assignment cosines, PQ code argmins) drops to interpreted
  * eval WITHOUT subexpression elimination — observed as ~10-20x on the
  * IVF-PQ encode path. Output is an UnsafeArrayData built from a
  * primitive double[], no per-element boxing.
  */
case class VecSub(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_sub"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = x.getDouble(i) - y.getDouble(i); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val tmp = ctx.freshName("tmp")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double[] $tmp = new double[$n];
        |for (int $i = 0; $i < $n; $i++) {
        |  $tmp[$i] = $a.getDouble($i) - $b.getDouble($i);
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        |  .fromPrimitiveArray($tmp);
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Index of the best row of a (small, literal) centroid matrix for a
  * vector: argmax cosine (`l2 = false`, quantizer cell assignment) or
  * argmin squared-L2 (`l2 = true`, PQ code assignment), ties to the
  * LOWEST index, null when no row produces a comparable score (e.g.
  * all-NaN cosines on a zero vector) — bit-for-bit the semantics of the
  * `greatest`/`least` + first-match CASE chain it replaces.
  *
  * Why an expression and not the CASE chain: the chain re-evaluates the
  * k-way best inside EVERY conditional branch (Catalyst's subexpression
  * elimination does not cross `when` boundaries), and the resulting
  * generated method is large enough that HotSpot refuses to JIT it —
  * measured ~190 µs/row on a k=8, dim=64 assignment, ~40× interpreter
  * penalty on top of k× recompute. This loop is k·dim multiply-adds in a
  * method small enough to inline: ~0.5 µs/row for the same answer.
  *
  * Scores use the exact formulas of [[CosineSimilarity]] (ab/√(aa·bb))
  * and the fixed three-dot dist2 (aa − 2ab + bb), each a sequential
  * fold, so scores — and therefore argmax ties — are bit-identical to
  * the expression forms and to the DuckDB oracles.
  */
case class VecBestIndex(left: Expression, right: Expression, l2: Boolean)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(ArrayType(DoubleType)))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (l2) "vec_argmin_l2" else "vec_argmax_cos"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val m = b.asInstanceOf[ArrayData]
    var bestIdx = -1
    var best = 0.0
    var j = 0
    val rows = m.numElements()
    while (j < rows) {
      val y = m.getArray(j)
      val n = math.min(x.numElements(), y.numElements())
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        ab += xi * yi; aa += xi * xi; bb += yi * yi
        i += 1
      }
      val score =
        if (l2) -(aa - 2.0 * ab + bb) else ab / math.sqrt(aa * bb)
      if (bestIdx < 0) { if (score == score) { bestIdx = j; best = score } }
      else if (score > best) { bestIdx = j; best = score }
      j += 1
    }
    if (bestIdx < 0) null else bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, m) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val rows = ctx.freshName("rows")
      val y = ctx.freshName("y")
      val ab = ctx.freshName("ab"); val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi"); val sc = ctx.freshName("sc")
      val bi = ctx.freshName("bi"); val bs = ctx.freshName("bs")
      val scoreExpr =
        if (l2) s"-($aa - 2.0 * $ab + $bb)"
        else s"$ab / java.lang.Math.sqrt($aa * $bb)"
      s"""
        |int $bi = -1; double $bs = 0.0;
        |int $rows = $m.numElements();
        |for (int $j = 0; $j < $rows; $j++) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $y = $m.getArray($j);
        |  int $n = java.lang.Math.min($a.numElements(), $y.numElements());
        |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    double $xi = $a.getDouble($i);
        |    double $yi = $y.getDouble($i);
        |    $ab += $xi * $yi; $aa += $xi * $xi; $bb += $yi * $yi;
        |  }
        |  double $sc = $scoreExpr;
        |  if ($bi < 0) { if ($sc == $sc) { $bi = $j; $bs = $sc; } }
        |  else if ($sc > $bs) { $bi = $j; $bs = $sc; }
        |}
        |if ($bi < 0) { ${ev.isNull} = true; } else { ${ev.value} = $bi; }
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the native vector expressions. */
object VectorFunctions {
  private def lift(f: (Expression, Expression) => Expression)(
      a: Column, b: Column): Column =
    ExpressionUtils.column(
      f(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def vecDot(a: Column, b: Column): Column = lift(DotProduct.apply)(a, b)
  def vecCosine(a: Column, b: Column): Column = lift(CosineSimilarity.apply)(a, b)
  def vecSub(a: Column, b: Column): Column = lift(VecSub.apply)(a, b)
  def vecArgmaxCos(vec: Column, mat: Column): Column =
    lift(VecBestIndex(_, _, l2 = false))(vec, mat)
  def vecArgminL2(vec: Column, mat: Column): Column =
    lift(VecBestIndex(_, _, l2 = true))(vec, mat)
}
