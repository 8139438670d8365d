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

/** Column-API entry points for the native vector expressions. */
object VectorFunctions {
  private def lift(f: (Expression, Expression) => Expression)(
      a: Column, b: Column): Column =
    ExpressionUtils.column(
      f(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def vecDot(a: Column, b: Column): Column = lift(DotProduct.apply)(a, b)
  def vecCosine(a: Column, b: Column): Column = lift(CosineSimilarity.apply)(a, b)
}
