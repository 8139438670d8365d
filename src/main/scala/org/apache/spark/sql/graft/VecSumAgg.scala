package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Elementwise sum of fixed-length long vectors in ONE aggregation buffer —
  * the exact-arithmetic reduction primitive for distributed linear algebra
  * (Gram matrices, co-occurrence vectors, centroid accumulation).
  *
  * The declarative alternative — `posexplode` the array then
  * `groupBy(pos).sum` — multiplies the shuffled row count by the vector
  * length and re-keys the data by position; this operator keeps the whole
  * vector in a primitive long array per partial aggregate, so the shuffle
  * carries one `n`-long buffer per partition, not `n` rows per input row.
  * Long (not double) elements are deliberate: integer addition is
  * associative-commutative, so results are bit-identical under any
  * partitioning — callers grid doubles to fixed-point first (the same
  * determinism contract as [[MinHashAgg]] / the Lloyd trainer).
  *
  * Rows whose array is null are skipped; null ELEMENTS are rejected (the
  * fixed-point contract has no null slot semantics). Overflow is the
  * caller's budget: n·max|v| per slot must stay under 2^63.
  *
  * Result: array<long> of length n; all-zero for an empty group.
  */
case class VecSumAgg(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(n >= 1, "vector length must be >= 1")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_sum_agg"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == n,
        s"vec_sum_agg($n) got a length-${arr.numElements()} vector")
      var i = 0
      while (i < n) {
        buf(i) += arr.getLong(i)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) {
      buf(i) += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * n)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(n)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSumAgg =
    copy(child = newChild)
}

object VecSumAgg {
  def of(c: Column, n: Int): Column =
    ExpressionUtils.column(
      VecSumAgg(ExpressionUtils.expression(c), n).toAggregateExpression())
}
