package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All k MinHash signature slots in ONE aggregation buffer (k longs).
  *
  * The declarative alternative — k separate `min(xxhash64(lit(j), x))`
  * columns — plans k aggregate expressions and hashes the input string k
  * times per row; at production signature widths (k=128) that is 128
  * aggregation expressions in every partial and final aggregate. This
  * operator hashes each input ONCE (xxhash64, seed 42) and derives the k
  * per-slot hashes with a splitmix64 finalizer over slot-salted values —
  * the standard "one strong hash + cheap universal family" MinHash
  * construction — then keeps a running min per slot in a primitive long
  * array.
  *
  * Engine-specific by design (like HyperLogLog++): the fast production path
  * gets a rows-only gate; the portable md5 formulation remains the
  * oracle-checked companion (Dedup.minHashLsh(portable = true)).
  *
  * Result: array<long> of length k; slot j = min over inputs of h_j(x),
  * Long.MaxValue for slots of an empty group.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 1, "signature length must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = XxHash64Function.hash(v, StringType, 42L)
      var j = 0
      while (j < k) {
        val h = MinHashAgg.mix(base + j * MinHashAgg.Gamma)
        if (h < buf(j)) buf(j) = h
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) {
      if (other(j) < buf(j)) buf(j) = other(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

object MinHashAgg {
  /** Weyl-sequence increment (golden-ratio gamma) salting each slot. */
  final val Gamma = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer — full-avalanche bijection on Long. */
  def mix(z0: Long): Long = {
    var z = z0 + Gamma
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def of(c: Column, k: Int): Column =
    ExpressionUtils.column(
      MinHashAgg(ExpressionUtils.expression(c), k).toAggregateExpression())
}
