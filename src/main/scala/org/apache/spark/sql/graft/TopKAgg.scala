package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Per-group top-k as a true AGGREGATE: keep the `k` smallest values of
  * `child` under its natural (lexicographic, for structs) ordering in a
  * bounded heap — callers encode "largest first" by negating sort fields.
  *
  * Why not the window form (`row_number().over(...)  <= k`)? Spark 4's
  * WindowGroupLimit already prunes that map-side, but it still SORTS every
  * partition (O(n log n)) and yields rows that must be re-windowed for
  * ranks. This aggregate heap-scans (O(n log k), no sort), ships at most
  * k·|groups| values per partition into the exchange (map-side partial
  * merge like any aggregate), and returns each group's shortlist as ONE
  * ordered array — the shape per-key shortlist consumers (beam search,
  * per-user recommendation cuts, per-query rerank sets) want anyway.
  *
  * Result: array of the group's k smallest values, ascending; empty array
  * for an empty group. Deterministic whenever `child` values are distinct
  * (include a tiebreak field in the struct, as with any top-k).
  *
  * Serialization mirrors Spark's own `Collect`: the buffer travels as one
  * UnsafeRow holding an array of `child.dataType`.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]]
  with UnaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    TypeUtils.checkForOrderingExpr(child.dataType, prettyName)

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  @transient private lazy val projection = UnsafeProjection.create(
    Array[DataType](ArrayType(child.dataType, containsNull = false)))

  /** Max-heap over the kept k-smallest: head = current worst, O(log k)
    * eviction.
    */
  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](ord)

  private def keep(q: mutable.PriorityQueue[Any], v: Any): Unit =
    if (q.size < k) q.enqueue(v)
    else if (ord.lt(v, q.head)) { q.dequeue(); q.enqueue(v) }

  override def update(q: mutable.PriorityQueue[Any],
                      input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    // copy: eval may return views into reused row buffers
    if (v != null) keep(q, InternalRow.copyValue(v))
    q
  }

  override def merge(q: mutable.PriorityQueue[Any],
                     other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(keep(q, _))
    q
  }

  override def eval(q: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(q.toArray.sorted(ord))

  override def serialize(q: mutable.PriorityQueue[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(q.toArray)))
      .getBytes

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val q = createAggregationBuffer()
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    var i = 0
    while (i < arr.numElements()) {
      q.enqueue(InternalRow.copyValue(arr.get(i, child.dataType)))
      i += 1
    }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}

object TopKAgg {
  def of(c: Column, k: Int): Column =
    ExpressionUtils.column(
      TopKAgg(ExpressionUtils.expression(c), k).toAggregateExpression())
}
