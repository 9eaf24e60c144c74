package graft.expressions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `collect_list` with a hard per-group element cap (SURVEY.md §2 G8).
  *
  * The inverted-index dedup shape needs, per shingle, BOTH the exact
  * document frequency and — only when that frequency is small — the
  * document list. Plain `collect_list` buffers every element, so one
  * hot shingle ("the quick brown" across a 100 TB corpus) builds a
  * multi-million-element aggregation buffer before the df filter throws
  * it away. This aggregate stops appending at `max` elements: groups at
  * or under the cap collect exactly their full element set; groups over
  * it carry a truncated buffer (callers must filter those out via an
  * exact count — which IS the dedup semantics). Buffer memory is
  * O(max) per group on every partial-aggregation path.
  *
  * Element ORDER within a buffer depends on merge order and is only
  * deterministic as a SET for under-cap groups — callers must treat it
  * as one (the dedup pipeline explodes to unordered pairs).
  */
case class BoundedCollectList(
    child: Expression,
    max: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[Any]] {

  require(max > 0, "bounded_collect cap must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType,
    containsNull = false)
  override def prettyName: String = "graft_bounded_collect"

  override def createAggregationBuffer(): ArrayBuffer[Any] =
    new ArrayBuffer[Any]

  override def update(buf: ArrayBuffer[Any],
                      input: InternalRow): ArrayBuffer[Any] = {
    if (buf.length < max) {
      val v = child.eval(input)
      if (v != null) {
        // copy unsafe-backed values: the input row's buffers are reused
        buf += InternalRow.copyValue(v)
      }
    }
    buf
  }

  override def merge(buf: ArrayBuffer[Any],
                     other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    val room = max - buf.length
    if (room >= other.length) buf ++= other
    else if (room > 0) buf ++= other.take(room)
    buf
  }

  override def eval(buf: ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  private lazy val projection =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(Array[DataType](dataType))

  override def serialize(buf: ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(eval(buf))).getBytes

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    val out = new ArrayBuffer[Any](arr.numElements())
    var i = 0
    while (i < arr.numElements()) {
      out += InternalRow.copyValue(arr.get(i, child.dataType))
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BoundedCollectList =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollectList =
    copy(child = newChildren.head)
}

object BoundedCollectList {
  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** Column API: bounded collect_list aggregate. */
  def boundedCollect(c: Column, max: Int): Column =
    GraftColumnBridge.column(
      BoundedCollectList(GraftColumnBridge.expression(c), max)
        .toAggregateExpression())
}
