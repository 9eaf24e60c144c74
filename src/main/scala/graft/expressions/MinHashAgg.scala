package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** All-in-one MinHash signature aggregate (SURVEY.md §2 G11): for a
  * group of pre-hashed shingles, the element-wise minimum of the
  * `numHashes`-member affine family `(2i+1)·h + (i·40503+13 mod P) mod
  * P` — bit-identical to the 64-separate-`min(affine(i,h))` aggregate
  * formulation (and to the DuckDB oracle's list_min rebuild), computed
  * in ONE aggregate with a long[numHashes] buffer.
  *
  * Why not 64 declarative min() aggs: each is its own aggregate
  * expression — the generated update code is enormous (the dominant
  * COLD cost of the dedup pipeline was compiling it) and every agg
  * re-evaluates its own affine transform expression tree. Here update
  * is one child eval plus a tight multiply-add-min loop, the buffer is
  * a primitive array, and partial aggregation still applies (merge =
  * element-wise min, fully associative/commutative).
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numHashes > 0)
  private val P = graft.functions.Portable.P

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < numHashes) {
        val m = ((2L * i + 1L) * h + (i.toLong * 40503L + 13L) % P) % P
        if (m < buf(i)) buf(i) = m
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(numHashes * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](numHashes)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): MinHashAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MinHashAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** Column API: full MinHash signature as one array<long> aggregate. */
  def minhashAgg(c: Column, numHashes: Int): Column =
    GraftColumnBridge.column(
      MinHashAgg(GraftColumnBridge.expression(c), numHashes)
        .toAggregateExpression())
}
