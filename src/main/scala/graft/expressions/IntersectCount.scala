package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Count of distinct common elements of two string arrays — the
  * Jaccard-verification kernel of the dedup operators (block G).
  * Equivalent to `size(array_intersect(a, b))` on distinct-element
  * inputs, but returns the count without materializing the intersection
  * array, in one codegen'd hash-probe loop (array_intersect builds and
  * discards a full intermediate array per pair; candidate verification
  * evaluates this millions of times).
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_intersect_count needs two array<string|long>, got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_intersect_count"

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    if (isLong)
      IntersectImpl.countLong(l.asInstanceOf[ArrayData],
        r.asInstanceOf[ArrayData])
    else
      IntersectImpl.count(l.asInstanceOf[ArrayData],
        r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val m = if (isLong) "countLong" else "count"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.IntersectImpl.$m($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectImpl {
  /** |distinct(a) ∩ distinct(b)| — null elements ignored. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
      small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      if (!small.isNullAt(i)) set.add(small.getUTF8String(i))
      i += 1
    }
    var n = 0
    i = 0
    while (i < large.numElements()) {
      if (!large.isNullAt(i) && set.remove(large.getUTF8String(i))) n += 1
      i += 1
    }
    n
  }

  /** Long-array variant (hashed-shingle sets). */
  def countLong(a: ArrayData, b: ArrayData): Int = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[java.lang.Long](small.numElements() * 2)
    var i = 0
    while (i < small.numElements()) {
      if (!small.isNullAt(i)) set.add(small.getLong(i))
      i += 1
    }
    var n = 0
    i = 0
    while (i < large.numElements()) {
      if (!large.isNullAt(i) && set.remove(large.getLong(i))) n += 1
      i += 1
    }
    n
  }
}
