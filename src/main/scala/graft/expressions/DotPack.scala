package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** G15 — sparse integer dot product over two WORD-SORTED weight
  * vectors, split for exactness: given (wordsA, weightsA, wordsB,
  * weightsB) with each (words, weights) pair parallel and sorted by
  * word (Spark's binary UTF8 order — `sort_array`'s order), returns
  * [s1, s2, s3] where, over the shared words,
  *   s1 = Σ hiₐ·hi_b,  s2 = Σ (hiₐ·lo_b + loₐ·hi_b),  s3 = Σ loₐ·lo_b
  * with w = hi·2^20 + lo the 20-bit split. One two-pointer merge per
  * PAIR — the I8 similarity join's verification kernel: the per-term
  * join formulation it replaces streams |pairs|·|terms| rows into a
  * (doc, word) sort-merge join, this evaluates |pairs| rows with an
  * O(|a|+|b|) loop each. Exact for weights < 2^41 over ≤ 2^20 shared
  * terms (the I8 width budget); word arrays must be duplicate-free
  * (postings are distinct on (doc, word) by construction).
  */
case class DotPackQ20(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(StringType, _), ArrayType(LongType, _),
            ArrayType(StringType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_dot_pack_q20 needs (array<string>, array<bigint>) ×2, " +
          s"got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_dot_pack_q20"

  override protected def nullSafeEval(aw: Any, av: Any, bw: Any,
      bv: Any): Any =
    DotPackImpl.dot(aw.asInstanceOf[ArrayData], av.asInstanceOf[ArrayData],
      bw.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (aw, av, bw, bv) =>
      s"graft.expressions.DotPackImpl.dot($aw, $av, $bw, $bv)")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression, q: Expression): DotPackQ20 =
    copy(first = f, second = s, third = t, fourth = q)
}

object DotPackImpl {
  private final val Mask = (1L << 20) - 1

  /** Two-pointer merge over word-sorted parallel arrays; see the
    * expression scaladoc for the contract.
    */
  def dot(aw: ArrayData, av: ArrayData, bw: ArrayData,
      bv: ArrayData): ArrayData = {
    require(aw.numElements() == av.numElements() &&
      bw.numElements() == bv.numElements(),
      "graft_dot_pack_q20: words/weights arrays must be parallel")
    var i = 0
    var j = 0
    var s1 = 0L
    var s2 = 0L
    var s3 = 0L
    val na = aw.numElements()
    val nb = bw.numElements()
    while (i < na && j < nb) {
      val c = aw.getUTF8String(i).compareTo(bw.getUTF8String(j))
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else {
        val a = av.getLong(i)
        val b = bv.getLong(j)
        val ah = a >>> 20
        val al = a & Mask
        val bh = b >>> 20
        val bl = b & Mask
        s1 += ah * bh
        s2 += ah * bl + al * bh
        s3 += al * bl
        i += 1
        j += 1
      }
    }
    new GenericArrayData(Array(s1, s2, s3))
  }
}
