package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge kernel (SURVEY.md §2 block G; feeds block E8):
  * greedy left-to-right merge of one (a, b) token pair inside a token
  * array — every adjacent (a, b) occurrence collapses to "a+b", and the
  * adjacency test always looks at the CURRENT output tail, so a freshly
  * merged token (spelled "a+b", never equal to `a`) cannot cascade into
  * a second merge. That is exactly the non-overlapping BPE merge rule,
  * and exactly the semantics of the string fold it replaces:
  *
  *   aggregate(w, '', (acc, t) -> ... concat(acc, ' ', t) ...)
  *
  * That fold was the anti-pattern SURVEY.md §7 warns about twice over —
  * `aggregate` over a lambda is CodegenFallback (interpreted per
  * element), and its accumulator is a growing STRING, so each append
  * re-copies the whole document: O(L²) characters per document per
  * round. This kernel is one codegen'd JVM loop, O(L) with zero
  * intermediate strings. Empty/null tokens are dropped, matching the
  * fold's trailing `filter(split(...), length > 0)` — and, like the
  * fold (whose accumulator tail check failed across the empty's
  * separator), a dropped token BREAKS adjacency: `[a, "", b]` yields
  * `[a, b]`, never `[a+b]`. [[graft.functions.Portable.words]] never
  * emits empties, so on the E8/E9 path the rule is latent; it exists so
  * the kernel is a drop-in for ANY token array, not just that path.
  */
case class MergePair(tokens: Expression, a: Expression, b: Expression)
    extends TernaryExpression {

  override def first: Expression = tokens
  override def second: Expression = a
  override def third: Expression = b

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, a.dataType, b.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, x, y) => TypeCheckResult.TypeCheckFailure(
        s"graft_merge_pair needs (array<string>, string, string), " +
          s"got ($t, $x, $y)")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_merge_pair"

  override protected def nullSafeEval(t: Any, av: Any, bv: Any): Any =
    MergePairImpl.merge(t.asInstanceOf[ArrayData],
      av.asInstanceOf[UTF8String], bv.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, x, y) =>
      s"graft.expressions.MergePairImpl.merge($t, $x, $y)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): MergePair =
    copy(tokens = newFirst, a = newSecond, b = newThird)
}

object MergePairImpl {
  private val PLUS = UTF8String.fromString("+")

  def merge(tokens: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = tokens.numElements()
    val merged = UTF8String.concat(a, PLUS, b)
    val out = new Array[Any](n)
    var m = 0
    var i = 0
    // a dropped (null/empty) element breaks adjacency, matching the
    // replaced fold: its separator landed in the accumulator, so the
    // tail check failed across it and [a, "", b] stayed [a, b]
    var adjacent = false
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null && t.numBytes() > 0) {
        if (adjacent && m > 0 && t.equals(b) &&
            out(m - 1).asInstanceOf[UTF8String].equals(a)) {
          out(m - 1) = merged
          // "a+b" never equals `a`, so a fresh merge cannot cascade;
          // the NEXT token may still merge with a preceding literal `a`
          adjacent = true
        } else {
          out(m) = t
          m += 1
          adjacent = true
        }
      } else {
        adjacent = false
      }
      i += 1
    }
    new GenericArrayData(
      if (m == n) out
      else java.util.Arrays.copyOfRange(
        out.asInstanceOf[Array[AnyRef]], 0, m).asInstanceOf[Array[Any]])
  }
}
