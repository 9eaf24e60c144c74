package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native base-31 polynomial rolling hash mod P over a string's code
  * points (SURVEY.md §2 block E4's Rabin-fingerprint stand-in):
  * h ← (31·h + codepoint) mod P, left to right.
  *
  * Replaces the interpreted `aggregate(split(s, ''), 0L, ...)` fold —
  * a per-CHARACTER expression-tree evaluation (CodegenFallback lambda
  * + a per-char single-character string materialized by the split),
  * the same anti-pattern class the E8 merge fold was. This is one
  * codegen'd JVM loop over the raw bytes, zero per-char allocations.
  *
  * Bit-identical to the fold it replaces: Java's regex-based
  * `split("")` segments by CODE POINT (zero-width matches never split
  * a surrogate pair) and `ascii()` returns the first code point, so
  * the fold's term sequence is exactly the code-point sequence; all
  * intermediates stay in [0, 31·P + 0x10FFFF] ⊂ exact int64, and the
  * DuckDB mirror (`list_reduce` over `string_split(norm, '')` with
  * `ord`) walks the identical sequence.
  */
case class PolyHash31(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_polyhash31 needs a string, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_polyhash31"

  override protected def nullSafeEval(s: Any): Any =
    PolyHashImpl.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.PolyHashImpl.hash($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : PolyHash31 = copy(child = newChild)
}

object PolyHashImpl {
  private val P = graft.functions.Portable.P

  /** Decode UTF-8 code points straight off the bytes — no String and
    * no per-char objects. Malformed sequences cannot occur: the input
    * is a Spark-produced UTF8String.
    */
  def hash(s: UTF8String): Long = {
    val n = s.numBytes()
    var h = 0L
    var i = 0
    while (i < n) {
      val b0 = s.getByte(i) & 0xff
      var cp = 0
      var len = 1
      if (b0 < 0x80) { cp = b0 }
      else if (b0 < 0xe0) { cp = b0 & 0x1f; len = 2 }
      else if (b0 < 0xf0) { cp = b0 & 0x0f; len = 3 }
      else { cp = b0 & 0x07; len = 4 }
      var j = 1
      while (j < len && i + j < n) {
        cp = (cp << 6) | (s.getByte(i + j) & 0x3f)
        j += 1
      }
      h = (31L * h + cp) % P
      i += len
    }
    h
  }
}
