package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5-derived hash of a string (SURVEY.md §2 G9) — the base
  * hash under every portable hash family (MinHash, LSH planes, salted
  * sampling). Bit-identical to the composed-column formulation
  * `conv(substring(md5(x),1,15),16,10)` and to DuckDB's
  * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`, but computed straight
  * from the digest bytes — no 32-char hex string materialization, no
  * base-16 parse — in one codegen'd call. This is the per-row kernel of
  * the shingle→signature map at corpus scale.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_hash60 needs string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(v: Any): Any =
    Hash60Impl.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Hash60Impl.hash($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Hash60 = copy(child = newChild)
}

object Hash60Impl {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5 as a long: 7 full bytes + the high
    * nibble of byte 8 (exactly `conv(substring(md5(x),1,15),16,10)`).
    */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
    (h << 4) | ((digest(7) & 0xf0L) >>> 4)
  }
}
