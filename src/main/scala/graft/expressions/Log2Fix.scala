package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Fixed-point binary logarithm of a positive int64: floor-truncated
  * Q20 — returns ≈ 2^20 · log2(x) as a long (SURVEY.md §2 G14).
  *
  * Why this exists: libm `ln`/`log2` is NOT correctly rounded, so a
  * Spark double `log(x)` and a DuckDB `ln(x)` can disagree in the last
  * ULP — one stray ULP under a floor() flips an output bit and breaks
  * the oracle hash. Every scoring operator that needs a logarithm
  * (BM25 idf, language-model cross-entropy) was therefore
  * un-oracle-able until the log itself became exact-integer work.
  *
  * Algorithm (classic digit-recurrence, pure int64 — every step is
  * reproducible bit-for-bit in ANY engine with 64-bit integers):
  *   e   = floor(log2 x) = 63 - nlz(x)
  *   y   = x normalized into [2^30, 2^31)   (shift; truncating for e>30)
  *   20×: y² ∈ [2^60, 2^62); if y² ≥ 2^61 the next fraction bit is 1
  *        and y = y² >> 31, else 0 and y = y² >> 30
  *   result = (e << 20) + the 20 collected bits
  * The truncating shifts bias the result low by < 4e-7 relative — a
  * deterministic bias shared exactly by the DuckDB mirror (a recursive
  * CTE over the same recurrence), so oracle equality is structural.
  *
  * Non-positive input is a caller bug (counts+1 are ≥ 1 everywhere) and
  * fails loudly rather than returning a poisoned value.
  */
case class Log2FixQ20(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_log2_q20 needs a bigint, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_log2_q20"

  override protected def nullSafeEval(v: Any): Any =
    Log2FixImpl.log2q20(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Log2FixImpl.log2q20($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Log2FixQ20 = copy(child = newChild)
}

object Log2FixImpl {

  /** Fractional bits of the fixed-point result. */
  val FracBits: Int = 20

  def log2q20(x: Long): Long = {
    if (x <= 0L) throw new IllegalArgumentException(
      s"graft_log2_q20 requires a positive input, got $x")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var y = if (e <= 30) x << (30 - e) else x >> (e - 30)
    var acc = 0L
    var i = 0
    while (i < FracBits) {
      val y2 = y * y
      if (y2 >= (1L << 61)) { acc = 2 * acc + 1; y = y2 >> 31 }
      else { acc = 2 * acc; y = y2 >> 30 }
      i += 1
    }
    (e.toLong << FracBits) + acc
  }
}
