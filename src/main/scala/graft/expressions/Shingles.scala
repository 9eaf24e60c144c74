package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native distinct word-3-shingle expression (SURVEY.md block G; feeds
  * blocks C2/C4). Equivalent to
  * `array_distinct(transform(sequence(0, n-3), i -> concat_ws(" ", ...)))`
  * but in one codegen'd JVM loop — the transform/sequence formulation is
  * CodegenFallback and was the dominant fixed cost of both shingling
  * dedup queries. Distinct keeps first occurrence, exactly like Spark's
  * array_distinct (order is irrelevant downstream: shingle sets only
  * feed min-hashing and set-intersection counts).
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles3 needs array<string>, got $t")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles3"

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.shingles3(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ShingleImpl.shingles3($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Shingles3 = copy(child = newChild)
}

/** Distinct word-3-shingles DIRECTLY as 60-bit hashes mod P (the form
  * every dedup consumer actually wants: MinHash bases, inverted-index
  * keys, intersection elements). One loop, no intermediate shingle
  * strings materialized; 8-byte elements instead of ~25-byte strings
  * cut the dedup pipeline's dominant working set ~3x. Distinct applies
  * to the HASHED values (a 60-bit collision merges two shingles — the
  * standard hashed-shingle trade, mirrored identically in the oracle).
  */
case class Shingles3Hashed(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles3h needs array<string>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingles3h"

  override protected def nullSafeEval(input: Any): Any =
    ShingleImpl.shingles3Hashed(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ShingleImpl.shingles3Hashed($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Shingles3Hashed = copy(child = newChild)
}

object ShingleImpl {
  private val SPACE = UTF8String.fromString(" ")

  def shingles3Hashed(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
    var i = 0
    while (i <= n - 3) {
      val sh = UTF8String.concatWs(SPACE,
        words.getUTF8String(i), words.getUTF8String(i + 1),
        words.getUTF8String(i + 2))
      seen.add(Hash60Impl.hash(sh) % graft.functions.Portable.P)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  def shingles3(words: ArrayData): ArrayData = {
    val n = words.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i <= n - 3) {
      seen.add(UTF8String.concatWs(SPACE,
        words.getUTF8String(i), words.getUTF8String(i + 1),
        words.getUTF8String(i + 2)))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
