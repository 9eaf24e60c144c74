package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SURVEY.md §2 block G — native Catalyst expressions.
  *
  * SimHash64 computes a 64-bit SimHash of a token array in one tight
  * JVM loop per row (vs the explode → 64-row groupBy a pure-SQL
  * formulation needs): per word, the first 8 md5 bytes big-endian form a
  * 64-bit hash; each bit votes +1/-1; signature bit j is set iff the
  * vote sum is > 0. The md5-prefix construction is exactly mirrorable in
  * oracle SQL via 32-bit halves (`'0x'||substr(md5(w),1,8)` /
  * `substr(md5(w),9,8)`), which is what makes the result verifiable
  * cross-engine.
  *
  * Both expressions implement doGenCode, so they stay inside
  * whole-stage codegen — no UDF boundary, no row-by-row encoding.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash64 needs array<string>, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.SimHashImpl.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash64 = copy(child = newChild)
}

/** Hamming distance between two 64-bit signatures: popcount of xor.
  * Codegen is a single JVM intrinsic (`Long.bitCount`).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_hamming needs (bigint, bigint), got ($l, $r)")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hamming"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.bitCount(l.asInstanceOf[Long] ^ r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

/** Interpreted + codegen shared implementation (static call target). */
object SimHashImpl {
  def simhash64(words: ArrayData): Long = {
    val counts = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        md.reset()
        val digest = md.digest(words.getUTF8String(i).getBytes)
        // first 8 digest bytes big-endian == first 16 hex chars of md5
        var v = 0L
        var k = 0
        while (k < 8) { v = (v << 8) | (digest(k) & 0xffL); k += 1 }
        var j = 0
        while (j < 64) {
          if (((v >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
}

/** Function registry entries shared by the SQL extension (G3) and the
  * imperative registrar (for sessions built without extensions, e.g. the
  * driver's Verify session).
  */
object GraftFunctions {
  val all: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (e: Seq[Expression]) => SimHash64(e.head)),
    (FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "graft_hamming"),
      (e: Seq[Expression]) => HammingDistance(e(0), e(1))),
    (FunctionIdentifier("graft_intersect_count"),
      new ExpressionInfo(classOf[IntersectCount].getName,
        "graft_intersect_count"),
      (e: Seq[Expression]) => IntersectCount(e(0), e(1))),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (e: Seq[Expression]) => DotProduct(e(0), e(1))),
    (FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[L2Norm].getName, "graft_norm"),
      (e: Seq[Expression]) => L2Norm(e.head)),
    (FunctionIdentifier("graft_shingles3"),
      new ExpressionInfo(classOf[Shingles3].getName, "graft_shingles3"),
      (e: Seq[Expression]) => Shingles3(e.head)),
    (FunctionIdentifier("graft_hash60"),
      new ExpressionInfo(classOf[Hash60].getName, "graft_hash60"),
      (e: Seq[Expression]) => Hash60(e.head)),
    (FunctionIdentifier("graft_log2_q20"),
      new ExpressionInfo(classOf[Log2FixQ20].getName, "graft_log2_q20"),
      (e: Seq[Expression]) => Log2FixQ20(e.head)),
    (FunctionIdentifier("graft_dot_pack_q20"),
      new ExpressionInfo(classOf[DotPackQ20].getName,
        "graft_dot_pack_q20"),
      (e: Seq[Expression]) => DotPackQ20(e(0), e(1), e(2), e(3))),
    // Timestream bin(time, seconds) as a SQL function: composed from the
    // same exact-long-arithmetic column expression TimeSeries.bin uses.
    (FunctionIdentifier("graft_bin"),
      new ExpressionInfo(
        "graft.timeseries.TimeSeries.bin", "graft_bin"),
      (e: Seq[Expression]) => {
        import org.apache.spark.sql.GraftColumnBridge
        val seconds = e(1) match {
          case lit: org.apache.spark.sql.catalyst.expressions.Literal =>
            lit.value.toString.toLong
          case other => throw new IllegalArgumentException(
            s"graft_bin(ts, seconds): seconds must be a literal, got $other")
        }
        GraftColumnBridge.convertedExpression(
          graft.timeseries.TimeSeries.bin(
            GraftColumnBridge.column(e.head), seconds))
      }))

  /** Idempotent imperative registration on an existing session:
    * SQL functions + the optimizer rewrites.
    */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.IntersectCountRewrite)) {
      spark.experimental.extraOptimizations ++=
        Seq(graft.plans.IntersectCountRewrite)
    }
  }
}

/** G3 — `SparkSessionExtensions` entry point:
  * `.config("spark.sql.extensions", "graft.expressions.GraftExtensions")`
  * makes `graft_simhash64` / `graft_hamming` available as SQL functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.IntersectCountRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
