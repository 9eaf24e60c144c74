package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Native vector expressions (SURVEY.md §2 block G, used by blocks C5/D).
  *
  * Spark's higher-order functions (`aggregate(zip_with(...))`) are
  * CodegenFallback — every element evaluation goes through the
  * interpreted expression tree, which dominates k-NN joins (millions of
  * 64-element dots). These expressions run the identical sequential
  * left fold in one tight JVM loop with doGenCode, preserving the exact
  * IEEE result the DuckDB oracles mirror: same element order, same
  * double-by-double accumulation — bit-for-bit equal output, ~10x less
  * CPU.
  *
  * Both accept array<float> or array<double> and widen each element to
  * double BEFORE multiplying, matching `Vectors.toDouble` semantics.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if Seq(l, r).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot needs two float/double arrays, got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorImpl.dot(l.asInstanceOf[ArrayData], isFloat(left),
      r.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.VectorImpl.dot($a, ${isFloat(left)}, " +
        s"$b, ${isFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** L2 norm with the same fold order/semantics as DotProduct(v, v). */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if t == FloatType || t == DoubleType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_norm needs a float/double array, got $t")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    VectorImpl.norm(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.VectorImpl.norm($v, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

object VectorImpl {
  /** Sequential left-fold dot; element widened to double pre-multiply. */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData,
          bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def norm(v: ArrayData, vFloat: Boolean): Double = {
    val n = v.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }
}

object VectorExprs {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  /** Column wrappers (usable without SQL registration). */
  def dotCol(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def normCol(v: Column): Column = column(L2Norm(expression(v)))
}
