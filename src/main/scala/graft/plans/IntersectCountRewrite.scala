package graft.plans

import graft.expressions.IntersectCount
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, Size}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Catalyst optimizer rule (SURVEY.md block G): rewrite
  * `size(array_intersect(a, b))` over null-free string arrays into the
  * native [[IntersectCount]] kernel — same result (distinct common
  * element count, null if either input is null), but no intermediate
  * intersection array is materialized per row.
  *
  * Guarded to `containsNull = false` element types: `array_intersect`
  * treats a null ELEMENT present in both arrays as a common value,
  * while the counting kernel skips null elements; the rewrite is only
  * semantics-preserving when null elements cannot occur.
  *
  * Registered by [[graft.expressions.GraftExtensions]]
  * (injectOptimizerRule) and imperatively via
  * `spark.experimental.extraOptimizations`.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ai @ ArrayIntersect(a, b), _)
          if isNullFreeStringArray(a.dataType) &&
            isNullFreeStringArray(b.dataType) && ai.deterministic =>
        IntersectCount(a, b)
    }

  private def isNullFreeStringArray(dt: org.apache.spark.sql.types.DataType)
      : Boolean = dt match {
    case ArrayType(StringType, containsNull) => !containsNull
    case _ => false
  }
}
