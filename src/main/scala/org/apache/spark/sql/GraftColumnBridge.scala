package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `sql` package for Column <-> Expression conversion
  * (ExpressionUtils is private[sql] in Spark 4). This is the standard
  * pattern public Spark extension libraries use to plug custom Catalyst
  * expressions into the Column API without going through SQL parsing.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
