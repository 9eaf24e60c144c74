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

  /** EAGER conversion of a Column to its catalyst expression.
    * `expression` returns a lazy ColumnNodeExpression wrapper, which
    * (a) defeats `case SortOrder(...)` matching and (b) is not
    * java-serializable — use this when the expression is stored in a
    * custom plan node that ships to executors.
    */
  def convertedExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}

/** Bridge for constructing DataFrames from custom logical plans
  * (Dataset.ofRows is private[sql]).
  */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Eagerly free the block-manager storage behind a
    * `localCheckpoint`-ed DataFrame. `Dataset.unpersist` only clears
    * CacheManager entries, so a checkpoint's materialized RDD
    * otherwise lives until the ContextCleaner happens to GC-collect
    * its reference — unbounded slack for a tight driver loop that
    * retires one corpus-sized checkpoint per round (the iterated BPE
    * trainer). The checkpointed RDD sits behind the plan's LogicalRDD
    * leaf (private[sql], hence this bridge); non-checkpoint frames
    * have no such leaf and the call is a no-op.
    */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
      .collectLeaves().foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false)
        case _ => ()
      }
}
