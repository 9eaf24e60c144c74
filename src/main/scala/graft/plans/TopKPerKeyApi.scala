package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, GraftDatasetBridge, SparkSession}

/** DataFrame-level entry point for the [[TopKPerKeyNode]] operator. */
object TopKPerKey {

  /** Register the planner strategy on a session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy)) {
      spark.experimental.extraStrategies ++= Seq(TopKStrategy)
    }

  /** Top `k` rows per `keys` group, ordered by `order` (use `col.desc`
    * / `col.asc`; bare columns default to ascending). Rows come back
    * best-first within each key.
    */
  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column],
            k: Int): DataFrame = {
    register(df.sparkSession)
    val keyExprs = keys.map(GraftColumnBridge.convertedExpression)
    val sortOrder = order.map(GraftColumnBridge.convertedExpression).map {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    }
    GraftDatasetBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(k, keyExprs, sortOrder,
        df.queryExecution.analyzed))
  }
}
