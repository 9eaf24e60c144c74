package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Two-pass histogram rank-selection for EXACT discrete percentiles,
  * shared by metrics_percentiles and cf_latency_percentiles (and the
  * construction logHistRollup mirrors over sketch buckets).
  *
  * Pass 1 reduces raw rows to a per-(dimension, value) count histogram
  * (map-side-combinable aggregation on a well-distributed key); pass 2
  * cumulates the histogram and, for each target rank floor((n−1)·p)+1,
  * picks the smallest value whose cumulative count reaches it. The only
  * sorted partition holds one dimension's DISTINCT values — bounded by
  * the value domain, not the row count — so no task ever sorts a
  * dimension's raw rows. The value at a rank is fully determined by the
  * histogram (equal-valued rows are interchangeable), so the result is
  * identical to a row_number rank-selection, which the oracles keep.
  */
object HistogramRank {

  /** @param ps   output column name → percentile (e.g. "p50" → 0.5)
    * @param maxAs output column name for the dimension max
    * @return one row per dimension value: dim, ps..., maxAs — the dim
    *         column keeps `dim`'s name.
    */
  def percentiles(df: DataFrame, dim: Column, value: Column,
                  ps: Seq[(String, Double)], maxAs: String): DataFrame = {
    val hist = df.groupBy(dim, value.as("__v"))
      .agg(count(lit(1)).as("__cnt"))
    val dimName = hist.columns.head
    val cum = hist
      .withColumn("__cum", sum(col("__cnt")).over(
        Window.partitionBy(col(dimName)).orderBy(col("__v"))))
      .withColumn("__tot", sum(col("__cnt")).over(
        Window.partitionBy(col(dimName))))
    def pick(p: Double) = min(when(
      col("__cum") >= floor((col("__tot") - 1) * p).cast(LongType) + 1,
      col("__v")))
    val aggs = ps.map { case (n, p) => pick(p).as(n) } :+
      max(col("__v")).as(maxAs)
    cum.groupBy(col(dimName)).agg(aggs.head, aggs.tail: _*)
  }
}
