package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-derived identity of an ingest unit (a doc_id set), shared by
  * the delta-table stores ([[SearchIndex]] totals, [[LmStore]] count
  * deltas): a crash-REPLAYED append derives the identical id, so the
  * read path collapses the duplicate delta; two genuinely distinct
  * batches colliding needs a simultaneous 5-aggregate collision
  * (count, sum, xor, min, max of doc_ids under md5).
  */
object IngestId {

  /** The five aggregates + fold to one id column, for callers that
    * compute the id alongside their own aggregates in ONE pass.
    */
  def aggs: Seq[Column] = Seq(
    count(lit(1)).as("__n"), sum(col("doc_id")).as("__s"),
    expr("bit_xor(doc_id)").as("__x"),
    min(col("doc_id")).as("__lo"), max(col("doc_id")).as("__hi"))

  def fold: Column =
    md5(concat_ws("|", col("__n"), col("__s"), col("__x"),
      col("__lo"), col("__hi"))).as("batch_id")

  /** One-row (batch_id) frame for a frame carrying doc_id. */
  def of(docs: DataFrame): DataFrame =
    docs.agg(aggs.head, aggs.tail: _*).select(fold)
}
