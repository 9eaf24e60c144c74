package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table utilities (SURVEY.md §4/§5: co-located fact-fact
  * joins).
  *
  * At 100 TB the lineitem⋈orders class of joins is the shuffle budget's
  * biggest line item. Writing both facts bucketed AND sorted by the join
  * key makes the join a zero-exchange sort-merge: each task reads
  * matching buckets from both sides — no network movement at query
  * time, amortized across every downstream query that joins on the key.
  * The spec asserts the property structurally (no shuffle exchange in
  * the executed plan).
  */
object Bucketed {

  /** Write `df` as a bucketed+sorted external parquet table registered
    * in the session catalog at `path`.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
