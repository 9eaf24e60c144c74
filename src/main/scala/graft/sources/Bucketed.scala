package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Append `df` into an existing bucketed table, bucket-ALIGNED: the
    * bucket/sort spec is read from the catalog so an appender can never
    * diverge from the layout every probe query relies on. Appends add a
    * second file per bucket, after which Spark treats each bucket as
    * unsorted and inserts a LOCAL sort below a sort-merge probe — but
    * never an exchange: the in-place bucket read survives appends.
    */
  def appendBucketed(spark: SparkSession, df: DataFrame,
                     table: String): Unit = {
    val spec = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.getOrElse(throw new IllegalArgumentException(
        s"$table is not bucketed — appendBucketed would corrupt the " +
          "layout contract"))
    val w = df.write.mode("append").format("parquet")
      .bucketBy(spec.numBuckets, spec.bucketColumnNames.head,
        spec.bucketColumnNames.tail: _*)
    (if (spec.sortColumnNames.nonEmpty)
       w.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
     else w)
      .saveAsTable(table)
    // the write invalidates the relation cache of DF'S session — which
    // inside foreachBatch is the streaming CLONE, not the session the
    // next probe reads through; refresh the caller's session explicitly
    // or it keeps serving the pre-append file-index snapshot
    spark.catalog.refreshTable(table)
  }
}
