package graft.sources

import graft.timeseries.TimeSeries
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted per-(key, day) KMV distinct-count sketches — the
  * OBSERVABILITY leg of the incremental-store family (SURVEY.md §2
  * A10g): a monitoring pipeline keeps distinct-user counts per
  * dimension continuously without ever rescanning raw events, and the
  * estimate after any sequence of appends equals a single global pass
  * BIT-FOR-BIT — so the store row shares the direct query's oracle.
  *
  * Tables under one base name:
  *  - `<base>_kmv` — (key, day, hv): each ingest unit's per-(key, day)
  *    k-smallest distinct hashes, bucketed by `key` so the merge/
  *    estimate aggregations read their buckets in place. Day-sketch
  *    rows are sketch-sized (≤ days × keys × k per ingest unit)
  *    regardless of event volume.
  *  - `<base>_meta` — (k): the sketch width, read back by append and
  *    estimate so a caller cannot silently mix widths (a smaller-k
  *    append would break the exactness argument below without any
  *    loud failure).
  *
  * Exactness: a KMV sketch of a SUBSET's k smallest hashes contains
  * every hash that is among the k smallest of the union (each
  * globally-smallest hash is in its own subset's k smallest), so
  * re-selecting the k smallest distinct hashes over all stored rows
  * reproduces EXACTLY the sketch a direct pass over the full event
  * stream builds. That holds for ANY partition of the events into
  * ingest units — appends need not align to day boundaries, two
  * appends may split one day, and a crash-REPLAYED append only lands
  * duplicate (key, day, hv) rows, which the merge's distinct
  * collapses. `kmv_store_estimate` gates the whole loop (write half
  * the events, append the rest, estimate) against the SAME oracle as
  * the in-query `metrics_kmv`.
  *
  * Compact is LAYOUT-only ([[Bucketed.compactBucketed]]); re-PRUNING
  * accumulated rows back to k per (key, day) would also be lossless
  * for day-or-coarser reads, but like [[LmStore]]'s fold-to-vocab it
  * is a REBUILD's job — compaction never changes row content here.
  * Single-writer per store, lease-guarded like the siblings.
  */
object MetricsStore {

  /** Build the store over `events` at `path`: sketches of
    * `id`'s distinct values per (`key`, day of `ts`).
    */
  def write(events: DataFrame, key: Column, ts: Column, id: Column,
      tableBase: String, path: String, k: Int = 64,
      buckets: Int = 8): Unit = {
    val spark = events.sparkSession
    Bucketed.writeBucketed(TimeSeries.kmvDaily(events, key, ts, id, k),
      s"${tableBase}_kmv", "key", buckets, s"$path/kmv")
    Bucketed.writePlain(
      spark.range(1).select(lit(k).as("k")),
      s"${tableBase}_meta", s"$path/meta", Seq("k"))
    spark.catalog.refreshTable(s"${tableBase}_meta")
  }

  private def storedK(spark: SparkSession, tableBase: String): Int =
    spark.table(s"${tableBase}_meta").head.getInt(0)

  /** Fold a new slice of events in — any slice shape (partial days
    * included; see the exactness note). Purely additive and
    * replay-tolerated at read.
    */
  def append(spark: SparkSession, tableBase: String, events: DataFrame,
      key: Column, ts: Column, id: Column): Unit =
    Bucketed.appendBucketed(spark,
      TimeSeries.kmvDaily(events, key, ts, id,
        storedK(spark, tableBase)),
      s"${tableBase}_kmv")

  /** Per-key distinct estimate over everything ingested:
    * (key, kmv_distinct) — bit-identical to a direct global pass.
    */
  def estimate(spark: SparkSession, tableBase: String): DataFrame = {
    val k = storedK(spark, tableBase)
    TimeSeries.kmvEstimate(
      TimeSeries.kmvMerge(spark.table(s"${tableBase}_kmv"), k), k)
  }

  /** Restore one sorted file per bucket after appends (layout only —
    * see the class doc on why re-pruning is a rebuild's job).
    */
  def compact(spark: SparkSession, tableBase: String): Unit = {
    Bucketed.compactBucketed(spark, s"${tableBase}_kmv")
    Bucketed.compactPlain(spark, s"${tableBase}_meta", Seq("k"))
  }

  // ---- CMS leg: persisted count-min frequency cells ----
  // The second sketch family under the observability store: per-ingest
  // -unit partial CMS cell tables `<base>_cms`
  // (batch_id, day, row_id, bucket, cnt) — the LmStore delta/LSM
  // shape. Integer cell sums are additive over ANY partition of the
  // events, so cells-after-append ≡ one global pass bit-for-bit (the
  // `cms_store_estimate` gate row shares metrics_cms's oracle
  // verbatim). Unlike KMV rows — where a replayed append's duplicates
  // vanish in the merge's DISTINCT — duplicate CMS deltas would
  // DOUBLE-count, so each delta carries a batch_id derived from its
  // own canonical cell serialization: a crash-replayed append derives
  // the identical id and the read path collapses the duplicate before
  // summing. Compaction of the delta table is LAYOUT-only
  // ([[Bucketed.compactPlain]]; folding across batch_ids would erase
  // the replay-dedup key — the LmStore lesson).

  /** One ingest unit's delta rows: per-(day, hash row, bucket) counts
    * stamped with the batch's [[IngestId]] over its event_ids — the
    * same identity every sibling delta store uses. The id must come
    * from the RAW ids, not the cells themselves: two genuinely
    * distinct batches can produce identical cell tables (same user on
    * the same day, same count — a steady same-shaped ingest), and a
    * cell-content-derived id would collapse the second batch at read
    * as if it were a replay (review finding). `events` must therefore
    * carry the `event_id` column — the ingest unit's unique key.
    */
  private def cmsDelta(events: DataFrame, ts: Column,
      id: Column): DataFrame =
    TimeSeries.cmsDailyCells(events, ts, id)
      .crossJoin(broadcast(
        IngestId.of(events.select(col("event_id").as("doc_id")))))
      .select(col("batch_id"), col("day"), col("row_id"), col("bucket"),
        col("cnt"))

  /** Build the CMS cell store over `events` at `path` (counts of `id`
    * per (day of `ts`, hash row, bucket)).
    */
  def writeCms(events: DataFrame, ts: Column, id: Column,
      tableBase: String, path: String): Unit = {
    val spark = events.sparkSession
    cmsDelta(events, ts, id).write.mode("overwrite").format("parquet")
      .option("path", s"$path/cms").saveAsTable(s"${tableBase}_cms")
    spark.catalog.refreshTable(s"${tableBase}_cms")
  }

  /** Fold a new slice of events in — any slice shape; sums are
    * partition-shape-independent and a replayed append's delta
    * collapses at read on its content-derived batch_id.
    */
  def appendCms(spark: SparkSession, tableBase: String,
      events: DataFrame, ts: Column, id: Column): Unit = {
    // leased: a raw append racing compactCms' generation swap (or a
    // rebuild's overwrite) on the same table could land the delta file
    // in a retired directory and silently lose it
    Bucketed.withWriterLease(spark, s"${tableBase}_cms") {
      cmsDelta(events, ts, id).write.mode("append").format("parquet")
        .saveAsTable(s"${tableBase}_cms")
    }
    spark.catalog.refreshTable(s"${tableBase}_cms")
  }

  /** The merged d×w cell table over everything ingested — bit-identical
    * to a direct global [[TimeSeries.cmsCells]] pass.
    */
  def cmsCells(spark: SparkSession, tableBase: String): DataFrame =
    TimeSeries.cmsMerge(
      spark.table(s"${tableBase}_cms").dropDuplicates())

  /** Rewrite the delta table to one sorted file (layout only — rows
    * and batch_ids preserved; see the leg doc).
    */
  def compactCms(spark: SparkSession, tableBase: String): Unit =
    Bucketed.compactPlain(spark, s"${tableBase}_cms",
      Seq("batch_id", "day", "row_id", "bucket"))

  // ---- HIST leg: persisted per-(key, day) log-histogram cells ----
  // The third sketch family under the observability store (KMV
  // distinct, CMS frequency, now value HISTOGRAMS → quantile
  // brackets): per-ingest-unit delta tables
  // `<base>_hist` (batch_id, key, day, bucket_id, cnt) — the CMS
  // delta/LSM shape verbatim. Bucket counts are additive ints over ANY
  // partition of the events, so the rolled-up quantile brackets after
  // any append sequence ≡ one global pass bit-for-bit
  // (`hist_store_rollup` shares metrics_hist_rollup's oracle). Like
  // CMS — and unlike KMV — duplicate deltas would DOUBLE-count, so
  // each delta carries the content-derived [[IngestId]] over its raw
  // event_ids and the read collapses replays before summing.
  // Compaction is LAYOUT-only (folding across batch_ids would erase
  // the replay-dedup key — the LmStore lesson).

  private def histDelta(events: DataFrame, key: Column, ts: Column,
      value: Column): DataFrame =
    TimeSeries.logHistDaily(events, key, ts, value)
      .crossJoin(broadcast(
        IngestId.of(events.select(col("event_id").as("doc_id")))))
      .select(col("batch_id"), col("key"), col("day"), col("bucket_id"),
        col("cnt"))

  /** Build the histogram cell store over `events` at `path` (counts of
    * `value`'s log-bucket per (`key`, day of `ts`)).
    */
  def writeHist(events: DataFrame, key: Column, ts: Column,
      value: Column, tableBase: String, path: String): Unit = {
    val spark = events.sparkSession
    histDelta(events, key, ts, value).write.mode("overwrite")
      .format("parquet")
      .option("path", s"$path/hist").saveAsTable(s"${tableBase}_hist")
    spark.catalog.refreshTable(s"${tableBase}_hist")
  }

  /** Fold a new slice of events in — any slice shape; bucket sums are
    * partition-shape-independent and a replayed append's delta
    * collapses at read on its content-derived batch_id.
    */
  def appendHist(spark: SparkSession, tableBase: String,
      events: DataFrame, key: Column, ts: Column,
      value: Column): Unit = {
    // leased against compactHist's generation swap (see appendCms)
    Bucketed.withWriterLease(spark, s"${tableBase}_hist") {
      histDelta(events, key, ts, value).write.mode("append")
        .format("parquet").saveAsTable(s"${tableBase}_hist")
    }
    spark.catalog.refreshTable(s"${tableBase}_hist")
  }

  /** The merged (key, day, bucket_id, cnt) cells over everything
    * ingested — bit-identical to a direct [[TimeSeries.logHistDaily]]
    * pass; feed to [[TimeSeries.logHistRollup]] for the quantile
    * brackets.
    */
  def histCells(spark: SparkSession, tableBase: String): DataFrame =
    spark.table(s"${tableBase}_hist")
      .dropDuplicates()
      .drop("batch_id")
      .groupBy(col("key"), col("day"), col("bucket_id"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Rewrite the delta table to one sorted file (layout only). */
  def compactHist(spark: SparkSession, tableBase: String): Unit =
    Bucketed.compactPlain(spark, s"${tableBase}_hist",
      Seq("batch_id", "key", "day", "bucket_id"))
}
