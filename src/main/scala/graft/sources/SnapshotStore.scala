package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted latest-record-per-key snapshot — the SCD / changelog-
  * compaction leg of the incremental-store family (SURVEY.md §2 A19's
  * persisted form): a continuously-ingesting pipeline keeps the
  * "current state per key" view queryable without ever rescanning raw
  * history, and the snapshot after any sequence of appends equals one
  * global pass BIT-FOR-BIT — the gate row shares `q_latest`'s oracle
  * verbatim.
  *
  * One table `<base>_latest` (batch_id, user_id, m, n): per-ingest-unit
  * PARTIAL aggregates — each batch's per-key struct-max (the A19 total
  * (ts, event_id) order) and count — bucketed by user_id, so the read's
  * re-aggregation groups on the bucket column and reads in place. The
  * LSM shape: appends are pure bucket-aligned adds of partial rows;
  * the read folds them — max is associative/idempotent and the counts
  * are additive, which is the whole exactness argument. Store size is
  * keys × ingest units between compactions, independent of event
  * volume.
  *
  * Crash-replay: max would absorb duplicate partials silently, but the
  * COUNT would double — so every delta carries the batch's
  * content-derived identity ([[IngestId]] over its event_ids) and the
  * read collapses duplicate rows before folding; a partial first
  * attempt's rows are a subset of the replay's identical rows, so
  * replays converge. Compaction is LAYOUT-only ([[Bucketed
  * .compactBucketed]]); folding partials ACROSS batch_ids would erase
  * the replay-dedup key (the LmStore lesson) — that fold is a rebuild.
  * Single-writer per store, lease-guarded like the siblings.
  */
object SnapshotStore {

  /** One ingest unit's partial rows: per-key struct-max + count,
    * stamped with the content-derived batch id.
    */
  private def delta(events: DataFrame): DataFrame = {
    val partial = events
      .groupBy(col("user_id"))
      .agg(
        max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("m"),
        count(lit(1)).as("n"))
    partial.crossJoin(broadcast(
        IngestId.of(events.select(col("event_id").as("doc_id")))))
      .select(col("batch_id"), col("user_id"), col("m"), col("n"))
  }

  /** Build the store over `events` at `path`. */
  def write(events: DataFrame, tableBase: String, path: String,
      buckets: Int = 8): Unit =
    Bucketed.writeBucketed(delta(events), s"${tableBase}_latest",
      "user_id", buckets, s"$path/latest")

  /** Fold a new slice of events in — any slice shape; the read-side
    * fold is partition-shape-independent.
    */
  def append(spark: SparkSession, tableBase: String,
      events: DataFrame): Unit =
    Bucketed.appendBucketed(spark, delta(events), s"${tableBase}_latest")

  /** The current-state view over everything ingested — bit-identical
    * to A19's one-pass aggregation over the raw history: (user_id,
    * last_ts, last_event_id, last_event_type, last_value, n_events).
    */
  def snapshot(spark: SparkSession, tableBase: String): DataFrame =
    spark.table(s"${tableBase}_latest")
      .dropDuplicates()
      .groupBy(col("user_id"))
      .agg(max(col("m")).as("m"), sum(col("n")).as("n_events"))
      .select(col("user_id"), col("m.ts").as("last_ts"),
        col("m.event_id").as("last_event_id"),
        col("m.event_type").as("last_event_type"),
        col("m.value").as("last_value"), col("n_events"))

  /** Restore one sorted file per bucket after appends (layout only —
    * see the class doc on why cross-batch folding is a rebuild).
    */
  def compact(spark: SparkSession, tableBase: String): Unit =
    Bucketed.compactBucketed(spark, s"${tableBase}_latest")
}
