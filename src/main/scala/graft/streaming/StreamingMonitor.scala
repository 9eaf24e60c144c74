package graft.streaming

import graft.sources.{MetricsStore, SnapshotStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The OBSERVABILITY stores on the live event stream — the reference's
  * whole purpose is continuous monitoring (its Timestream tables feed
  * dashboards as records arrive, README.md "Real-time metrics"), so the
  * persisted sketch family (SURVEY.md §2 A10g KMV, A10k CMS, A19b
  * snapshot) must have a streaming ingest leg, not just the batch
  * `write`+`append` the gate rows drive.
  *
  * Each micro-batch folds four deltas in via `foreachBatch` (the
  * [[StreamingIngest]] seam — these legs MUTATE external tables, which
  * no exactly-once sink can express):
  *  - per-(event_type, day) KMV distinct-user sketch rows,
  *  - per-(day, hash row, bucket) CMS count cells,
  *  - per-(event_type, day) value-histogram cells (r9, the A10l leg),
  *  - per-user latest-state partials.
  *
  * Replay convergence is the stores' own contract, and — unlike the
  * dedup ingest loop, where the band append CHANGES a replay's verdicts
  * and ordering is load-bearing — these three stores are mutually
  * independent pure folds, so NO ordering between the appends matters:
  *  - KMV: a replayed append lands duplicate (key, day, hv) rows; the
  *    merge's DISTINCT collapses them (subset-of-k-smallest argument,
  *    [[MetricsStore]] doc).
  *  - CMS / HIST / snapshot: integer cells and per-key partials would
  *    double-count, so each delta carries the batch's content-derived
  *    [[graft.sources.IngestId]] — a replay derives the identical
  *    batch_id and the read collapses it. A crash BETWEEN the appends
  *    replays into "one store already has the batch, two do not": the
  *    first converges by dedupe, the others land it fresh — every store
  *    independently ends at the one-global-pass state.
  *
  * After any prefix of micro-batches, each store's read equals ONE
  * global pass over all events ingested so far — estimates a dashboard
  * polls between micro-batches are exact fold results, never a partial
  * double-count (spec-pinned in StreamingSpec, including a replayed
  * batch).
  */
object StreamingMonitor {

  /** Fold one micro-batch of events (event_id, user_id, ts, event_type,
    * value) into the three stores. The batch is localCheckpoint-ed
    * once: it feeds three appends, and a foreachBatch source frame
    * re-executes per action otherwise (each append would also re-derive
    * the IngestId from a re-read of the source — same value, wasted
    * scan).
    */
  def processBatch(spark: SparkSession, kmvBase: String, cmsBase: String,
      snapBase: String, batch: DataFrame): Unit =
    processBatch(spark, kmvBase, cmsBase, None, snapBase, batch)

  /** As above with the optional histogram leg (A10l). */
  def processBatch(spark: SparkSession, kmvBase: String, cmsBase: String,
      histBase: Option[String], snapBase: String,
      batch: DataFrame): Unit = {
    val b = batch.localCheckpoint(true)
    MetricsStore.append(spark, kmvBase, b,
      col("event_type"), col("ts"), col("user_id"))
    MetricsStore.appendCms(spark, cmsBase, b, col("ts"), col("user_id"))
    histBase.foreach(hb => MetricsStore.appendHist(spark, hb, b,
      col("event_type"), col("ts"), col("value")))
    SnapshotStore.append(spark, snapBase, b)
  }

  /** Wire an events stream through [[processBatch]]; `onBatch` (e.g. a
    * dashboard refresh trigger) fires after each fold with the batch id.
    */
  def run(spark: SparkSession, stream: DataFrame, kmvBase: String,
      cmsBase: String, snapBase: String,
      onBatch: Long => Unit = _ => ()): StreamingQuery =
    run(spark, stream, kmvBase, cmsBase, None, snapBase, onBatch)

  /** As [[run]] with the optional histogram leg. */
  def run(spark: SparkSession, stream: DataFrame, kmvBase: String,
      cmsBase: String, histBase: Option[String], snapBase: String,
      onBatch: Long => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(spark, kmvBase, cmsBase, histBase, snapBase, batch)
        onBatch(id)
      }
      .start()
}
