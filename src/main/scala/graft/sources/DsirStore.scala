package graft.sources

import graft.operators.CurationPack
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted incremental DSIR model — the build-once / score-many /
  * APPEND form of H11's `dsir_weights` (SURVEY.md §2 H11b): a curation
  * pipeline scores every arriving batch's importance weights against a
  * corpus-trained bucket model without retraining, and folds the
  * batch's counts in so the model tracks the corpus. This is the
  * mergeable half of the learned-selection pair: [[QualityStore]]'s
  * batch-GD state is NOT delta-mergeable (no append BY CONTRACT),
  * DSIR's hashed-bigram bucket counts ARE — the [[LmStore]] count-delta
  * shape applies verbatim.
  *
  * Layout (delta tables — the LSM shape):
  *  - `<base>_cnt` (batch_id, lang, f, c): per-ingest-unit bucket-count
  *    DELTAS, kept PER LANGUAGE so the store is target-agnostic — the
  *    target slice is chosen at SCORING time (ct = Σ c over
  *    lang = targetLang, cr = Σ c over all), and one store serves any
  *    reference-language choice. Counts are additive over disjoint doc
  *    sets, so the merged model is one two-level read aggregation:
  *    collapse duplicate batch_ids (max() — duplicate rows are
  *    identical), then SUM. The table is (langs × 64)-bounded per
  *    batch, not corpus-bounded.
  *  - `<base>_docs` (doc_id), bucketed by doc_id: the append novelty
  *    anti-join (in-place bucket read, only the batch shuffles) and
  *    the COMMIT RECORD, landed last.
  *
  * Exactness: the merged counts after `write(evens); append(odds)`
  * equal the full-corpus counts EXACTLY, and the scoring tail is the
  * in-query one BY REFERENCE ([[CurationPack.dsirScoreOf]] — all-int64
  * G14 Q20 logs) — so score-after-append ≡ full retrain bit-for-bit
  * and both registry rows (`dsir_store_score`,
  * `dsir_store_append_score`) hash-match H11's oracle verbatim.
  *
  * Crash-replay: a replayed append re-derives the same content batch_id
  * ([[IngestId]]) so duplicated delta rows collapse at read; `_docs`
  * duplicates only feed the anti-join. Replay after ANY partial crash
  * converges (spec-pinned, like [[LmStore]]).
  *
  * Single-writer ingest contract, like the sibling stores — the delta
  * table is PLAIN parquet, so only the `_docs` leg carries the
  * bucketed-store writer lease: a REPLAYED append races safely
  * (identical batch_ids collapse) but two concurrent appends with
  * overlapping doc_ids both pass the novelty probe and double-count
  * the overlap — serialize appends per store.
  *
  * Scale: the model read is a vocabulary-bounded table scan collapsing
  * to 64 rows → a one-row broadcast log-weight array; scoring is a
  * map-only fold over the batch's bucket arrays (ZERO shuffles beyond
  * the model read — the serving path registers no tracked state);
  * appends pay one batch-scale count agg each.
  */
object DsirStore {

  /** Per-batch (batch_id, lang, f, c) bucket-count delta from an ids
    * frame and a per-doc bucket frame (doc_id, lang, bkts) — the
    * feature spelling is H11's by reference
    * ([[CurationPack.dsirBucketsOf]], which the no-stats entry points
    * derive `bkts` with).
    */
  private def cntDelta(ids: DataFrame, bkts: DataFrame): DataFrame =
    bkts
      .select(col("lang"), explode(col("bkts")).as("f"))
      .groupBy(col("lang"), col("f")).agg(count(lit(1)).as("c"))
      .crossJoin(broadcast(IngestId.of(ids)))
      .select(col("batch_id"), col("lang"), col("f"), col("c"))

  private def bktsOf(docs: DataFrame): DataFrame =
    CurationPack.dsirBucketsOf(docs, Seq("lang"))

  /** Build the model over `history` (doc_id, text, lang) as catalog
    * tables `<tableBase>_cnt` / `_docs` rooted at `path`. `bkts`, when
    * given, must equal [[CurationPack.dsirBucketsOf]] of `history`
    * with the lang passthrough (r17 — the r16 verdict's task 6): a
    * caller holding the already-cached corpus-wide bucket frame passes
    * the slice (parity filter ABOVE the cached projection) so the
    * build reads the InMemoryRelation instead of re-tokenizing its
    * slice below it.
    */
  def write(history: DataFrame, tableBase: String, path: String,
      buckets: Int = 8, bkts: Option[DataFrame] = None): Unit = {
    val spark = history.sparkSession
    cntDelta(history.select(col("doc_id")),
        bkts.getOrElse(bktsOf(history)))
      .write.mode("overwrite").format("parquet")
      .option("path", s"$path/cnt").saveAsTable(s"${tableBase}_cnt")
    Bucketed.writeBucketed(history.select(col("doc_id")),
      s"${tableBase}_docs", "doc_id", buckets, s"$path/docs")
    spark.catalog.refreshTable(s"${tableBase}_cnt")
  }

  /** Fold `batch` (doc_id, text, lang) into the model: never-seen
    * doc_ids' bucket-count delta lands (one batch-scale count agg),
    * then their `_docs` commit rows — LAST, so a crash-replayed batch
    * re-runs every leg and the content-derived batch_id collapses the
    * duplicates at read.
    */
  def append(spark: SparkSession, tableBase: String,
      batch: DataFrame, bkts: Option[DataFrame] = None): Unit =
    // ONE critical section under the `_docs` writer lease covering the
    // novelty probe AND both legs (r11 ADVICE): two concurrent appends
    // with overlapping doc_ids could otherwise both pass the probe and
    // double-count the overlap — the scaladoc's serialize-per-store
    // contract, now enforced instead of documented. commitDocs'
    // internal acquisition of the same lease is reentrant
    // (Bucketed.heldLeases); appendDelta additionally takes the `_cnt`
    // table's own lease (this `_docs` section does not cover it) so
    // the delta write cannot race a `_cnt` compaction either.
    Bucketed.withWriterLease(spark, s"${tableBase}_docs") {
      val novel = novelSlice(spark, tableBase, batch)
      if (novel.limit(1).count() > 0) {
        appendDelta(spark, tableBase, novel, bkts)
        commitDocs(spark, tableBase, novel)
      }
      // Dataset.unpersist is a no-op on a checkpointed frame — free the
      // materialized RDD itself, or a long-lived ingest loop carries one
      // retired batch copy per append until the ContextCleaner happens
      // to collect it
      org.apache.spark.sql.GraftDatasetBridge.freeLocalCheckpoint(novel)
    }

  // individually addressable so the spec can inject a crash between
  // the delta leg and the commit record
  private[graft] def novelSlice(spark: SparkSession, tableBase: String,
      batch: DataFrame): DataFrame =
    batch.select(col("doc_id"), col("text"), col("lang"))
      .join(spark.table(s"${tableBase}_docs").select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

  private[graft] def appendDelta(spark: SparkSession, tableBase: String,
      novel: DataFrame, bkts: Option[DataFrame] = None): Unit = {
    val ids = novel.select(col("doc_id"))
    // supplied bkts cover the whole BATCH; the delta must cover only
    // its NOVEL docs — semi-join on the (checkpointed, batch-sized)
    // novel id set, above the caller's cached per-doc frame
    val b = bkts.map(_.join(ids, Seq("doc_id"), "left_semi"))
      .getOrElse(bktsOf(novel))
    // the `_cnt` table's OWN lease (the outer `_docs` critical section
    // does not cover it — leases key per location): a raw append racing
    // compactPlain(_cnt)'s generation swap could land the delta file in
    // the retired directory and silently lose the counts
    Bucketed.withWriterLease(spark, s"${tableBase}_cnt") {
      cntDelta(ids, b).write.mode("append").format("parquet")
        .saveAsTable(s"${tableBase}_cnt")
    }
    spark.catalog.refreshTable(s"${tableBase}_cnt")
  }

  private[graft] def commitDocs(spark: SparkSession, tableBase: String,
      novel: DataFrame): Unit =
    Bucketed.appendBucketed(spark, novel.select(col("doc_id")),
      s"${tableBase}_docs")

  /** Merged bucket model (f, cr, ct) for a scoring-time target slice:
    * collapse replayed duplicate batch_ids, then sum the deltas — cr
    * over every language, ct over `targetLang`.
    */
  private def mergedCnt(spark: SparkSession, tableBase: String,
      targetLang: String): DataFrame =
    spark.table(s"${tableBase}_cnt")
      .groupBy(col("batch_id"), col("lang"), col("f"))
      .agg(max(col("c")).as("c"))
      .groupBy(col("f"))
      .agg(sum(col("c")).as("cr"),
        sum(when(col("lang") === targetLang, col("c")).otherwise(lit(0L)))
          .as("ct"))

  /** Score `batch` (doc_id, text) under the CURRENT merged model:
    * (doc_id, n_feats, w_q20, keep), H11's exact semantics via the
    * shared scoring tail. Docs with < 2 tokens score 0 (keep = false),
    * like H11.
    */
  def score(spark: SparkSession, tableBase: String, batch: DataFrame,
      targetLang: String = "en"): DataFrame =
    CurationPack.dsirScoreOf(
      CurationPack.dsirBucketsOf(batch),
      mergedCnt(spark, tableBase, targetLang))

  /** LAYOUT-only compaction: rewrite the delta table's rows — batch_id
    * keys included, exactly as they are — into one sorted file under a
    * generation-swapped sibling ([[Bucketed.compactPlain]]), and
    * restore the `_docs` bucket layout. Counts are deliberately NOT
    * folded across batch_ids — the batch_id is the replay-dedup key
    * (the [[LmStore.compact]] hazard analysis applies verbatim).
    */
  def compact(spark: SparkSession, tableBase: String): Unit = {
    Bucketed.compactPlain(spark, s"${tableBase}_cnt",
      Seq("batch_id", "lang", "f"))
    Bucketed.compactBucketed(spark, s"${tableBase}_docs")
  }
}
