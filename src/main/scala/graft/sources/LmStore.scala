package graft.sources

import graft.operators.SearchPack
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted incremental bigram language model — the build-once /
  * score-many form of I1's `lm_score` (SURVEY.md §2 I5), the quality-
  * scoring leg of the incremental-store family: a curation pipeline
  * scores every arriving batch against a corpus-trained LM without
  * retraining, and folds the batch's counts in so the model tracks the
  * corpus.
  *
  * Layout (delta tables — the LSM shape):
  *  - `<base>_uni` (batch_id, word, c1) and `<base>_big`
  *    (batch_id, w1, w2, c12): per-ingest-unit COUNT DELTAS. Counts
  *    are additive over disjoint doc sets, so the merged model is one
  *    two-level read aggregation: collapse duplicate batch_ids (any()
  *    — duplicate rows are identical), then SUM. Model tables are
  *    vocabulary-bounded, not corpus-bounded; the per-batch delta is
  *    batch-vocabulary-sized.
  *  - `<base>_docs` (doc_id), bucketed by doc_id: the append novelty
  *    anti-join (in-place bucket read, only the batch shuffles) and
  *    the COMMIT RECORD, landed last.
  *
  * Exactness: the merged counts after `write(evens); append(odds)`
  * equal the full-corpus counts EXACTLY, and the scoring tail is all
  * int64 (G14 logs) — so score-after-append ≡ full rebuild bit-for-bit
  * and both registry rows (`lm_index_score`, `lm_index_append_score`)
  * hash-match I1's oracle verbatim.
  *
  * Crash-replay: a replayed append re-derives the same content batch_id
  * ([[IngestId]]) so duplicated delta rows collapse at read; `_docs`
  * duplicates only feed the anti-join. Replay after ANY partial crash
  * converges (spec-pinned, like [[SearchIndex]]).
  *
  * Single-writer ingest contract, like the sibling stores — but note
  * the delta tables are PLAIN parquet, so only the `_docs` leg carries
  * the bucketed-store writer lease: a REPLAYED append races safely
  * (identical batch_ids collapse) and concurrent DISJOINT batches
  * would even merge correctly (counts are additive), but two
  * concurrent appends with overlapping doc_ids both pass the novelty
  * probe and double-count the overlap — serialize appends per store.
  *
  * Scoring semantics beyond the gated shape: a batch bigram the model
  * has NEVER seen scores at the smoothing floor P = 1/(c1+V) (LEFT
  * join + coalesce in [[SearchPack.lmScoreOf]], shared by reference) —
  * the right behavior for scoring novel docs against a fixed model.
  */
object LmStore {

  /** Precomputed PER-DOC stat frames for a (doc_id, text) docs frame
    * (r17 optimization round — the r16 verdict's task 6): `docBg` must
    * equal [[SearchPack.docBigramsOf]] of the docs frame passed beside
    * it, `docTf` its per-doc term frequencies (doc_id, word, tf —
    * [[SearchPack.postingsOf]]'s projection). The count-delta
    * derivations below run FROM these frames (one spelling either
    * way), so a caller holding an already-cached corpus-wide per-doc
    * frame can hand the store a slice of it — parity filter ABOVE the
    * cached aggregate — and the build reads the InMemoryRelation
    * instead of re-tokenizing its slice below it (the lm_index_score
    * cache-plan-identity trick, now reaching the write path).
    */
  final case class DocStats(docBg: DataFrame, docTf: DataFrame)

  /** The one derivation of [[DocStats]] from raw (doc_id, text) docs —
    * the no-stats entry points delegate through this, so the assisted
    * and unassisted paths cannot drift. Unigram counts come off the
    * per-doc tf frame (summing per-doc tf over docs IS counting
    * occurrences — the lm_score spelling), bit-identical to the old
    * direct uniCountsOf fold.
    */
  private def statsOf(docs: DataFrame): DocStats =
    DocStats(SearchPack.docBigramsOf(docs),
      SearchPack.postingsOf(docs)
        .select(col("doc_id"), col("word"), col("tf")))

  private def uniDelta(ids: DataFrame, st: DocStats): DataFrame =
    st.docTf.groupBy(col("word")).agg(sum(col("tf")).as("c1"))
      .crossJoin(broadcast(IngestId.of(ids)))
      .select(col("batch_id"), col("word"), col("c1"))

  private def bigDelta(ids: DataFrame, st: DocStats): DataFrame =
    st.docBg
      .groupBy(col("w1"), col("w2")).agg(sum(col("k")).as("c12"))
      .crossJoin(broadcast(IngestId.of(ids)))
      .select(col("batch_id"), col("w1"), col("w2"), col("c12"))

  /** Build the model over `history` (doc_id, text) as catalog tables
    * `<tableBase>_uni` / `_big` / `_docs` rooted at `path`. `stats`,
    * when given, must be [[DocStats]] of EXACTLY `history`'s docs.
    */
  def write(history: DataFrame, tableBase: String, path: String,
      buckets: Int = 8, stats: Option[DocStats] = None): Unit = {
    val spark = history.sparkSession
    val ids = history.select(col("doc_id"))
    val st = stats.getOrElse(statsOf(history))
    uniDelta(ids, st).write.mode("overwrite").format("parquet")
      .option("path", s"$path/uni").saveAsTable(s"${tableBase}_uni")
    bigDelta(ids, st).write.mode("overwrite").format("parquet")
      .option("path", s"$path/big").saveAsTable(s"${tableBase}_big")
    Bucketed.writeBucketed(history.select(col("doc_id")),
      s"${tableBase}_docs", "doc_id", buckets, s"$path/docs")
    Seq("uni", "big").foreach(t =>
      spark.catalog.refreshTable(s"${tableBase}_$t"))
  }

  /** Fold `batch` (doc_id, text) into the model: never-seen doc_ids'
    * unigram/bigram count deltas land (one batch-vocabulary-sized
    * delta generation each), then their `_docs` commit rows — LAST, so
    * a crash-replayed batch re-runs every leg and the content-derived
    * batch_id collapses the duplicates at read.
    */
  def append(spark: SparkSession, tableBase: String,
      batch: DataFrame, stats: Option[DocStats] = None): Unit =
    // ONE critical section under the `_docs` writer lease covering the
    // novelty probe AND both delta legs — the DsirStore.append r12 fix,
    // which this structurally identical append never got: two
    // concurrent appends sharing doc_ids could both pass the probe
    // before either commits and land each overlap doc's n-gram deltas
    // under DISTINCT batch_ids, which do not collapse at read —
    // permanent double counting. commitDocs' internal acquisition of
    // the same lease is reentrant (Bucketed.heldLeases).
    Bucketed.withWriterLease(spark, s"${tableBase}_docs") {
      val novel = novelSlice(spark, tableBase, batch)
      if (novel.limit(1).count() > 0) {
        appendDeltas(spark, tableBase, novel, stats)
        commitDocs(spark, tableBase, novel)
      }
      // free the checkpoint's materialized RDD (Dataset.unpersist is a
      // no-op on checkpointed frames — the ingest-loop slack lesson)
      org.apache.spark.sql.GraftDatasetBridge.freeLocalCheckpoint(novel)
    }

  // individually addressable so the spec can inject a crash between
  // the delta legs and the commit record
  private[graft] def novelSlice(spark: SparkSession, tableBase: String,
      batch: DataFrame): DataFrame =
    batch.select(col("doc_id"), col("text"))
      .join(spark.table(s"${tableBase}_docs").select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

  private[graft] def appendDeltas(spark: SparkSession, tableBase: String,
      novel: DataFrame, stats: Option[DocStats] = None): Unit = {
    val ids = novel.select(col("doc_id"))
    // supplied stats cover the whole BATCH; the deltas must cover only
    // its NOVEL docs — restrict by semi-join on the (checkpointed,
    // batch-sized) novel id set, which stays above the caller's cached
    // per-doc frame in the plan
    val st = stats
      .map(s => DocStats(
        s.docBg.join(ids, Seq("doc_id"), "left_semi"),
        s.docTf.join(ids, Seq("doc_id"), "left_semi")))
      .getOrElse(statsOf(novel))
    // each delta table takes its OWN lease: a raw append racing
    // compactPlain's generation swap on the same table could land the
    // delta file in the retired directory and silently lose it —
    // the lease turns that into the loud refusal the family promises
    Bucketed.withWriterLease(spark, s"${tableBase}_uni") {
      uniDelta(ids, st).write.mode("append").format("parquet")
        .saveAsTable(s"${tableBase}_uni")
    }
    Bucketed.withWriterLease(spark, s"${tableBase}_big") {
      bigDelta(ids, st).write.mode("append").format("parquet")
        .saveAsTable(s"${tableBase}_big")
    }
    Seq("uni", "big").foreach(t =>
      spark.catalog.refreshTable(s"${tableBase}_$t"))
  }

  private[graft] def commitDocs(spark: SparkSession, tableBase: String,
      novel: DataFrame): Unit =
    Bucketed.appendBucketed(spark, novel.select(col("doc_id")),
      s"${tableBase}_docs")

  /** Merged unigram model (word, c1): collapse replayed duplicate
    * batch_ids, then sum the deltas.
    */
  private def mergedUni(spark: SparkSession, tableBase: String): DataFrame =
    spark.table(s"${tableBase}_uni")
      .groupBy(col("batch_id"), col("word")).agg(max(col("c1")).as("c1"))
      .groupBy(col("word")).agg(sum(col("c1")).as("c1"))

  private def mergedBig(spark: SparkSession, tableBase: String): DataFrame =
    spark.table(s"${tableBase}_big")
      .groupBy(col("batch_id"), col("w1"), col("w2"))
      .agg(max(col("c12")).as("c12"))
      .groupBy(col("w1"), col("w2")).agg(sum(col("c12")).as("c12"))

  /** Score `batch` (doc_id, text) under the CURRENT merged model:
    * (doc_id, n_bigrams, xent_q20, mbits_per_token), I1's exact
    * semantics via the shared scoring tail. Docs with < 2 tokens have
    * no bigrams and no row, like I1.
    */
  def score(spark: SparkSession, tableBase: String,
      batch: DataFrame): DataFrame = {
    val uni = mergedUni(spark, tableBase)
    SearchPack.lmScoreOf(
      SearchPack.docBigramsOf(batch),
      mergedBig(spark, tableBase),
      uni,
      uni.agg(count(lit(1)).as("v")))
  }

  /** Freeze the per-language ccnet tercile thresholds over a REFERENCE
    * population (doc_id, text, lang), scored under the CURRENT merged
    * model, as a `<base>_thr` (lang, t1, t2) catalog table — the
    * metadata-scale table the streaming ccnet leg broadcasts
    * ([[graft.streaming.StreamingIngest]]). FROZEN like QualityStore's
    * model BY CONTRACT: a tercile is an order statistic over a
    * population, not a mergeable count — it cannot fold incrementally;
    * re-run this when the reference population should move. Derived by
    * [[SearchPack.ccnetThresholdsOf]] — the same arithmetic the I9/H12
    * oracles verify.
    */
  def writeThresholds(spark: SparkSession, tableBase: String,
      refDocs: DataFrame, path: String): Unit = {
    val scored = score(spark, tableBase,
        refDocs.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("mbits_per_token"))
      .join(refDocs.select(col("doc_id"), col("lang")), Seq("doc_id"))
    SearchPack.ccnetThresholdsOf(scored)
      .write.mode("overwrite").format("parquet")
      .option("path", s"$path/thr").saveAsTable(s"${tableBase}_thr")
    spark.catalog.refreshTable(s"${tableBase}_thr")
  }

  /** The frozen thresholds table (lang, t1, t2); dropDuplicates
    * absorbs a torn overwrite's duplicate file pair (the QualityStore
    * read discipline).
    */
  def thresholds(spark: SparkSession, tableBase: String): DataFrame =
    spark.table(s"${tableBase}_thr").dropDuplicates("lang")

  /** LAYOUT-only compaction: rewrite each delta table's rows — batch_id
    * keys included, exactly as they are — into one sorted file under a
    * generation-swapped sibling ([[Bucketed.compactPlain]]: lease-
    * guarded, never overwritten in place, crash leaves the old
    * generation live), and restore the `_docs` bucket layout. Counts
    * are deliberately NOT folded across batch_ids: the batch_id is the
    * replay-dedup key, and folding it away would let this sequence
    * double-count — append crashes after its deltas land but before
    * the `_docs` commit; compact folds those orphan deltas into an
    * anonymous row; the replayed append (still novel — no commit
    * record) lands the same deltas again under the original id, which
    * no longer collapses with anything. Fold-to-vocab-size is a
    * REBUILD ([[write]] over the corpus), which re-keys everything.
    */
  def compact(spark: SparkSession, tableBase: String): Unit = {
    Bucketed.compactPlain(spark, s"${tableBase}_uni",
      Seq("batch_id", "word"))
    Bucketed.compactPlain(spark, s"${tableBase}_big",
      Seq("batch_id", "w1", "w2"))
    Bucketed.compactBucketed(spark, s"${tableBase}_docs")
  }
}
