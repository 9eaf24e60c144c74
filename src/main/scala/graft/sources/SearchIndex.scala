package graft.sources

import graft.functions.Portable
import graft.operators.SearchPack
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted BM25 inverted index — the build-once/query-many form of
  * I2's `bm25_search` (SURVEY.md §2 I4), completing the incremental-
  * store family (C11 exact fingerprints, C12 MinHash bands, D9 ANN
  * postings → lexical search): at 100 TB a query must not re-tokenize
  * and re-aggregate the corpus per search batch.
  *
  * Layout (three parquet tables under one base path):
  *  - `<base>_postings` (word, doc_id, tf, dl), BUCKETED+SORTED by
  *    word: a search's `word IN (terms)` filter statically prunes the
  *    scan to the terms' buckets (plan shows SelectedBucketsCount ≤
  *    |terms|, spec-asserted) — the read is bounded by the query's
  *    vocabulary slice, never the corpus.
  *  - `<base>_docs` (doc_id, dl), BUCKETED+SORTED by doc_id: the
  *    append-time novelty filter (anti-join reading its buckets in
  *    place — only the batch shuffles) and the append COMMIT RECORD.
  *  - `<base>_totals` (batch_id, n, t): per-ingest-unit delta rows;
  *    the read side sums deltas after collapsing duplicate batch_ids.
  *
  * Exactness: BM25 over merged counts is pure integer arithmetic
  * (G14 fixed-point idf + exact-rational tf normalization), and df /
  * N / T are additive over disjoint doc sets — so search-after-append
  * equals a full rebuild BIT-FOR-BIT, and both index registry rows
  * hash-match I2's oracle verbatim (the D9 gating pattern, but with
  * zero approximation caveats).
  *
  * Crash-replay: every append leg is IDEMPOTENT AT READ —
  *  - duplicated postings rows (a replayed batch whose commit record
  *    never landed) collapse in [[search]]'s (word, doc_id) fold;
  *  - duplicated totals deltas carry the same content-derived
  *    batch_id and collapse in the totals read;
  *  - duplicated `_docs` rows only feed an anti-join, where
  *    multiplicity is irrelevant —
  * so replaying a batch after a crash at ANY point converges to the
  * uncrashed store (spec: full-duplicate and postings-only partial
  * appends both leave search results byte-identical). The `_docs`
  * append runs LAST deliberately: once the commit record lands, the
  * novelty filter drops the batch and a replay is a structural no-op;
  * landing it earlier would make a replay skip legs that never ran.
  * Single-writer contract per table via [[Bucketed.withWriterLease]],
  * like the sibling stores.
  */
object SearchIndex {

  /** Postings/length derivations are [[SearchPack.postingsOf]] /
    * [[SearchPack.docLensOf]] BY REFERENCE — the store and the
    * oracle-verified in-query path must tokenize identically, so
    * neither re-spells the derivation (the same sharing discipline as
    * the scoring tail).
    */
  private def docLens(docs: DataFrame): DataFrame =
    SearchPack.docLensOf(docs)

  private def postingsOf(docs: DataFrame): DataFrame =
    SearchPack.postingsOf(docs)

  /** One (batch_id, n, t) delta row for an ingest unit. batch_id is
    * the unit's content identity ([[IngestId]]): a crash-replayed
    * append writes the identical id and the totals read collapses it.
    */
  private def totalsDelta(lens: DataFrame): DataFrame = {
    val own = Seq(sum(col("dl")).as("t"))
    lens.agg((IngestId.aggs ++ own).head, (IngestId.aggs ++ own).tail: _*)
      .select(IngestId.fold, col("__n").as("n"), col("t"))
  }

  /** Build the index over `history` (doc_id, text) as catalog tables
    * `<tableBase>_postings` / `_docs` / `_totals` rooted at `path`.
    *
    * `posts`, when given, must equal [[SearchPack.postingsOf]] of
    * `history` (r17 — the r16 verdict's task 6): a caller holding the
    * already-cached corpus-wide postings frame passes the slice
    * (parity filter ABOVE the cached aggregate) so the build reads the
    * InMemoryRelation instead of re-tokenizing its slice below it.
    * Doc lengths derive from the postings frame either way (dl rides
    * on every posting row — the append path's one-tokenize-pass
    * discipline, now on the write path too; the doc_id set, and with
    * it the totals batch_id, is unchanged).
    */
  def write(history: DataFrame, tableBase: String, path: String,
      buckets: Int = 8, posts: Option[DataFrame] = None): Unit = {
    val spark = history.sparkSession
    val p = posts.getOrElse(postingsOf(history))
    Bucketed.writeBucketed(p,
      s"${tableBase}_postings", "word", buckets, s"$path/postings")
    val lens = p.select(col("doc_id"), col("dl")).distinct()
    Bucketed.writeBucketed(lens,
      s"${tableBase}_docs", "doc_id", buckets, s"$path/docs")
    totalsDelta(lens).write.mode("overwrite").format("parquet")
      .option("path", s"$path/totals")
      .saveAsTable(s"${tableBase}_totals")
    spark.catalog.refreshTable(s"${tableBase}_totals")
  }

  /** Fold `batch` (doc_id, text) into the index: docs the index has
    * never seen (anti-join against `_docs`, in-place bucket read) land
    * as bucket-aligned postings + a totals delta + their `_docs`
    * commit rows; known doc_ids are skipped entirely, so re-ingesting
    * history content is a structural no-op. The novel set is severed
    * (localCheckpoint) BEFORE any table mutates — the legs must all
    * see the election made against the pre-append store.
    */
  def append(spark: SparkSession, tableBase: String,
      batch: DataFrame, stats: Option[DataFrame] = None): Unit = {
    // tokenize the severed batch ONCE: the postings frame is the
    // single words() pass, and lens derive from it (dl rides on every
    // posting row, so distinct (doc_id, dl) is a cheap projection of
    // the checkpointed frame — the earlier docLens(novel) +
    // postingsOf(novel) pair re-ran the tokenization twice per
    // micro-batch, review finding). An all-known batch (every trigger
    // of a steady stream re-offering history) short-circuits before
    // any lease acquisition or empty file lands. `stats`, when given,
    // must be postingsOf(batch) — typically a slice of the cached
    // corpus postings frame (see write); the novel restriction is a
    // semi-join on the checkpointed novel id set.
    val novel = novelSlice(spark, tableBase, batch)
    val posts = stats
      .map(_.join(novel.select(col("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("dl"), col("word"), col("tf")))
      .getOrElse(postingsOf(novel))
      .localCheckpoint(true)
    val lens = posts.select(col("doc_id"), col("dl")).distinct()
    if (posts.limit(1).count() > 0) {
      appendPostingsOf(spark, tableBase, posts)
      appendTotalsOf(spark, tableBase, lens)
      commitDocsOf(spark, tableBase, lens)
    }
    // free both checkpoints' materialized RDDs (Dataset.unpersist is a
    // no-op on checkpointed frames — the ingest-loop slack lesson)
    org.apache.spark.sql.GraftDatasetBridge.freeLocalCheckpoint(posts)
    org.apache.spark.sql.GraftDatasetBridge.freeLocalCheckpoint(novel)
  }

  // the append legs are individually addressable so the spec can
  // simulate a crash between any two of them
  private[graft] def novelSlice(spark: SparkSession, tableBase: String,
      batch: DataFrame): DataFrame =
    batch.select(col("doc_id"), col("text"))
      .join(spark.table(s"${tableBase}_docs").select(col("doc_id")),
        Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

  private[graft] def appendPostings(spark: SparkSession, tableBase: String,
      novel: DataFrame): Unit =
    appendPostingsOf(spark, tableBase, postingsOf(novel))

  private def appendPostingsOf(spark: SparkSession, tableBase: String,
      posts: DataFrame): Unit =
    Bucketed.appendBucketed(spark, posts, s"${tableBase}_postings")

  private[graft] def appendTotals(spark: SparkSession, tableBase: String,
      novel: DataFrame): Unit =
    appendTotalsOf(spark, tableBase, docLens(novel))

  private def appendTotalsOf(spark: SparkSession, tableBase: String,
      lens: DataFrame): Unit =
    if (lens.limit(1).count() > 0) {
      // leased against a rebuild's overwrite of the same location (the
      // delta-append-vs-generation-swap corruption class)
      Bucketed.withWriterLease(spark, s"${tableBase}_totals") {
        totalsDelta(lens).write.mode("append").format("parquet")
          .saveAsTable(s"${tableBase}_totals")
      }
      spark.catalog.refreshTable(s"${tableBase}_totals")
    }

  private def commitDocsOf(spark: SparkSession, tableBase: String,
      lens: DataFrame): Unit =
    Bucketed.appendBucketed(spark, lens, s"${tableBase}_docs")

  /** Rewrite the appended-to bucketed tables back to one sorted file
    * per bucket — run periodically to undo append amplification. The
    * totals deltas stay as-is (vocabulary-of-batches-sized; the read
    * collapses them).
    */
  def compact(spark: SparkSession, tableBase: String): Unit = {
    Bucketed.compactBucketed(spark, s"${tableBase}_postings")
    Bucketed.compactBucketed(spark, s"${tableBase}_docs")
  }

  /** BM25 top-k over the index for `terms`: the postings scan is
    * statically bucket-pruned to the terms' buckets, the per-term df
    * is an aggregate of that same slice (a term's slice holds ALL its
    * postings, so slice-df ≡ corpus-df), totals come from the delta
    * table — nothing corpus-sized is read or shuffled. Scoring and
    * top-k are [[SearchPack.bm25TopK]] BY REFERENCE.
    */
  def search(spark: SparkSession, tableBase: String,
      terms: Seq[String], k: Int): DataFrame = {
    val slice = spark.table(s"${tableBase}_postings")
      .filter(col("word").isin(terms: _*))
      // replay-dedup fold: duplicated rows of an uncommitted append
      // are identical, so max() is "any" — and the store's bucketing
      // feeds the aggregation without an exchange
      .groupBy(col("word"), col("doc_id"))
      .agg(max(col("tf")).as("tf"), max(col("dl")).as("dl"))
    val dfTab = slice.groupBy(col("word"))
      .agg(count(lit(1)).as("df"))
    val totals = spark.table(s"${tableBase}_totals")
      .groupBy(col("batch_id"))
      .agg(max(col("n")).as("n"), max(col("t")).as("t"))
      .agg(sum(col("n")).as("n"), sum(col("t")).as("t"))
    SearchPack.bm25TopK(slice, dfTab, totals, k)
  }
}
