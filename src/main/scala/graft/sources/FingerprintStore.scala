package graft.sources

import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted exact-dup fingerprint store — the incremental-ingest form
  * of C1's corpus dedup (SURVEY.md §2 C11): a nightly/hourly batch must
  * dedup against ALL history without rescanning or reshuffling it.
  *
  * The store is one row per distinct fingerprint —
  * `(fingerprint, canonical_id, n_history)` — written BUCKETED AND
  * SORTED by fingerprint ([[Bucketed]]). `n_history` is the
  * fingerprint's occurrence count AT FIRST SIGHT (the ingest unit —
  * initial write or appending batch — that introduced it); [[append]]
  * never rewrites existing rows (that is what keeps the append a pure
  * bucket-aligned file add), so it is NOT a running total across
  * batches. [[dedupAgainst]] does not read it; it exists for
  * store-inspection queries, with exactly that contract. That buys the only property
  * that matters at 100 TB: the probe join is a sort-merge join in which
  * the history side reads its matching buckets IN PLACE — zero exchange
  * above the store scan, spec-asserted structurally — while only the
  * (small) new batch shuffles into the store's bucketing. History cost
  * is paid once at write; every subsequent batch joins against it for
  * the price of moving the batch.
  *
  * Verdict semantics per batch doc: canonical = the history canonical
  * if the fingerprint was ever seen, else the batch-internal minimum
  * (the C1 election, agg + join-back — never a window over a viral
  * fingerprint); `dup_of_history` distinguishes re-ingested content
  * from novel within-batch duplicates.
  *
  * Canonical policy — STABILITY (r13, the family-wide contract; the
  * same statement in [[MinHashStore]]/[[SimHashStore]]/[[EmbedStore]]):
  * the verdict elects the smallest history id, a pure function of
  * (store content, batch). Replay convergence and the append ≡
  * one-build gates depend on exactly that purity — a quality-ranked
  * election here would make every verdict depend on a MUTABLE score
  * table, so a crash-replayed batch after a quality-model update would
  * elect a different canonical and the convergence contract would
  * silently break. A production pipeline that wants the best-QUALITY
  * member to win feeds the verdict's (batch, canonical) pairs as
  * cluster labels into the C16 election
  * ([[graft.operators.DedupPack.bestCanonicalOf]]) — the downstream
  * composition where a better-quality late arrival replaces a worse
  * history canonical WITHOUT the store's pointer ever moving
  * (spec: "canonical policy" in DedupPackSpec).
  */
object FingerprintStore {

  /** (fingerprint, canonical_id, n_history) for a history corpus. */
  private[graft] def fingerprints(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        md5(Portable.normText(col("text"))).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("h_canonical"),
        count(lit(1)).as("n_history"))

  /** Aggregate `history` to its fingerprint table and land it bucketed
    * + sorted by fingerprint as catalog table `table` at `path`.
    */
  def write(history: DataFrame, table: String, path: String,
      buckets: Int = 8): Unit =
    Bucketed.writeBucketed(fingerprints(history), table, "fingerprint",
      buckets, path)

  /** Fold a deduped batch into the history — the back half of the
    * ingest loop (dedup batch → append → next batch sees it): only
    * fingerprints the store has NEVER seen land, as new bucket-aligned
    * rows with the batch-minimum canonical; known fingerprints stay
    * untouched so a history canonical can never be reassigned. The
    * novelty probe is itself a left-anti join against the bucketed
    * store (in-place bucket read, like [[dedupAgainst]]). Single-writer
    * ingest contract — two concurrent appends could both claim a novel
    * fingerprint — enforced by [[Bucketed.withWriterLease]]: a second
    * concurrent writer refuses loudly instead of corrupting.
    */
  def append(spark: SparkSession, table: String, batch: DataFrame): Unit = {
    val novel = fingerprints(batch)
      .join(spark.table(table).select(col("fingerprint")),
        Seq("fingerprint"), "left_anti")
    Bucketed.appendBucketed(spark, novel, table)
  }

  /** Rewrite the appended-to store back to one sorted file per bucket
    * ([[Bucketed.compactBucketed]]) — run periodically between ingest
    * batches to undo append amplification.
    */
  def compact(spark: SparkSession, table: String): Unit =
    Bucketed.compactBucketed(spark, table)

  /** Dedup verdict for `batch` (doc_id, text) against the store:
    * (doc_id, fingerprint, canonical_id, dup_of_history, is_dup).
    *
    * `dup_of_history` means "this content was in history under a
    * canonical OUTSIDE this batch's own election". The second clause is
    * what makes a crash-REPLAYED batch's verdicts identical to its
    * first attempt's: a crashed prior attempt's append wrote the batch's
    * novel fingerprints with the batch minimum as canonical, so on
    * replay those rows resolve with `h_canonical == __batch_min` — the
    * batch's own rows, not genuine history. Under the ingest contract
    * (globally unique doc ids), a history canonical can equal the
    * batch's minimum ONLY via such a replay, so the clause never
    * changes a non-replay verdict.
    */
  def dedupAgainst(spark: SparkSession, table: String,
      batch: DataFrame): DataFrame = {
    val store = spark.table(table)
    val fps = batch.select(col("doc_id"),
      md5(Portable.normText(col("text"))).as("fingerprint"))
    // within-batch election: agg + join-back (C1's no-hot-window shape)
    val batchGroups = fps.groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("__batch_min"))
    fps
      .join(batchGroups, "fingerprint")
      .join(store, Seq("fingerprint"), "left")
      .select(col("doc_id"), col("fingerprint"),
        coalesce(col("h_canonical"), col("__batch_min"))
          .as("canonical_id"),
        (col("h_canonical").isNotNull &&
          col("h_canonical") =!= col("__batch_min"))
          .as("dup_of_history"))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
  }
}
