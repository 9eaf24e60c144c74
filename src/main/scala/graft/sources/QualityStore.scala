package graft.sources

import graft.operators.CurationPack
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted trained quality model — the train-once / score-many form
  * of H10's `quality_score` (SURVEY.md §2 H10b), completing the
  * in-query ↔ persisted symmetry for the learned gate the way
  * LmStore did for the bigram LM: the CCNet deployment shape is
  * exactly this split — the classifier trains ONCE against a
  * reference corpus, and every arriving batch is scored against the
  * frozen model without retraining.
  *
  * One table `<base>_model`: a single row carrying the 65-slot Q20
  * weight array (wArr[0] the bias, wArr[f+1] bucket f). The model is
  * MODEL-scale, not corpus-scale — serving reads 65 longs, broadcasts
  * them, and scores any batch map-only with zero shuffles.
  *
  * No append: batch gradient descent is a sequential pass over the
  * full training corpus — its state is not delta-mergeable the way
  * LmStore's counts or MetricsStore's sketches are, so "fold a batch
  * in" has no exact incremental form. Growing the reference corpus
  * means retraining, which costs exactly one `write` (O(steps ·
  * corpus) — the same as the incremental would). The store makes that
  * contract explicit instead of faking a cheap append.
  *
  * Scoring semantics beyond the gated shape: a batch doc whose bigrams
  * the model never saw still scores — every bucket weight applies by
  * hash, and an empty-feature doc scores at the bias alone (the
  * smoothing-floor analog, spec-pinned).
  *
  * `quality_store_score` gates the loop against `quality_score`'s
  * oracle VERBATIM (train on documents, score documents ≡ the
  * in-query train+score bit-for-bit); `quality_store_batch_score`
  * scores the corpus as two disjoint batches and unions — the serving
  * contract — against the SAME oracle.
  */
object QualityStore {

  /** Train the H10 model over `refDocs` (doc_id, text) and persist it
    * as catalog table `<tableBase>_model` rooted at `path`.
    */
  def write(refDocs: DataFrame, tableBase: String, path: String): Unit = {
    val spark = refDocs.sparkSession
    CurationPack.qfTrain(CurationPack.qfBase(refDocs))
      .write.mode("overwrite").format("parquet")
      .option("path", s"$path/model").saveAsTable(s"${tableBase}_model")
    spark.catalog.refreshTable(s"${tableBase}_model")
  }

  /** Score `docs` (doc_id, text) with the STORED model — 65 longs
    * read, broadcast, map-only scoring, no shuffle. dropDuplicates
    * absorbs a torn overwrite's duplicate file pair.
    *
    * The feature frame is deliberately NOT persisted (identity cache
    * policy): serving is one map-only pass per sink action, and a
    * long-lived ingest loop scoring every micro-batch through a
    * registry-tracked persist would leak one cached batch frame per
    * micro-batch — releaseAll is harness-scoped, not loop-scoped
    * (r10 ADVICE). Training ([[write]]) keeps the tracked persist: it
    * pays 1 + steps actions over the same frame.
    */
  def score(spark: SparkSession, tableBase: String,
      docs: DataFrame): DataFrame = {
    val wRow = spark.table(s"${tableBase}_model").dropDuplicates()
      .select(col("wArr"))
    CurationPack.qfScore(CurationPack.qfBaseWith(docs, identity), wRow)
  }
}
