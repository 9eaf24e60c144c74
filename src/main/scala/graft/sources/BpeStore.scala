package graft.sources

import graft.operators.TextPack
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted trained BPE merge table — the train-once / encode-many
  * form of E8/E9 (SURVEY.md §2 E8b), completing the in-query ↔
  * persisted symmetry for the tokenizer the way QualityStore did for
  * the quality gate: a tokenizer ships as a frozen MERGE LIST, and
  * every later corpus batch is encoded against that list without
  * retraining — retraining the tokenizer mid-corpus would change
  * token ids under the model.
  *
  * One table `<base>_merges` (round, a, b): the learned merge pairs in
  * application order. Model-scale (one row per round); encoding reads
  * it, broadcasts each round's pair, and re-runs the native MergePair
  * kernel per document — the EXACT code path of the in-query E9, so
  * `bpe_store_encode` shares bpe_encode's oracle VERBATIM.
  *
  * No append, same argument as QualityStore: BPE training is a
  * sequential greedy optimization over the full corpus — its state
  * (the merge list) is not delta-mergeable, and extending the vocab
  * means retraining at exactly one `write`'s cost.
  */
object BpeStore {

  /** Train the merge table over `refDocs` (doc_id, text) and persist
    * it as catalog table `<tableBase>_merges` rooted at `path`.
    */
  def write(refDocs: DataFrame, tableBase: String, path: String): Unit = {
    import graft.Caches.CachesSyntax
    val spark = refDocs.sparkSession
    val d0 = TextPack.bpeTokens(refDocs).persistTracked
    val t1 = TextPack.bpeTopPair(d0)
    val d1 = TextPack.bpeMerge(d0, t1).persistTracked
    val t2 = TextPack.bpeTopPair(d1)
    t1.select(lit(1L).as("round"), col("a"), col("b"))
      .unionByName(t2.select(lit(2L).as("round"), col("a"), col("b")))
      .write.mode("overwrite").format("parquet")
      .option("path", s"$path/merges").saveAsTable(s"${tableBase}_merges")
    spark.catalog.refreshTable(s"${tableBase}_merges")
  }

  /** Encode `docs` (doc_id, text) with the STORED merges — each
    * round's pair is a one-row broadcast into the codegen'd MergePair
    * kernel; no shuffle anywhere. A round absent from the store (a
    * degenerate training corpus ran out of pairs) is skipped, which is
    * exactly what training would have produced. dropDuplicates absorbs
    * a torn overwrite's duplicate file pair; a store carrying two
    * DIFFERENT pairs for one round is MALFORMED (no training run
    * produces it) and fails loudly naming the round — applying either
    * pair in arbitrary order would silently produce arbitrary
    * encodings (the AnnPack malformed-store discipline, r10 ADVICE).
    */
  def encode(spark: SparkSession, tableBase: String,
      docs: DataFrame): DataFrame = {
    val merges = spark.table(s"${tableBase}_merges").dropDuplicates()
      .select(col("round"), col("a"), col("b"))
      .collect().sortBy(_.getLong(0)) // model-scale: one row per round
    val dupRounds = merges.map(_.getLong(0))
      .groupBy(identity).collect { case (r, o) if o.length > 1 => r }
    require(dupRounds.isEmpty,
      s"malformed BPE store ${tableBase}_merges: round(s) " +
        s"${dupRounds.toSeq.sorted.mkString(", ")} carry more than one " +
        "distinct merge pair — a training run writes exactly one pair " +
        "per round; rebuild the store")
    import spark.implicits._
    val d0 = TextPack.bpeTokens(docs)
    val dT = merges.foldLeft(d0) { (d, r) =>
      TextPack.bpeMerge(d,
        Seq((r.getString(1), r.getString(2))).toDF("a", "b"))
    }
    d0.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens_in"))
      .join(dT.select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens_out"),
        md5(concat_ws(" ", col("w"))).as("encoded_md5")), "doc_id")
      .orderBy(col("doc_id"))
  }
}
