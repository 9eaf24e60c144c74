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
  * it and re-runs the native MergePair kernel per document per round
  * (each round's pair a driver-side literal — one projection per
  * round, one map-only stage in total) — the same kernel and round
  * order as the in-query E9, so `bpe_store_encode` shares bpe_encode's
  * oracle VERBATIM.
  *
  * No append, same argument as QualityStore: BPE training is a
  * sequential greedy optimization over the full corpus — its state
  * (the merge list) is not delta-mergeable, and extending the vocab
  * means retraining at exactly one `write`'s cost.
  */
object BpeStore {

  /** Train `rounds` merge rounds over `refDocs` (doc_id, text) and
    * persist them as catalog table `<tableBase>_merges` rooted at
    * `path`. Training is [[TextPack.bpeTrainMerges]] — the iterated
    * round body with driver-side merge state, flat per-round cost
    * (each round: one pair-count agg, one map-only merge, one
    * corpus-sized localCheckpoint; the plan never grows) — so a
    * production-sized vocabulary (thousands of rounds) is the same
    * loop, not a new spelling. At the default `rounds = 2` the stored
    * table is bit-for-bit the unrolled E8 spelling's, which is what
    * keeps `bpe_store_encode` on bpe_encode's 2-round oracle.
    */
  def write(refDocs: DataFrame, tableBase: String, path: String,
      rounds: Int = 2): Unit = {
    val spark = refDocs.sparkSession
    import spark.implicits._
    val merges = TextPack.bpeTrainMerges(refDocs, rounds)
      .zipWithIndex
      .map { case ((a, b, _), i) => ((i + 1).toLong, a, b) }
    merges.toDF("round", "a", "b")
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
    val d0 = TextPack.bpeTokens(docs)
    // one literal-pair projection per round — no join, no broadcast,
    // the whole merge chain is a single map-only stage however many
    // rounds the store holds
    val dT = merges.foldLeft(d0) { (d, r) =>
      TextPack.bpeMergeLit(d, r.getString(1), r.getString(2))
    }
    d0.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens_in"))
      .join(dT.select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens_out"),
        md5(concat_ws(" ", col("w"))).as("encoded_md5")), "doc_id")
      .orderBy(col("doc_id"))
  }
}
