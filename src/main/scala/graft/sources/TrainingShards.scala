package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The write side of the curation story (SURVEY.md §2 block H): land
  * packed documents as training-ready shards.
  *
  * [[graft.operators.CurationPack.packShards]] assigns each document a
  * `(lang, shard_id)`; this sink makes those shards physical:
  * `outDir/data/lang=…/shard_id=…/` parquet, one file per shard, rows
  * in doc_id order — the layout a training loader streams sequentially
  * — plus `outDir/manifest/` with per-shard document/token counts and
  * doc_id ranges (the bookkeeping a resumable loader checkpoints
  * against).
  *
  * Scale shape: `repartition(lang, shard_id)` hash-routes every shard
  * wholly to one task, so each partition directory holds exactly one
  * file and no task ever buffers more than one shard (~`shardBudget`
  * tokens — the knob). The manifest is one map-side-combining
  * aggregation over (lang, shard_id) — metadata-scale output. No
  * driver-side iteration anywhere.
  */
object TrainingShards {

  /** Write `packed` (requires doc_id, lang, shard_id, n_tokens + any
    * payload columns) under `outDir`; returns the manifest.
    */
  def write(packed: DataFrame, outDir: String): DataFrame = {
    // Sort by the partition columns FIRST: FileFormatWriter's required
    // ordering is (lang, shard_id), and a sort that doesn't satisfy it
    // gets an extra writer-injected local sort on just those columns —
    // after which doc_id order among equal keys would hinge on sort
    // stability Spark does not guarantee. Leading with them satisfies
    // the writer (no injected sort), making the per-file doc_id order
    // contractual (spec-asserted intra-file).
    packed
      .repartition(col("lang"), col("shard_id"))
      .sortWithinPartitions(col("lang"), col("shard_id"), col("doc_id"))
      .write.mode("overwrite")
      .partitionBy("lang", "shard_id")
      .parquet(s"$outDir/data")
    val manifest = packed
      .groupBy(col("lang"), col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
    manifest.write.mode("overwrite").parquet(s"$outDir/manifest")
    packed.sparkSession.read.parquet(s"$outDir/manifest")
  }
}
