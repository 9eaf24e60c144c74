package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted training-sequence packing — the build-once / extend-many
  * form of H9's in-query `pack_sequences` (SURVEY.md §2 H9b),
  * completing the in-query ↔ persisted symmetry for the packing the
  * way D11 ↔ PqStore did for product quantization: a pretraining
  * ingest keeps the data-loader's segment index CURRENT as document
  * batches arrive, without ever re-tokenizing or re-packing history.
  *
  * One table `<base>_segs` (doc_id, seg_idx, seq_id, seq_offset,
  * doc_offset, seg_len): the packed segment rows. Appends pack ONLY
  * the arriving batch, starting at the stored stream cursor — which
  * is derivable from the table itself (Σ seg_len = total tokens
  * packed; segment-scale, never corpus-scale), so there is no meta
  * table to keep consistent.
  *
  * Contracts, both load-bearing and loudly enforced:
  *  - **doc_id-monotone appends**: packing is an append-only LAYOUT —
  *    each batch's doc ids must exceed everything stored (checked;
  *    violations throw rather than silently produce a packing no
  *    one-pass run would). Backfill means repack, exactly like a
  *    tokenized-and-sharded corpus on disk.
  *  - **Crash replay**: appends are NOVEL-ONLY by doc_id (anti-join
  *    against the stored segment index before packing), so a replayed
  *    batch packs zero new docs and converges; without the filter a
  *    replay would re-pack the same docs at an ADVANCED cursor —
  *    duplicates at different positions that no read-side dedupe
  *    could collapse. dropDuplicates at read additionally absorbs a
  *    torn duplicate file pair.
  *  - Single-writer per store (the cursor read-modify-write), like
  *    EmbedStore's cells rewrite.
  *
  * `pack_store_roundtrip` gates the loop against `pack_sequences`'
  * oracle VERBATIM: write the doc_id-lower half, append the upper
  * half, read back ≡ one global pass bit-for-bit.
  */
object SeqStore {

  /** Pack with the token frame scoped to this call: a foreachBatch
    * loop calling in would otherwise accumulate one registry-tracked
    * cached frame per micro-batch, released only at session teardown.
    */
  private def packScoped(docs: DataFrame, off: DataFrame)(
      write: DataFrame => Unit): Unit = {
    var scoped: DataFrame = null
    val packed = graft.operators.CurationPack.packSegmentsWith(docs, off,
      df => { scoped = df.persist(); scoped })
    try write(packed)
    finally if (scoped != null) scoped.unpersist()
  }

  /** Build the store over `docs` (doc_id, text) at `path`. */
  def write(docs: DataFrame, tableBase: String, path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    packScoped(docs, Seq(0L).toDF("off")) {
      _.write.mode("overwrite").format("parquet")
        .option("path", s"$path/segs").saveAsTable(s"${tableBase}_segs")
    }
    spark.catalog.refreshTable(s"${tableBase}_segs")
  }

  /** Pack an arriving batch in at the current stream cursor. Novel
    * doc_ids only (replay-safe); refuses non-monotone batches loudly.
    */
  def append(spark: SparkSession, tableBase: String,
      docs: DataFrame): Unit = {
    // The WHOLE read-decide-write is one leased critical section, not
    // just the write leg: the novelty probe and the Σ seg_len cursor
    // read are the read half of a read-modify-write, and two appends
    // that both read the cursor before either writes would pack
    // different docs at OVERLAPPING token offsets — exactly the silent
    // layout corruption the lease exists to refuse (r13 ADVICE; same
    // fix LmStore/DsirStore already carry on their _docs legs). It
    // also serializes against compact's generation swap on _segs.
    Bucketed.withWriterLease(spark, s"${tableBase}_segs") {
      // every read below is off the DEDUPED view: a torn append's
      // duplicate file pair must not inflate the cursor (which would
      // shift all later packing) any more than the novelty or bound
      // reads (review finding — the cursor was the one raw-table read)
      val segs = segments(spark, tableBase)
      // zero-token docs occupy no positions and never land in the index:
      // drop them BEFORE the novelty/monotone logic or a replayed batch
      // carrying one reads as eternally-novel and fails the monotone
      // check forever (review finding)
      val packableDocs = graft.operators.CurationPack.packable(docs)
      // novel-only: a crash-replayed batch packs zero new docs
      val novel = packableDocs.join(segs.select(col("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      // ONE driver action for all three scalars the guards and the
      // cursor need — min of the novel batch, max of the stored index,
      // and the stream cursor Σ seg_len (r9 verdict finding #4: two
      // separate metadata-scale actions where one crossJoined agg does)
      val guard = novel.agg(min(col("doc_id")).as("mn"))
        .crossJoin(segs.agg(max(col("doc_id")).as("mx"),
          coalesce(sum(col("seg_len")), lit(0L)).as("off")))
        .collect()(0)
      if (!guard.isNullAt(0)) { // else: whole batch already packed
        require(guard.isNullAt(1) || guard.getLong(0) > guard.getLong(1),
          s"SeqStore $tableBase: append batch min doc_id ${guard.get(0)} " +
            s"does not exceed stored max ${guard.get(1)} — sequence packing " +
            "is an append-only layout; backfill requires a rebuild")
        val spark2 = docs.sparkSession
        import spark2.implicits._
        val off = Seq(guard.getLong(2)).toDF("off")
        packScoped(novel, off) {
          _.write.mode("append").format("parquet")
            .saveAsTable(s"${tableBase}_segs")
        }
      }
    }
    spark.catalog.refreshTable(s"${tableBase}_segs")
  }

  /** The segment index over everything packed — bit-identical to one
    * global `pack_sequences` pass over the same documents (in
    * doc_id-monotone append order).
    */
  def segments(spark: SparkSession, tableBase: String): DataFrame =
    spark.table(s"${tableBase}_segs").dropDuplicates()

  /** Rewrite to one sorted file (layout only). */
  def compact(spark: SparkSession, tableBase: String): Unit =
    Bucketed.compactPlain(spark, s"${tableBase}_segs",
      Seq("doc_id", "seg_idx"))
}
