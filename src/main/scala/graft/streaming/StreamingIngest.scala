package graft.streaming

import graft.sources.{FingerprintStore, MinHashStore, SearchIndex, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** The persisted-store ingest loop (SURVEY.md §2 C11/C12/D9's append
  * legs) as a streaming composition: each arriving micro-batch is
  * deduped against the history stores — exact fingerprints first, then
  * MinHash near-dup on the exact survivors — and its novel content is
  * folded back in, so micro-batch N+1 sees micro-batch N as history.
  * This is the production shape of continuous corpus ingest: the
  * history never rescans, each batch pays its own size.
  *
  * `foreachBatch` is the right seam for the loop body: it MUTATES
  * external bucketed tables, which no exactly-once streaming sink can
  * express. Replay semantics under crash are therefore the stores'
  * append semantics, spec-pinned by StreamingIngestSpec's injected
  * crashes at both points:
  *  - crash BETWEEN the appends (fp landed, mh did not): the replay's
  *    fingerprint verdicts are identical to the first attempt's —
  *    `dup_of_history` excludes rows whose history canonical is the
  *    batch's own election (exactly what the crashed append wrote) —
  *    its fp re-append is a no-op (the novel-only anti-join sees the
  *    first attempt's rows), and its mh append lands exactly what the
  *    clean run would have: stores AND verdicts end bit-identical.
  *  - crash AFTER both appends (before the sink consumed the verdicts):
  *    the replay's near-dup verdicts stay identical because the band
  *    probe drops self-pairs (a batch doc can meet its own crashed
  *    append in the store); the mh re-append duplicates band/shingle
  *    rows, which widens candidate sets but cannot change any later
  *    verdict (the exact Jaccard verify is per (batch, history) PAIR,
  *    deduped before the verify join). One caveat: batch-internal
  *    NEAR-dup pairs (below) are visible to each other on such a
  *    replay — they were both appended as history.
  *
  * Within-batch NEAR-dups are intentionally out of scope here (both
  * land as history): that decision belongs to the in-corpus pass
  * ([[StreamingMinHash]] / C2) upstream of ingest, not to the
  * history probe.
  */
object StreamingIngest {

  /** Dedup one arriving batch against the persisted stores and fold
    * its novel content back in. Returns the verdict frame, one row per
    * batch doc: (doc_id, canonical_id, dup_of_history, is_dup,
    * n_hist_matches, hist_canonical, best_jaccard); the minhash
    * columns are NULL for exact dups — an exact dup is not probed
    * against the band store.
    *
    * Ordering inside is load-bearing: every derived frame is
    * localCheckpoint-ed (eager, batch-sized) BEFORE the appends mutate
    * the stores — a lazy verdict recomputed after the append would see
    * the batch's own content as history. The probe's featurized
    * working set is scoped to this call (persisted untracked,
    * unpersisted once the verdicts are severed) — the loop never
    * touches the process-wide cache registry, so it can run alongside
    * query workloads whose shared caches must stay hot.
    */
  def processBatch(spark: SparkSession, fpTable: String, mhBase: String,
      batch: DataFrame): DataFrame =
    processBatch(spark, fpTable, mhBase, None, batch)

  /** As the 4-arg overload, plus an optional [[SearchIndex]] leg: the
    * batch's KEPT docs (exact-unique, no history near-dup — exactly the
    * set appended to the band store) also land in the BM25 index, so
    * each micro-batch is lexically searchable as soon as its verdicts
    * are out.
    *
    * The index append runs BEFORE the band-store append, and the
    * ordering is load-bearing: the band store is the one mutation that
    * changes a REPLAY's own verdicts (a replayed batch's within-batch
    * near-dup pair meets itself as history — distinct ids, so the
    * self-pair drop does not apply — shrinking the replay's `kept`).
    * Were the index leg after the band append, a crash between them
    * would leave those docs in the band store but permanently
    * unindexed: the replay's smaller `kept` never offers them to the
    * index again. Index-first, every crash point replays converged:
    * before/inside the index append the band store is untouched, so
    * the replay re-derives the SAME `kept` and the index append
    * converges on its own contract (novelty filter + idempotent-at-
    * read legs); after the band append, both stores already hold the
    * full attempt-1 `kept`.
    */
  def processBatch(spark: SparkSession, fpTable: String, mhBase: String,
      searchBase: Option[String], batch: DataFrame): DataFrame = {
    // one materialization of the micro-batch: it feeds the exact probe,
    // the survivor join and both appends, and a foreachBatch source
    // frame re-executes per action otherwise
    val b = batch.localCheckpoint(true)
    val exact = FingerprintStore.dedupAgainst(spark, fpTable, b)
      .localCheckpoint(true)
    val survivors = b
      .join(exact.filter(!col("is_dup")).select("doc_id"), "doc_id")
      .localCheckpoint(true)
    val (nearRaw, bsh) =
      MinHashStore.dedupAgainstScoped(spark, mhBase, survivors)
    val near = nearRaw.localCheckpoint(true)
    bsh.unpersist()
    // the dedup verdict's keep set — severed frames only, so the joins
    // below stay correct after the appends mutate the stores
    val kept = survivors.join(
      near.filter(col("n_hist_matches") === 0).select("doc_id"), "doc_id")
    // novel content becomes history for the NEXT batch — index leg
    // strictly before the band append (see the ordering note above)
    FingerprintStore.append(spark, fpTable, b)
    searchBase.foreach(sb => SearchIndex.append(spark, sb, kept))
    MinHashStore.append(spark, mhBase, kept)
    exact
      .select(col("doc_id"), col("canonical_id"), col("dup_of_history"),
        col("is_dup"))
      .join(near.select(col("doc_id"), col("n_hist_matches"),
        col("hist_canonical"), col("best_jaccard")), Seq("doc_id"), "left")
  }

  /** Wire a (doc_id, text) stream through [[processBatch]]; per-batch
    * verdicts go to `sink` (e.g. a parquet append, an alerting bus).
    */
  def run(spark: SparkSession, stream: DataFrame, fpTable: String,
      mhBase: String, sink: (DataFrame, Long) => Unit): StreamingQuery =
    run(spark, stream, fpTable, mhBase, None, sink)

  /** As [[run]], with the optional BM25-index leg of the 5-arg
    * [[processBatch]].
    */
  def run(spark: SparkSession, stream: DataFrame, fpTable: String,
      mhBase: String, searchBase: Option[String],
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    stream.writeStream
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(processBatch(spark, fpTable, mhBase, searchBase, batch), id)
      }
      .start()

  /** Runnable demo: seed the stores from a third of `documents`, then
    * stream the rest through the ingest loop in two micro-batches.
    *
    * {{{
    *   sbt "runMain graft.streaming.StreamingIngest <dataDir> [workDir]"
    * }}}
    */
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: StreamingIngest <dataDir> [workDir] — dataDir holds " +
        "documents.parquet (graft testdata layout)")
    val dataDir = args(0)
    val workDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ingest-demo")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, dataDir)
      .select(col("doc_id"), col("text"))
    FingerprintStore.write(docs.filter(col("doc_id") % 3 === 0),
      "ingest_fp", s"$workDir/fp")
    MinHashStore.write(docs.filter(col("doc_id") % 3 === 0),
      "ingest_mh", s"$workDir/mh")
    SearchIndex.write(docs.filter(col("doc_id") % 3 === 0),
      "ingest_search", s"$workDir/search")
    println(s"[ingest] seeded history stores at $workDir")

    // two arrival files + maxFilesPerTrigger=1 → two real micro-batches
    val incoming = s"$workDir/incoming"
    docs.filter(col("doc_id") % 3 === 1).coalesce(1)
      .write.parquet(s"$incoming/b1")
    docs.filter(col("doc_id") % 3 === 2).coalesce(1)
      .write.parquet(s"$incoming/b2")
    val stream = spark.readStream.schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true")
      .parquet(incoming)
    val q = run(spark, stream, "ingest_fp", "ingest_mh",
      Some("ingest_search"), (v, id) => {
      val s = v.agg(
        count(lit(1)).as("docs"),
        sum(col("dup_of_history").cast("long")).as("exact_hist_dups"),
        sum((col("n_hist_matches") > 0).cast("long")).as("near_hist_dups"))
        .collect()(0)
      println(s"[ingest] batch $id: ${s.getLong(0)} docs, " +
        s"${s.getLong(1)} exact history dups, " +
        s"${s.getLong(2)} near history dups")
    })
    q.processAllAvailable(); q.stop()
    println(s"[ingest] final store sizes: " +
      s"fp=${spark.table("ingest_fp").count()} fingerprints, " +
      s"mh=${spark.table("ingest_mh_shingles").count()} shingle sets, " +
      s"search=${spark.table("ingest_search_postings").count()} postings")
    val hits = SearchIndex.search(spark, "ingest_search",
      Seq("table", "data", "query"), 5).collect()
    println(s"[ingest] bm25 probe over the live index: " +
      hits.map(r => s"doc ${r.getLong(0)} score ${r.getLong(2)}")
        .mkString(", "))
    spark.stop()
  }
}
