package graft.sources

import graft.functions.Vectors
import graft.operators.AnnPack
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Persisted embedding near-dup store — the SEMANTIC leg of the
  * incremental-store family ([[FingerprintStore]] exact, [[MinHashStore]]
  * lexical-minhash, [[AnnIndex]] top-k ANN, [[SearchIndex]] BM25,
  * [[LmStore]] LM scoring; SURVEY.md §2 C14): an arriving batch finds
  * every history embedding within cosine ≥ τ of its own — the C5/C10
  * near-dup verdict — against a 100 TB history whose vectors are read
  * in place, never reshuffled.
  *
  * Two tables under one base name:
  *  - `<base>_cells` — (label, cell, cv, cnrm, r): the per-(label, cell)
  *    centroid and ANGULAR RADIUS of the exact-bound IVF structure
  *    (built by [[AnnPack.labelCellsOf]] — the same arithmetic the
  *    in-query D6/C5 path is oracle-verified with). Metadata-scale
  *    (≤ maxCells rows per label), broadcast at probe time.
  *  - `<base>_lists` — (ckey, h_id, hv, hnrm): the history vectors,
  *    bucketed+sorted by `ckey` = label:cell fused into ONE composite
  *    join column (the [[MinHashStore]] lesson: a two-column
  *    (label, cell) join over a composite-bucketed table does not
  *    co-partition and re-shuffles the history).
  *
  * Probe shape at scale: the batch joins the broadcast cells table,
  * keeps cells whose exact angular upper bound clears τ
  * (UB = cos(max(0, angle(q, μ) − r)) + ε ≥ cos(q, x) for every member
  * x — recall is 1 BY CONSTRUCTION, same bound as D6), and sort-merge
  * joins the lists table on ckey with the history side reading its
  * buckets IN PLACE (no exchange above the store scan — spec-asserted).
  * Exact cosine decides; the cells only prune. History cost is paid
  * once at write; each batch pays its own size.
  *
  * Append ordering — radius FIRST: an appended vector may lie outside
  * its nearest cell's recorded radius, and a probe that read the new
  * lists rows under the OLD radius could prune the cell its match lives
  * in — a recall break. So `append` rewrites the cells table (radii
  * grown to cover the routed members, via the lease-guarded
  * generation-swapped [[Bucketed.rewritePlain]]) BEFORE the lists rows
  * land. A crash between the two legs leaves only a conservatively
  * WIDER radius — extra candidate cells, never a missed verdict — and
  * the replay converges: radius growth is `greatest` (idempotent) and
  * the probe collapses replayed duplicate lists rows at pair level.
  */
object EmbedStore {

  /** (vec_id, label, v, nrm) for an (vec_id, label, embedding) frame —
    * the same widening+norm discipline as every AnnPack query.
    */
  private def normed(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), col("label"),
      Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))

  /** label+cell as ONE join column, matching the lists table's bucket
    * spec — see [[MinHashStore]] on why the composite must be a single
    * column.
    */
  private def ckey(label: Column, cell: Column): Column =
    concat_ws(":", label.cast("string"), cell.cast("string"))

  private def listsRows(routed: DataFrame): DataFrame =
    routed.select(ckey(col("label"), col("cell")).as("ckey"),
      col("vec_id").as("h_id"), col("v").as("hv"), col("nrm").as("hnrm"))

  /** Land the history's cell and list tables at `path`. */
  def write(history: DataFrame, tableBase: String, path: String,
      buckets: Int = 8): Unit = {
    val spark = history.sparkSession
    val (centR, lists) = AnnPack.labelCellsOf(normed(history))
    Bucketed.writePlain(
      centR.select(col("label"), col("c_cell").as("cell"), col("cv"),
        col("cnrm"), col("r")),
      s"${tableBase}_cells", s"$path/cells", Seq("label", "cell"))
    Bucketed.writeBucketed(listsRows(lists),
      s"${tableBase}_lists", "ckey", buckets, s"$path/lists")
    spark.catalog.refreshTable(s"${tableBase}_cells")
  }

  /** Near-dup verdict for `batch` (vec_id, label, embedding) against
    * the store: (vec_id, n_hist_matches, hist_canonical, best_cos) —
    * one row per batch vector; -1 / 0 / 0.0 sentinels when no history
    * vector clears τ (deterministic aggregations only).
    */
  def dedupAgainst(spark: SparkSession, tableBase: String,
      batch: DataFrame, tau: Double = AnnPack.nearDupTau): DataFrame = {
    val cells = spark.table(s"${tableBase}_cells")
    val lists = spark.table(s"${tableBase}_lists")
    val n = normed(batch)
    // exact-bound cell pruning (D6's shape): the cells survive iff their
    // upper bound clears τ, so every cos ≥ τ member is in a probed cell
    val probes = n.join(broadcast(cells), Seq("label"))
      .withColumn("qang", AnnPack.clampedAngle(
        Vectors.cosine(col("v"), col("cv"), col("nrm"), col("cnrm"))))
      .withColumn("ub",
        cos(greatest(lit(0.0), col("qang") - col("r")))
          + lit(AnnPack.boundEps))
      .filter(col("ub") >= tau)
      .select(col("vec_id"), ckey(col("label"), col("cell")).as("ckey"),
        col("v").as("qv"), col("nrm").as("qn"))
    val verified = probes.join(lists, Seq("ckey"))
      // under the ingest contract vec ids are globally unique: a
      // self-pair means the store already holds THIS batch's rows — a
      // crash-replayed append; drop them so replayed verdicts match the
      // first attempt's
      .filter(col("vec_id") =!= col("h_id"))
      .withColumn("cos_sim",
        Vectors.cosine(col("qv"), col("hv"), col("qn"), col("hnrm")))
      .filter(col("cos_sim") >= tau)
      // a replayed append leaves duplicate lists rows; pair-level dedupe
      // (duplicates carry identical cos_sim) keeps n_hist_matches a
      // count of distinct history VECTORS
      .dropDuplicates("vec_id", "h_id")
    val verdicts = verified.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("__n"), min(col("h_id")).as("__hist"),
        max(col("cos_sim")).as("__best"))
    batch.select(col("vec_id")).join(verdicts, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("__n"), lit(0L)).as("n_hist_matches"),
        coalesce(col("__hist"), lit(-1L)).as("hist_canonical"),
        coalesce(col("__best"), lit(0.0)).as("best_cos"))
  }

  /** Fold `embs` (vec_id, label, embedding — typically the batch's
    * near-dup SURVIVORS; the policy is the caller's) into the history.
    * Known-label vectors route to their nearest EXISTING centroid (the
    * same deterministic argmax assignment `write` used — centroids are
    * the probe contract and never move on append; heavy drift ⇒
    * rebuild); vectors of a label the store has never seen form ONE new
    * cell per label (centroid = their mean, exact bound from their own
    * radius — a new label block starts small, and its cell splits at
    * the next rebuild). Cell radii grow to cover every routed member
    * BEFORE the lists rows land (see the class doc on why that order is
    * the recall-safe one). Re-appending a vec_id is tolerated at read
    * (pair-level dedupe), so crash replays converge.
    *
    * Single-writer — and here the contract is SHARPER than the
    * siblings': their appends are purely additive, so even two
    * interleaved appends that slip between each other's per-table
    * leases merely interleave files; this append REWRITES the cells
    * table (read-modify-write on the radii), so a second appender
    * interleaving between the two legs loses the first's radius growth
    * — a SILENT recall break the per-leg leases cannot catch (they only
    * refuse overlapping writes, and a same-process nested hold would
    * read as live contention). Serialize appends per store — one
    * ingest scheduler, which is the family contract anyway.
    */
  def append(spark: SparkSession, tableBase: String,
      embs: DataFrame): Unit = {
    val (routed, grownCells) = planAppend(spark, tableBase, embs)
    // radius first, lists second — the crash-safe order (class doc)
    appendCellsLeg(spark, tableBase, grownCells)
    appendListsLeg(spark, tableBase, routed)
    // free the plan's checkpointed RDDs once both legs landed — a
    // long-lived ingest loop would otherwise carry one retired batch
    // copy per append until the ContextCleaner collects it
    org.apache.spark.sql.GraftDatasetBridge.freeLocalCheckpoint(routed)
    org.apache.spark.sql.GraftDatasetBridge.freeLocalCheckpoint(grownCells)
  }

  /** The append's routing + radius computation, severed
    * (localCheckpoint) from the store state it read — individually
    * addressable so the spec can inject a crash between the two
    * mutation legs. Returns (routed members, the full new cells-table
    * content).
    */
  private[graft] def planAppend(spark: SparkSession, tableBase: String,
      embs: DataFrame): (DataFrame, DataFrame) = {
    val cellsT = s"${tableBase}_cells"
    val cells = spark.table(cellsT)
    val cent = cells.select(col("label"), col("cell"), col("cv"),
      col("cnrm"))
    val n = normed(embs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val labels = cells.select(col("label")).distinct()
      val known = n.join(broadcast(labels), Seq("label"), "left_semi")
      val fresh = n.join(broadcast(labels), Seq("label"), "left_anti")
      // one new cell per unseen label: centroid = member mean. The
      // mean's floating arithmetic need not be cross-engine portable —
      // the bound is valid for ANY (centroid, max-member-angle) pair,
      // and verdicts only ever come from exact cosines.
      val freshCent = fresh
        .select(col("label"), posexplode(col("v")).as(Seq("j", "x")))
        .groupBy(col("label"), col("j")).agg(avg(col("x")).as("c"))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("j"), col("c")))),
          e => e.getField("c")).as("cv"))
        .withColumn("cnrm", Vectors.norm(col("cv")))
        .withColumn("cell", lit(1).cast(IntegerType))
        .select(col("label"), col("cell"), col("cv"), col("cnrm"))
      val allCent = cent.unionByName(freshCent)
      // sever the routing before the cells rewrite mutates the catalog:
      // a lazily re-resolved `cells` below the union could otherwise
      // double-route the fresh labels on the post-swap table
      val routed = AnnPack.assignToCells(n, allCent)
        .select(col("vec_id"), col("label"), col("cell"), col("v"),
          col("nrm"))
        .localCheckpoint(true)
      val newRadii = routed.join(broadcast(allCent), Seq("label", "cell"))
        .withColumn("ang", AnnPack.clampedAngle(
          Vectors.cosine(col("v"), col("cv"), col("nrm"), col("cnrm"))))
        .groupBy(col("label"), col("cell")).agg(max(col("ang")).as("r_app"))
      val grown = cells.join(newRadii, Seq("label", "cell"), "left")
        .select(col("label"), col("cell"), col("cv"), col("cnrm"),
          greatest(col("r"), coalesce(col("r_app"), lit(0.0))).as("r"))
      val freshRows = freshCent.join(newRadii, Seq("label", "cell"))
        .select(col("label"), col("cell"), col("cv"), col("cnrm"),
          col("r_app").as("r"))
      // the new cells content is severed too: its write happens under
      // rewritePlain's generation swap, and a frame still reading the
      // pre-swap catalog state mid-write would be fragile
      (routed, grown.unionByName(freshRows).localCheckpoint(true))
    } finally n.unpersist()
  }

  private[graft] def appendCellsLeg(spark: SparkSession, tableBase: String,
      grownCells: DataFrame): Unit =
    Bucketed.rewritePlain(spark, s"${tableBase}_cells", grownCells,
      Seq("label", "cell"))

  private[graft] def appendListsLeg(spark: SparkSession, tableBase: String,
      routed: DataFrame): Unit =
    Bucketed.appendBucketed(spark, listsRows(routed),
      s"${tableBase}_lists")

  /** Rewrite the appended-to lists table back to one sorted file per
    * bucket, and the cells table to one file — run between ingest
    * batches to undo append amplification.
    */
  def compact(spark: SparkSession, tableBase: String): Unit = {
    Bucketed.compactBucketed(spark, s"${tableBase}_lists")
    Bucketed.compactPlain(spark, s"${tableBase}_cells",
      Seq("label", "cell"))
  }
}
