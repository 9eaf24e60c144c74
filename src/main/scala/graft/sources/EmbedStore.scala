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
  * Four tables under one base name — the exact cell leg (recall 1 by
  * construction, candidate mass data-dependent) and the BANDED leg
  * (r13: candidate mass linear by construction, recall the LSH
  * contract — see the banded section below):
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
  *
  * Canonical policy — STABILITY: hist_canonical is the smallest
  * matching history id, a pure function of (store, batch) — never a
  * quality rank, which would couple replayed verdicts to a mutable
  * score table (the full argument on [[FingerprintStore]]).
  * Quality-aware election is the downstream C16 composition
  * ([[graft.operators.DedupPack.bestCanonicalOf]]).
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

  /** Land the history's cell and list tables at `path`, plus the
    * BANDED leg (r13 — the r12 verdict's top task: the exact cell
    * probe's candidate mass is data-dependent, measured 63.4× at 8× on
    * unstructured vectors, so a 100 TB history needs the
    * linear-by-construction path persisted too).
    */
  def write(history: DataFrame, tableBase: String, path: String,
      buckets: Int = 8): Unit = {
    val spark = history.sparkSession
    val n = normed(history)
    val (centR, lists) = AnnPack.labelCellsOf(n)
    Bucketed.writePlain(
      centR.select(col("label"), col("c_cell").as("cell"), col("cv"),
        col("cnrm"), col("r")),
      s"${tableBase}_cells", s"$path/cells", Seq("label", "cell"))
    Bucketed.writeBucketed(listsRows(lists),
      s"${tableBase}_lists", "ckey", buckets, s"$path/lists")
    writeBandedLeg(spark, n, tableBase, path, buckets)
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

  // ---- the BANDED leg (r13): hyperplane-sign band keys persisted
  // beside the exact cell structure, so a probe can take the
  // linear-mass-by-construction path against a 100 TB history ----
  //
  // Two more tables under the same base name:
  //  - `<base>_bbits` — (label, bits, dim, bands, max_bits, cont,
  //    bgen, n_meas, n_app): the per-label band-key width, FROZEN at
  //    the label's first write (the LmStore frozen-threshold
  //    discipline: the ladder's input is the block size, which appends
  //    grow — re-deriving bits on append would re-key the label's
  //    ENTIRE history, a rebuild in disguise; frozen-by-contract is
  //    the honest incremental design, and bits only gates candidate
  //    recall, never a verdict — those come from exact cosines).
  //    dim/bands/max_bits pin the plane geometry the probe must
  //    rebuild (md5-derived planes regenerate bit-identically from
  //    these three ints); `cont` is the frozen per-label continuum
  //    routing flag the auto probe reads (r14); `bgen` is the banded
  //    leg's SERVING key generation — the single value the atomic
  //    rebuild's commit flips (r15); n_meas/n_app are the staleness
  //    basis [[bandedStaleness]] reports. Metadata-scale.
  //  - `<base>_bands` — (bkey, h_id, hv, hnrm, bgen): the banded
  //    inverted index, bucketed+sorted by `bkey` = label:band:key
  //    fused into ONE composite column (the MinHashStore lesson), the
  //    index side capped at `spark.graft.ann.bandMaxPerBucket`
  //    SMALLEST h_ids per key at write, every row stamped with its
  //    key generation (probes read only the serving one — see
  //    [[servingBands]]; pre-r15 tables lack the column and pass
  //    unfiltered). Vectors are stored inline (×bands duplication —
  //    the classic LSH index trade) so the probe never joins back
  //    through the corpus-scale lists table. Under the SLIM layout
  //    (r14, spark.graft.ann.bandStoreLayout=slim) the rows are
  //    (bkey, h_id, bgen) only and the payload lives ONCE in
  //  - `<base>_bvecs` — (h_id, hv, hnrm), bucketed by h_id: 1× the
  //    vector payload instead of ×bands, traded for one extra
  //    candidate-scale sort-merge join at probe time. Generation-free
  //    (content is h_id → payload, stable across rebuilds). The
  //    layout is frozen into the store (probes detect it from the
  //    _bands schema); a declared rebuildBandedLeg may change it.
  //
  // Append is additive: new rows are capped PER BATCH, so a bucket can
  // exceed the cap by one cap's worth per append generation until a
  // rebuild — compaction preserves rows (re-capping would change
  // verdicts under the replayers' feet). Recall is the LSH contract
  // (dup-regime pairs collide with probability ≈ 1; borderline-τ pairs
  // may be missed); the exact cell leg stays the recall-1 path.

  /** EVERY banded sidecar present — the one existence test all banded
    * call sites key on (r13 ADVICE: append/probe keyed on _bbits while
    * compact keyed on _bands, so the two torn states a crash inside
    * [[writeBandedLeg]] can leave — _bbits-only, or _bands-only after
    * a torn backfill — each made one path throw instead of heal). A
    * SLIM-layout store (r14) additionally needs its `_bvecs` payload
    * table: slim `_bands` rows carry no vectors, so a torn
    * slim write without `_bvecs` must heal too.
    */
  private def bandedLegComplete(spark: SparkSession,
      tableBase: String): Boolean =
    spark.catalog.tableExists(s"${tableBase}_bbits") &&
      spark.catalog.tableExists(s"${tableBase}_bands") &&
      (!bandedLayoutSlim(spark, tableBase) ||
        spark.catalog.tableExists(s"${tableBase}_bvecs"))

  /** The frozen banded storage layout, detected from the `_bands`
    * schema (slim rows carry no inline vector payload) — the probe,
    * append and compact must follow what the store IS, not what the
    * current conf says ([[graft.GraftConf.BandStoreLayoutKey]] is a
    * write/rebuild-time knob).
    */
  private def bandedLayoutSlim(spark: SparkSession,
      tableBase: String): Boolean =
    !spark.table(s"${tableBase}_bands").columns.contains("hv")

  /** The slim layout's once-per-vector payload rows. */
  private def bvecsRows(n: DataFrame): DataFrame =
    n.select(col("vec_id").as("h_id"), col("v").as("hv"),
      col("nrm").as("hnrm"))

  /** label+band+key as ONE join column, matching the bands table's
    * bucket spec.
    */
  private def bkey3(label: Column, band: Column, key: Column): Column =
    concat_ws(":", label.cast("string"), band.cast("string"), key)

  /** Banded index rows for a normed frame under a frozen bits table —
    * capped at `cap` smallest h_ids per key (TopKPerKey bounded heap).
    * `slim` drops the inline vector payload BEFORE the cap heap (the
    * r14 slim layout: keys shuffle at ~16 bytes/row instead of the
    * vector width — the write gets cheaper along with the storage).
    * `bgen` (r15) stamps each row with the banded-leg GENERATION it
    * belongs to — the column the atomic [[rebuildBandedLeg]] keys its
    * serve-through on; `None` keeps the pre-r15 row shape for appends
    * into a store whose `_bands` table has no `bgen` column yet.
    */
  private def bandsRowsOf(n: DataFrame, bbits: DataFrame, dim: Int,
      numBands: Int, maxBits: Int, cap: Int, slim: Boolean,
      bgen: Option[Int]): DataFrame = {
    val rows0 = n.withColumn("v", AnnPack.bandDimGuard(dim))
      .withColumn("sigbits", AnnPack.bandSigBits(dim, numBands * maxBits))
      .join(broadcast(bbits.select(col("label"), col("bits"))),
        Seq("label"))
      .select(col("vec_id").as("h_id"), col("label"), col("v"),
        col("nrm"), explode(AnnPack.bandKeyCols(numBands, maxBits))
          .as("bk"))
      .select(bkey3(col("label"), col("bk.band"), col("bk.key"))
          .as("bkey"),
        col("h_id"), col("v").as("hv"), col("nrm").as("hnrm"))
    val rows1 = if (slim) rows0.select(col("bkey"), col("h_id")) else rows0
    val rows = bgen match {
      case Some(g) => rows1.withColumn("bgen", lit(g))
      case None => rows1
    }
    graft.plans.TopKPerKey(rows, Seq(col("bkey")),
      Seq(col("h_id").asc), cap)
  }

  /** The banded leg's SERVING key generation — the max non-null `bgen`
    * in `_bbits` (uniform by the write/append/rebuild invariant; max
    * only defends a half-upgraded legacy store), or 1 when the column
    * is absent or all-null: pre-r15 stores, and — by the same
    * convention the upgrade rebuild stamps its pre-existing rows
    * with — the state an interrupted first rebuild leaves (`_bands`
    * re-written with old rows stamped 1, the `_bbits` commit not yet
    * landed). Metadata-scale peek.
    */
  private def servingGen(spark: SparkSession, tableBase: String): Int = {
    val bbits = spark.table(s"${tableBase}_bbits")
    if (!bbits.columns.contains("bgen")) 1
    else bbits.agg(max(col("bgen"))).collect().headOption
      .filterNot(_.isNullAt(0)).map(_.getInt(0)).getOrElse(1)
  }

  /** The `_bands` table restricted to the SERVING generation: rows of
    * a staged-but-uncommitted rebuild (higher `bgen`) and a committed
    * one's not-yet-cleaned elder rows (lower `bgen`) are both filtered
    * out AT THE SCAN (a pushed-down int predicate), so every probe
    * reads exactly one internally-consistent key generation. Tables
    * without the column (pre-r15) pass through unfiltered.
    */
  private def servingBands(spark: SparkSession,
      tableBase: String): DataFrame = {
    val bands = spark.table(s"${tableBase}_bands")
    if (bands.columns.contains("bgen"))
      bands.filter(col("bgen") === servingGen(spark, tableBase))
        .drop("bgen")
    else bands
  }

  /** The `_bbits` sidecar content for a normed history `n` under the
    * given geometry, stamped with key generation `bgen` (≤|labels|
    * rows). FREEZES the continuum statistic per label (r14): the
    * build/rebuild is the one moment the store can MEASURE
    * clusteredness — the same round-1 orphan fraction the in-query
    * auto dispatch and the cell build's trigger read — so the auto
    * probe router can send clustered mega-labels to the recall-1 exact
    * leg and only continuum ones to the banded leg. Measured on the
    * >clamp labels only (~3 passes over just their rows, once per
    * build/rebuild); under-clamp labels are never continuum-routed.
    * Frozen like bits: appends do not re-measure (a declared rebuild
    * does) — which is why the row also records the STALENESS basis
    * (r15 — the r14 verdict's task 5): `n_meas` is the block size this
    * measurement saw, `n_app` counts rows appended since (grown by
    * [[bandedAppendLeg]]); [[bandedStaleness]] surfaces the ratio. The
    * cont verdict joins back in as a broadcast routing frame (r15 —
    * never a literal isin list; see [[AnnPack.labelFrame]]).
    */
  private def bbitsPlan(spark: SparkSession, n: DataFrame, dim: Int,
      numBands: Int, maxBits: Int, targetLoad: Int,
      bgen: Int): DataFrame = {
    val tcs = graft.GraftConf.targetCellSize(spark)
    val mc = graft.GraftConf.maxCells(spark)
    val clamp = tcs.toLong * mc
    val cnt = n.groupBy(col("label")).agg(count(lit(1)).as("n_l"))
    val bigLabels = cnt.filter(col("n_l") > clamp).select(col("label"))
      .collect().map(_.get(0)).toSeq
    val contLabels = if (bigLabels.isEmpty) Seq.empty[Any]
      else AnnPack.round1OrphanFracByLabel(
          n.join(broadcast(cnt.filter(col("n_l") > clamp)
            .select(col("label"))), Seq("label"), "left_semi"), tcs, mc)
        .filter(_.getDouble(1) > graft.GraftConf.orphanMaxFrac(spark))
        .map(_.get(0)).toSeq
    val contDf = AnnPack.labelFrame(spark, n.schema("label").dataType,
      contLabels).withColumn("__cont", lit(true))
    cnt.join(broadcast(contDf), Seq("label"), "left")
      .select(col("label"),
        AnnPack.bandBitsCol(maxBits, targetLoad).as("bits"),
        lit(dim).as("dim"), lit(numBands).as("bands"),
        lit(maxBits).as("max_bits"),
        coalesce(col("__cont"), lit(false)).as("cont"),
        lit(bgen).as("bgen"), col("n_l").as("n_meas"),
        lit(0L).as("n_app"))
  }

  private def writeBandedLeg(spark: SparkSession, n: DataFrame,
      tableBase: String, path: String, buckets: Int): Unit = {
    val numBands = graft.GraftConf.bandNumBands(spark)
    val maxBits = graft.GraftConf.bandMaxBits(spark)
    val targetLoad = graft.GraftConf.bandTargetLoad(spark)
    // same fail-fast as the in-query engine: an out-of-range conf here
    // would FREEZE mis-keyed geometry into the store for its lifetime
    AnnPack.requireBandGeometry(numBands, maxBits, targetLoad)
    val cap = graft.GraftConf.annBandMaxPerBucket(spark)
    val slim = graft.GraftConf.bandStoreLayout(spark) == "slim"
    // the geometry peek: one driver-side width read per store BUILD
    // (not per probe); an empty history freezes dim=1 with zero labels,
    // which every probe then short-circuits on
    val dim = n.select(size(col("v")).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(1)
    // a fresh build starts the key-generation clock at 1
    val bbits = bbitsPlan(spark, n, dim, numBands, maxBits, targetLoad,
      bgen = 1)
    Bucketed.writePlain(bbits, s"${tableBase}_bbits", s"$path/bbits",
      Seq("label"))
    // slim payload table BEFORE the keys table: a crash between the
    // two leaves bands missing → bandedLegComplete heals; the reverse
    // order would leave keys referencing vectors the probe's inner
    // join silently drops — a permanent recall hole
    if (slim)
      Bucketed.writeBucketed(bvecsRows(n), s"${tableBase}_bvecs",
        "h_id", buckets, s"$path/bvecs")
    else if (spark.catalog.tableExists(s"${tableBase}_bvecs")) {
      // a declared inline (re)build of a formerly-slim store retires
      // the payload sidecar, or the stale table would shadow the next
      // slim rebuild's fresh one
      spark.sql(s"DROP TABLE IF EXISTS ${tableBase}_bvecs")
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(
          s"$path/bvecs*"))).getOrElse(Array.empty)
        .foreach(st => fs.delete(st.getPath, true))
    }
    Bucketed.writeBucketed(
      bandsRowsOf(n, spark.table(s"${tableBase}_bbits"), dim, numBands,
        maxBits, cap, slim, bgen = Some(1)),
      s"${tableBase}_bands", "bkey", buckets, s"$path/bands")
    spark.catalog.refreshTable(s"${tableBase}_bbits")
  }

  /** Near-dup verdict for `batch` through the BANDED leg — same
    * verdict row shape as [[dedupAgainst]] ((vec_id, n_hist_matches,
    * hist_canonical, best_cos), sentinels when nothing clears τ), but
    * candidates come from the persisted band keys: the batch rebuilds
    * signatures under the store's FROZEN geometry, multi-probes each
    * band's exact key plus every single-bit flip, and sort-merge joins
    * the bands table on the composite bkey with the history side
    * reading its buckets IN PLACE (no exchange above the store scan —
    * spec-asserted). Candidate mass per batch vector is bounded by
    * bands·(bits+1)·cap BY CONSTRUCTION, against any history — the
    * 100 TB path the exact cell probe cannot promise (its mass is
    * data-dependent; measured 63.4× at 8× on unstructured vectors).
    * Recall is the LSH contract; verdicts only ever come from exact
    * cosines, so every returned match is real (banded verdicts ⊆ the
    * exact leg's).
    */
  def bandedDedupAgainst(spark: SparkSession, tableBase: String,
      batch: DataFrame, tau: Double = AnnPack.nearDupTau): DataFrame = {
    require(bandedLegComplete(spark, tableBase),
      s"EmbedStore '$tableBase' has no complete banded leg (persisted " +
        "before the banded sidecar tables existed, or a crash tore the " +
        "leg mid-write): run append() or compact() once to backfill it " +
        "from the history, or rebuild with write(). The exact-leg probe " +
        "(dedupAgainst) works unchanged meanwhile.")
    val bbits = spark.table(s"${tableBase}_bbits")
    val meta = bbits.select(col("dim"), col("bands"), col("max_bits"))
      .limit(1).collect()
    val empty = batch.select(col("vec_id"),
      lit(0L).as("n_hist_matches"), lit(-1L).as("hist_canonical"),
      lit(0.0).as("best_cos"))
    if (meta.isEmpty) return empty
    val (dim, numBands, maxBits) =
      (meta.head.getInt(0), meta.head.getInt(1), meta.head.getInt(2))
    // only the SERVING key generation (r15): a staged-but-uncommitted
    // rebuild's fresh rows and a committed one's not-yet-cleaned elder
    // rows are both invisible, so the probe always reads one
    // internally-consistent geometry
    val bands = servingBands(spark, tableBase)
    val n = normed(batch)
    // labels the store has never seen drop at the inner bits join (no
    // history ⇒ no verdict) and re-attach through the final left join
    val sigs = n.withColumn("v", AnnPack.bandDimGuard(dim))
      .withColumn("sigbits", AnnPack.bandSigBits(dim, numBands * maxBits))
      .join(broadcast(bbits.select(col("label"), col("bits"))),
        Seq("label"))
    val probes = sigs
      .select(col("vec_id"), col("label"), col("bits"),
        explode(AnnPack.bandKeyCols(numBands, maxBits)).as("bk"))
      .select(col("vec_id"), col("label"), col("bits"),
        col("bk.band").as("band"), col("bk.key").as("key0"))
      .select(col("vec_id"), col("label"), col("band"),
        explode(AnnPack.bandProbeKeys(maxBits)).as("key"))
      .select(col("vec_id"),
        bkey3(col("label"), col("band"), col("key")).as("bkey"))
    val cand = probes.join(bands, Seq("bkey"))
      // globally-unique ingest ids: a self-pair is a crash-replayed
      // append of THIS batch (same contract as the exact leg)
      .filter(col("vec_id") =!= col("h_id"))
      // multi-band hits AND replayed duplicate bands rows collapse at
      // pair level BEFORE the cosine (duplicates carry identical hv —
      // and before the slim layout's payload join, so the join input
      // is one row per candidate pair)
      .dropDuplicates("vec_id", "h_id")
    // slim layout (r14): the bands rows carry no payload — fetch it
    // through the h_id-bucketed _bvecs table (candidate-scale batch
    // side shuffles; the corpus-scale vecs side reads its buckets in
    // place). Replayed duplicate _bvecs rows collapse AT THE SCAN
    // (dropDuplicates on the bucket key = a bucket-local aggregate,
    // no exchange — duplicates carry identical payload under the
    // globally-unique-id ingest contract), so the join emits one row
    // per candidate pair without a second candidate-scale shuffle
    val withPayload = if (bandedLayoutSlim(spark, tableBase))
      cand.select(col("vec_id"), col("h_id"))
        .join(spark.table(s"${tableBase}_bvecs").dropDuplicates("h_id"),
          Seq("h_id"))
    else cand
    val verified = withPayload
      .join(n.select(col("vec_id"), col("v").as("qv"),
        col("nrm").as("qn")), Seq("vec_id"))
      .withColumn("cos_sim",
        Vectors.cosine(col("qv"), col("hv"), col("qn"), col("hnrm")))
      .filter(col("cos_sim") >= tau)
    val verdicts = verified.groupBy(col("vec_id"))
      .agg(count(lit(1)).as("__n"), min(col("h_id")).as("__hist"),
        max(col("cos_sim")).as("__best"))
    batch.select(col("vec_id")).join(verdicts, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("__n"), lit(0L)).as("n_hist_matches"),
        coalesce(col("__hist"), lit(-1L)).as("hist_canonical"),
        coalesce(col("__best"), lit(0.0)).as("best_cos"))
  }

  /** Conf-dispatched probe (r13 — the consumer-routing task): ONE
    * entry point for callers that should not hard-code the engine
    * (the StreamingIngest embed leg), switched by
    * `spark.graft.ann.rangeEngine` exactly like the in-query
    * [[graft.operators.AnnPack.rangePairsAuto]] dispatcher — `exact`
    * (default; recall 1, candidate mass data-dependent), `banded`
    * (mass bounded by construction; LSH recall, verdicts ⊆ exact's),
    * or `auto` (r14): PER-LABEL routing. Same verdict row shape either
    * way, so a 100 TB ingest flips one conf instead of editing the
    * topology.
    */
  def dedupAgainstAuto(spark: SparkSession, tableBase: String,
      batch: DataFrame, tau: Double = AnnPack.nearDupTau): DataFrame =
    graft.GraftConf.rangeEngine(spark) match {
      case "banded" => bandedDedupAgainst(spark, tableBase, batch, tau)
      case "auto" => autoDedupAgainst(spark, tableBase, batch, tau)
      case _ => dedupAgainst(spark, tableBase, batch, tau)
    }

  /** PER-LABEL auto probe (r14 — the r13 verdict's task 1, store
    * side). The routing statistic is the FROZEN per-label continuum
    * flag the build measured into `_bbits.cont` (the same round-1
    * orphan fraction the in-query auto dispatch and the cell build's
    * trigger read — the build is the one moment clusteredness is
    * measurable without a probe-time corpus pass): cont=true labels —
    * continuum mega-blocks, where the exact probe's candidate mass is
    * data-inherently super-linear — route through the banded leg's
    * by-construction mass bound; everything else (small labels AND
    * clustered mega-labels, whose refined/hierarchical cells keep the
    * exact mass near-linear) keeps the recall-1 exact probe. Labels
    * whose flag is NULL/absent — pre-r14 stores, or rows appended to
    * one before its first rebuild — fall back per label to the
    * metadata-scale cell-count saturation signal (count == maxCells ⇔
    * history ≥ the single-level clamp at build; size-only, but both
    * engines are verdict-sound and banded ⊆ exact). Batch labels the
    * store has never seen take the exact side (sentinels either way).
    */
  /** Per-tableBase memo of the routing stat, keyed on the sidecar
    * tables' LOCATIONS: both `_bbits` and `_cells` are rewritten
    * generation-swapped on every append/rebuild (their location URIs
    * move to the next `__gN` sibling), so an unchanged key proves the
    * routing inputs are byte-identical and a repeated probe of an
    * unchanged store skips the peek entirely (r16 — the r15 verdict's
    * task 2 memoization). One entry per tableBase, replaced on key
    * change, so a long ingest loop holds one stat per store, ever.
    */
  private[graft] val routingStatMemo =
    new java.util.concurrent.ConcurrentHashMap[
      String, (String, (Long, Seq[Any]))]()
  graft.Caches.onRelease(() => routingStatMemo.clear())

  /** The banded-routing stat as ONE bounded driver peek (r16): label
    * count plus the banded-eligible label list, computed in-query off
    * the metadata-scale sidecars — the old shape collected the FULL
    * per-label `_cells` counts and the full `_bbits` cont map on every
    * probe, |labels| rows at a high-cardinality label space. Eligible
    * labels are cont=true (frozen continuum measurement) or, where the
    * flag is NULL/absent (pre-r14 stores, unmeasured appends), the
    * cell-count saturation fallback `n_cells = maxCells` ⇔ history at
    * or past the single-level clamp — so every eligible label is a
    * LARGE label and the collected list is history-size/clamp-bounded,
    * never |labels|-bounded. The bbits join and the collect_list
    * wrapper are null-safe (a NULL label group routes like any other —
    * the AnnPack.splitByLabels discipline).
    */
  private[graft] def bandedRoutingStat(spark: SparkSession,
      tableBase: String): (Long, Seq[Any]) = {
    val bbitsT = s"${tableBase}_bbits"
    val cellsT = s"${tableBase}_cells"
    // location + createTime: the generation swap moves the location
    // (append/rebuild invalidate), and a same-path fresh write() after
    // a drop gets a new createTime (a reused path must not serve the
    // dropped store's stat)
    def loc(t: String): String = {
      val m = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(t))
      s"${m.location}@${m.createTime}"
    }
    val hasCont = spark.catalog.tableExists(bbitsT) &&
      spark.table(bbitsT).columns.contains("cont")
    val key = (if (hasCont) loc(bbitsT) else "") + "|" + loc(cellsT)
    val memo = routingStatMemo.get(tableBase)
    if (memo != null && memo._1 == key) return memo._2
    val mc = graft.GraftConf.maxCells(spark)
    val cells = spark.table(cellsT)
      .groupBy(col("label")).agg(count(lit(1)).as("n_cells"))
    val flagged = if (hasCont) {
      val bb = spark.table(bbitsT)
        .select(col("label").as("__bl"), col("cont"))
      cells.join(broadcast(bb), col("label") <=> col("__bl"), "left")
    } else cells.withColumn("cont",
      lit(null).cast(org.apache.spark.sql.types.BooleanType))
    val row = flagged
      .agg(count(lit(1)).as("n_labels"),
        collect_list(when(
          coalesce(col("cont"), col("n_cells") >= mc),
          struct(col("label")))).as("banded"))
      .collect()(0)
    val stat = (row.getLong(0),
      row.getSeq[org.apache.spark.sql.Row](1).map(_.get(0)))
    routingStatMemo.put(tableBase, (key, stat))
    stat
  }

  private def autoDedupAgainst(spark: SparkSession, tableBase: String,
      batch: DataFrame, tau: Double): DataFrame = {
    val (nLabels, bandedLabels) = bandedRoutingStat(spark, tableBase)
    if (bandedLabels.isEmpty)
      return dedupAgainst(spark, tableBase, batch, tau)
    if (bandedLabels.size == nLabels)
      return bandedDedupAgainst(spark, tableBase, batch, tau)
    // the routing decision re-enters as a broadcast-joined frame, not
    // a literal isin list (r15 — see AnnPack.labelFrame); unseen-label
    // batch rows land on the exact side via the anti join, same as the
    // old predicate routed them
    val (bandedSide, exactSide) = AnnPack.splitByLabels(batch, bandedLabels)
    dedupAgainst(spark, tableBase, exactSide, tau)
      .unionByName(bandedDedupAgainst(spark, tableBase, bandedSide, tau))
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
    // radius first, lists second — the crash-safe order (class doc);
    // the banded leg last: a crash before it leaves the exact leg
    // complete and the banded index merely missing this batch (an
    // LSH-recall gap, never a false verdict), and the replay's
    // duplicate bands rows collapse at pair level like the lists'
    appendCellsLeg(spark, tableBase, grownCells)
    appendListsLeg(spark, tableBase, routed)
    bandedAppendLeg(spark, tableBase, routed)
    // free the plan's checkpointed RDDs once the legs landed — a
    // long-lived ingest loop would otherwise carry one retired batch
    // copy per append until the ContextCleaner collects it
    org.apache.spark.sql.GraftDatasetBridge.freeLocalCheckpoint(routed)
    org.apache.spark.sql.GraftDatasetBridge.freeLocalCheckpoint(grownCells)
  }

  /** `_bbits` content widened to the full current column set — absent
    * columns (pre-r14 `cont`, pre-r15 `bgen`/`n_meas`/`n_app`) surface
    * as NULLs, which every reader already treats as "unmeasured"
    * (the auto router's cell-count fallback; [[bandedStaleness]]'s
    * null fraction; [[servingGen]]'s gen-1 default).
    */
  private def withBbitsCols(bbits: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
    val cols: Seq[(String, DataType)] = Seq("cont" -> BooleanType,
      "bgen" -> IntegerType, "n_meas" -> LongType, "n_app" -> LongType)
    cols.foldLeft(bbits) { case (df, (c, t)) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(t))
    }
  }

  /** The banded leg of an append: freeze bits for labels the store has
    * never seen (their first write — the ladder runs on THIS batch's
    * block size), grow every touched label's `n_app` staleness counter
    * (r15 — the cont flag is FROZEN, so the counter is what tells an
    * operator the measurement's basis has drifted; see
    * [[bandedStaleness]]), then land the batch's capped band-key rows
    * bucket-aligned under the SERVING key generation. Known labels
    * keep their frozen bits (class doc on why re-deriving would be a
    * rebuild in disguise). Purely additive on the bands table, so
    * replays converge through the probe's pair-level dedupe; the bbits
    * rewrite is generation-swapped, and a crash-replayed append can
    * only double-count `n_app` — an ADVISORY counter no verdict ever
    * reads, where over-counting merely recommends a rebuild earlier.
    */
  private[graft] def bandedAppendLeg(spark: SparkSession,
      tableBase: String, routed: DataFrame): Unit = {
    val bbitsT = s"${tableBase}_bbits"
    if (!bandedLegComplete(spark, tableBase)) {
      // store persisted before the banded leg existed — or a crash
      // inside writeBandedLeg tore it between the _bbits and _bands
      // writes (r13 ADVICE: keying the check on _bbits alone made the
      // torn state die on _bands instead of healing) — upgrade in
      // place. The lists leg already holds THIS append's batch
      // (appendListsLeg lands first), so the history backfill covers
      // history + batch in one pass and the per-batch band append is
      // skipped this once.
      backfillBandedLeg(spark, tableBase)
      return
    }
    val bbits = spark.table(bbitsT)
    val meta = bbits.select(col("dim"), col("bands"), col("max_bits"))
      .limit(1).collect()
    // an empty-history store froze no geometry: this append IS the
    // first write — freeze from the batch + current conf
    val dim = meta.headOption.map(_.getInt(0)).getOrElse(
      routed.select(size(col("v")).as("d")).limit(1).collect()
        .headOption.map(_.getInt(0)).getOrElse(1))
    val numBands = meta.headOption.map(_.getInt(1))
      .getOrElse(graft.GraftConf.bandNumBands(spark))
    val maxBits = meta.headOption.map(_.getInt(2))
      .getOrElse(graft.GraftConf.bandMaxBits(spark))
    val targetLoad = graft.GraftConf.bandTargetLoad(spark)
    // frozen geometry was validated at write; the empty-history
    // first-write fallback reads the conf and must fail fast the same
    // way write() does
    AnnPack.requireBandGeometry(numBands, maxBits, targetLoad)
    val cap = graft.GraftConf.annBandMaxPerBucket(spark)
    val gServe = servingGen(spark, tableBase)
    val batchCnt = routed.groupBy(col("label"))
      .agg(count(lit(1)).as("n_l"))
    val fresh = batchCnt
      .join(broadcast(bbits.select(col("label"))), Seq("label"),
        "left_anti")
      .select(col("label"),
        AnnPack.bandBitsCol(maxBits, targetLoad).as("bits"),
        lit(dim).as("dim"), lit(numBands).as("bands"),
        lit(maxBits).as("max_bits"),
        // a fresh label starts as ONE new cell — clusteredness is not
        // measured on appends (the frozen discipline); it stays
        // exact-routed until a declared rebuild re-measures. n_meas is
        // the block size that implicit verdict was based on.
        lit(false).as("cont"), lit(gServe).as("bgen"),
        col("n_l").as("n_meas"), lit(0L).as("n_app"))
    // known labels: n_app += this batch's block contribution (the
    // r15 staleness counter). One metadata-scale generation-swapped
    // rewrite per append — the same cost class as the cells-radius
    // rewrite the append already pays.
    val grown = withBbitsCols(bbits)
      .join(batchCnt.select(col("label"), col("n_l").as("__b_n")),
        Seq("label"), "left")
      .withColumn("n_app",
        coalesce(col("n_app"), lit(0L)) + coalesce(col("__b_n"), lit(0L)))
      .drop("__b_n")
    Bucketed.rewritePlain(spark, bbitsT, grown.unionByName(fresh),
      Seq("label"))
    // the append follows the store's FROZEN layout, not the current
    // conf; payload rows land BEFORE key rows (same crash ordering
    // as the build: keys referencing absent vectors would be a
    // silent recall hole, extra unreferenced vectors are harmless
    // and the replay's duplicates collapse at pair level)
    val slim = bandedLayoutSlim(spark, tableBase)
    if (slim)
      Bucketed.appendBucketed(spark,
        bvecsRows(routed.select(col("vec_id"), col("v"), col("nrm"))),
        s"${tableBase}_bvecs")
    // new key rows join the SERVING generation (stamped only when the
    // table carries the column — a pre-r15 store's rows stay unstamped
    // until its first rebuild introduces the column)
    val genOpt = if (spark.table(s"${tableBase}_bands").columns
        .contains("bgen")) Some(gServe) else None
    Bucketed.appendBucketed(spark,
      bandsRowsOf(
        routed.select(col("vec_id"), col("label"), col("v"),
          col("nrm")),
        spark.table(bbitsT), dim, numBands, maxBits, cap, slim, genOpt),
      s"${tableBase}_bands")
  }

  /** Once-only in-place upgrade of a store persisted before the banded
    * leg existed: build `_bbits`/`_bands` from the FULL persisted
    * history — a batch-only backfill would leave every pre-upgrade
    * vector outside the banded index, a permanent recall hole against
    * the store contract — at the store's own catalog-derived location
    * and bucket count. Labels come back TYPED via the metadata-scale
    * cells table (the lists table fuses them into the string ckey).
    * Called from append()/compact() when the sidecars are missing; the
    * banded probe fails loudly instead (read-only paths stay
    * read-only).
    */
  /** The store's full persisted history as a normed (vec_id, label, v,
    * nrm) frame, plus the catalog-derived base path and bucket count —
    * shared by the banded backfill and the declared rebuild. Labels
    * come back TYPED via the metadata-scale cells table (the lists
    * table fuses them into the string ckey).
    */
  private def persistedHistory(spark: SparkSession,
      tableBase: String): (DataFrame, String, Int) = {
    val cat = spark.sessionState.catalog
    val listsMeta = cat.getTableMetadata(spark.sessionState.sqlParser
      .parseTableIdentifier(s"${tableBase}_lists"))
    // lists lives at <base>/lists[__gN] (compaction swaps generations)
    val base = new org.apache.hadoop.fs.Path(
      listsMeta.location.toString.stripSuffix("/")
        .replaceAll("__g\\d+$", "")).getParent.toString
    val buckets = listsMeta.bucketSpec.map(_.numBuckets).getOrElse(8)
    val cellLabels = spark.table(s"${tableBase}_cells")
      .select(ckey(col("label"), col("cell")).as("ckey"), col("label"))
    val hist = spark.table(s"${tableBase}_lists")
      .join(broadcast(cellLabels), Seq("ckey"))
      .select(col("h_id").as("vec_id"), col("label"),
        col("hv").as("v"), col("hnrm").as("nrm"))
    (hist, base, buckets)
  }

  private def backfillBandedLeg(spark: SparkSession,
      tableBase: String): Unit = {
    val (hist, base, buckets) = persistedHistory(spark, tableBase)
    writeBandedLeg(spark, hist, tableBase, base, buckets)
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

  /** Declared REBUILD of the banded leg (r14 — the r13 verdict's task
    * 2; r15 — the r14 verdict's task 3: GENERATION-ATOMIC): re-derives
    * per-label bits (and the cont routing flags, resetting the
    * staleness clock) from the CURRENT history block sizes and re-caps
    * every bucket at the current bandMaxPerBucket — the maintenance op
    * that re-tightens the probe's mass bound after many appends. The
    * bandMaxPerBucket cap applies per append GENERATION, so G appends
    * can grow a hot bucket to G·cap and the probe's bands·(bits+1)·cap
    * bound degrades linearly in append count (the growth spec measures
    * it); compact() deliberately preserves rows — a row-preserving
    * compaction must not change verdicts under a replayer's feet — so
    * the re-tightening needs a DECLARED op with the opposite contract.
    *
    * SERVE-THROUGH (r15): the r14 rebuild dropped the keys table
    * first — crash-safe (a torn rebuild left the leg loudly
    * incomplete, never silently mixed-geometry) but unavailable: every
    * banded/auto probe refused for the whole rebuild. This version
    * keeps the old leg serving at every instant by staging the new key
    * generation BESIDE the old one and committing with ONE atomic
    * catalog swap:
    *  1. [[rebuildStage]] — payload first ([[bvecsRows]] re-landed for
    *     slim stores, superset-safe for concurrent readers), then ONE
    *     generation-swapped `_bands` rewrite holding old-serving ∪
    *     newly-derived rows, each stamped with its `bgen`. Probes
    *     still read the old generation: [[servingBands]] filters on
    *     the `_bbits` generation, which has not moved.
    *  2. [[rebuildCommit]] — the atomic step: `_bbits` rewritten
    *     (generation-swapped, [[Bucketed.rewritePlain]]) with the
    *     re-derived bits/cont/staleness rows stamped `bgen = old + 1`.
    *     Before it, every probe serves pre-rebuild verdicts; after it,
    *     post-rebuild ones — a crash ANYWHERE leaves whichever side
    *     the commit landed on fully serving, never a refusal, never
    *     mixed geometry.
    *  3. [[rebuildCleanup]] — retires the elder generation's rows with
    *     one more `_bands` rewrite (storage-only: elder rows are
    *     already invisible to [[servingBands]]; a crash here costs
    *     bytes, and the next rebuild's stage drops them anyway).
    * The serve-through costs one extra full `_bands` write (stage
    * holds both generations) — the price of availability; the r14
    * tear-down path remains for the one rebuild the staged design
    * cannot hold in a single table: a LAYOUT migration (inline↔slim
    * changes the `_bands` schema itself).
    *
    * Replay safety: a rebuild changes which candidates the banded
    * probe sees (re-derived bits re-key labels; re-capping drops
    * high-id rows from hot buckets), so banded verdicts for batches
    * probed AFTER it may differ from a replay of batches probed BEFORE
    * it — exactly like rebuilding the whole store with write(). Run it
    * at a replay barrier (all in-flight batches committed, none
    * awaiting replay), never between a crash and its replay. The exact
    * leg — and its recall-1 verdicts — are untouched.
    */
  def rebuildBandedLeg(spark: SparkSession, tableBase: String): Unit = {
    if (!bandedLegComplete(spark, tableBase)) {
      // nothing is serving — a torn write/pre-banded store: plain heal
      backfillBandedLeg(spark, tableBase)
      return
    }
    if ((graft.GraftConf.bandStoreLayout(spark) == "slim")
        != bandedLayoutSlim(spark, tableBase)) {
      // LAYOUT migration changes the _bands schema itself, which the
      // serve-through stage cannot hold two generations of in one
      // table: tear the keys table down FIRST (the r14 ordering
      // argument — a crash mid-migration leaves the leg loudly
      // INCOMPLETE, which the probe refuses and the next
      // append/compact/rebuild heals, never silently mixed-geometry)
      spark.sql(s"DROP TABLE IF EXISTS ${tableBase}_bands")
      backfillBandedLeg(spark, tableBase)
      return
    }
    val staged = rebuildStage(spark, tableBase)
    try {
      rebuildCommit(spark, tableBase, staged)
      rebuildCleanup(spark, tableBase, staged.gen)
    } finally
      org.apache.spark.sql.GraftDatasetBridge
        .freeLocalCheckpoint(staged.bbits)
  }

  /** A staged-but-uncommitted banded rebuild: the new key generation's
    * number and the `_bbits` content whose landing IS the commit. The
    * bbits frame is local-checkpointed (≤|labels| rows) — severed from
    * every table the commit and cleanup rewrite; the caller frees it.
    */
  private[graft] case class StagedRebuild(gen: Int, bbits: DataFrame)

  /** Stage a banded rebuild (step 1 of [[rebuildBandedLeg]]'s doc):
    * derives the new generation from the full persisted history and
    * lands it in `_bands` BESIDE the serving rows. Individually
    * addressable (the planAppend discipline) so the crash spec can
    * stop here and assert the old generation still serves.
    */
  private[graft] def rebuildStage(spark: SparkSession,
      tableBase: String): StagedRebuild = {
    val numBands = graft.GraftConf.bandNumBands(spark)
    val maxBits = graft.GraftConf.bandMaxBits(spark)
    val targetLoad = graft.GraftConf.bandTargetLoad(spark)
    AnnPack.requireBandGeometry(numBands, maxBits, targetLoad)
    val cap = graft.GraftConf.annBandMaxPerBucket(spark)
    val slim = bandedLayoutSlim(spark, tableBase)
    val gOld = servingGen(spark, tableBase)
    val gNew = gOld + 1
    // crash-replayed appends can leave duplicate history rows; the
    // rebuild collapses them so its output ≡ a fresh write() of the
    // deduplicated history. Persisted: the dedup shuffle feeds the dim
    // peek, the cont measurement, the payload re-land and the key
    // derivation — four consumers, one corpus pass.
    val hist = persistedHistory(spark, tableBase)._1
      .dropDuplicates("vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val dim = hist.select(size(col("v")).as("d")).limit(1).collect()
        .headOption.map(_.getInt(0)).getOrElse(1)
      // severed: the commit must not re-scan the corpus, and the frame
      // must survive the _bands rewrite below
      val bbitsNew = bbitsPlan(spark, hist, dim, numBands, maxBits,
        targetLoad, gNew).localCheckpoint(true)
      // payload BEFORE keys (the class-wide crash ordering): for slim
      // stores the payload table is re-landed from the full history —
      // a SUPERSET of every h_id either generation's keys reference
      // (replay-duplicate rows collapse; concurrent readers see the
      // retired generation's files under rewrite grace)
      if (slim)
        Bucketed.rewriteBucketed(spark, s"${tableBase}_bvecs",
          bvecsRows(hist))
      val bandsT = s"${tableBase}_bands"
      val old = spark.table(bandsT)
      // serving rows ride along stamped with their generation (a
      // pre-r15 table's unstamped rows ARE the serving generation —
      // stamp gOld, which servingGen resolves to 1 for such stores);
      // orphans of a previously crashed stage (bgen ≠ serving) are
      // dropped here
      val servingOld =
        if (old.columns.contains("bgen")) old.filter(col("bgen") === gOld)
        else old.withColumn("bgen", lit(gOld))
      Bucketed.rewriteBucketed(spark, bandsT, servingOld.unionByName(
        bandsRowsOf(hist, bbitsNew, dim, numBands, maxBits, cap, slim,
          Some(gNew))))
      StagedRebuild(gNew, bbitsNew)
    } finally hist.unpersist()
  }

  /** Commit a staged rebuild (step 2): ONE generation-swapped rewrite
    * of the metadata-scale `_bbits` — the atomic flip every probe's
    * [[servingGen]] keys on.
    */
  private[graft] def rebuildCommit(spark: SparkSession, tableBase: String,
      staged: StagedRebuild): Unit =
    Bucketed.rewritePlain(spark, s"${tableBase}_bbits", staged.bbits,
      Seq("label"))

  /** Retire the elder key generation's rows (step 3 — storage only:
    * [[servingBands]] already filters them out of every probe).
    */
  private[graft] def rebuildCleanup(spark: SparkSession,
      tableBase: String, gen: Int): Unit = {
    val bandsT = s"${tableBase}_bands"
    Bucketed.rewriteBucketed(spark, bandsT,
      spark.table(bandsT).filter(col("bgen") === gen))
  }

  /** Per-label staleness of the FROZEN cont routing flag (r15 — the
    * r14 verdict's task 5): appends never re-measure clusteredness, so
    * a label that drifts from clustered to continuum after heavy
    * appends keeps the exact route — and its super-linear candidate
    * mass — until a declared [[rebuildBandedLeg]] re-measures.
    * Returns (label, cont, bgen, n_meas, n_app, stale_frac) off the
    * metadata-scale `_bbits`: `n_meas` is the label block size the
    * cont measurement saw, `n_app` the rows appended since (advisory —
    * a crash-replayed append may double-count, which only recommends
    * the rebuild EARLIER), `stale_frac` = n_app / (n_meas + n_app) the
    * fraction of the label's current block the measurement never saw.
    * NULL n_meas/stale_frac marks a pre-r15 store (unmeasured basis).
    * Operating threshold: docs/SCALING.md recommends rebuilding at
    * stale_frac > 0.5 — past it the majority of the block postdates
    * the measurement, so the frozen flag is a coin flip, and the
    * rebuild ALSO re-tightens the cap bound the same appends degraded.
    */
  def bandedStaleness(spark: SparkSession, tableBase: String): DataFrame =
    withBbitsCols(spark.table(s"${tableBase}_bbits"))
      .select(col("label"), col("cont"), col("bgen"), col("n_meas"),
        col("n_app"),
        (col("n_app").cast("double") / (col("n_meas") + col("n_app")))
          .as("stale_frac"))

  /** Rewrite the appended-to lists table back to one sorted file per
    * bucket, and the cells table to one file — run between ingest
    * batches to undo append amplification.
    */
  def compact(spark: SparkSession, tableBase: String): Unit = {
    Bucketed.compactBucketed(spark, s"${tableBase}_lists")
    Bucketed.compactPlain(spark, s"${tableBase}_cells",
      Seq("label", "cell"))
    // banded leg: rows preserved exactly — re-capping across append
    // generations here would CHANGE verdicts under a replayer; the cap
    // is a per-generation write bound, a rebuild re-tightens it. A
    // store persisted before the banded leg existed has no sidecars
    // yet — compaction is a maintenance write window, so upgrade it
    // here from the (just-compacted) history. The check is on BOTH
    // sidecars (r13 ADVICE): a crash between the _bbits and _bands
    // writes leaves either-only states that must heal, not throw.
    if (!bandedLegComplete(spark, tableBase))
      backfillBandedLeg(spark, tableBase)
    else {
      Bucketed.compactBucketed(spark, s"${tableBase}_bands")
      Bucketed.compactPlain(spark, s"${tableBase}_bbits", Seq("label"))
      if (bandedLayoutSlim(spark, tableBase))
        Bucketed.compactBucketed(spark, s"${tableBase}_bvecs")
    }
  }
}
