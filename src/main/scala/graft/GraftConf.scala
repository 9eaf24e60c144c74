package graft

import org.apache.spark.sql.SparkSession

/** The 100 TB scale knobs, surfaced as Spark conf settings (r11 verdict
  * polish item: "a knob you must recompile to turn is not a knob").
  * Every bound that exists to keep a degenerate corpus shape from going
  * quadratic — hot-bucket admission caps, IVF cell geometry — reads
  * here at plan-build time, so an operator of a real cluster tunes them
  * per job (`--conf spark.graft.ann.maxCells=256`) instead of editing a
  * private constant. Defaults are the audited values every gate and
  * scale row ran at; the specs that pin the degenerate shapes pass
  * explicit values, so the conf path and the parameter path are the
  * same code.
  */
object GraftConf {

  /** IVF cell geometry of the shared exact-bound cell engine
    * (AnnPack.labelCellsOf): per-group cell count is
    * ceil(|group| / targetCellSize) clamped to [2, maxCells] per
    * hierarchy level.
    */
  val TargetCellSizeKey = "spark.graft.ann.targetCellSize"
  val MaxCellsKey = "spark.graft.ann.maxCells"

  /** Lloyd (assign+recenter) rounds at the LEAF level of the
    * hierarchical cell build (multi-parent blocks only — the
    * single-parent fast path every gate corpus takes keeps its audited
    * one-round shape). Hash-ordered seeds are effectively random
    * members, and one round off them orphans a constant fraction of
    * natural clusters across leaf boundaries — the orphaned leaf's
    * radius balloons and the exact upper bound stops pruning it. Each
    * extra round costs one assign+recenter pass over the block; recall
    * stays 1 at ANY round count (radii cover final membership), so
    * this knob trades build passes against candidate mass, never
    * correctness.
    */
  val LeafLloydRoundsKey = "spark.graft.ann.leafLloydRounds"

  /** Orphan threshold (degrees) of the hierarchical build's post-assign
    * reseed pass (multi-parent blocks only): members further than this
    * angle from their assigned leaf centroid — overwhelmingly the
    * members of natural clusters the random seeding missed, which
    * Lloyd rounds cannot recover because an empty cell dies in
    * recenter — are pulled into one fresh per-parent seed+assign round
    * of their own. Their old leaves' radii tighten (radii cover final
    * membership), so the exact upper bound prunes again. Recall stays
    * 1 at ANY threshold; the knob trades one extra bounded pass
    * against candidate mass. ≤ 0 disables the pass (treated as an
    * infinite threshold — every member keeps its leaf).
    */
  val OrphanAngleDegKey = "spark.graft.ann.orphanAngleDeg"

  /** Refinement trigger for the REFINED single-level band (blocks
    * between the single-level clamp and l1Slack× it): after the
    * round-1 assignment — which is needed regardless — the build peeks
    * the fraction of members further than orphanAngleDeg from their
    * round-1 centroid. Past this fraction the block is a similarity
    * CONTINUUM: there is no minority of unseeded clusters to isolate,
    * a reseed would just re-cluster the whole block (which round 1
    * already did), and the extra Lloyd/orphan passes buy ~nothing
    * (measured on sf0.1 media vectors: frac 0.96, −3.4% candidate
    * mass for ~3× build wall) — so the build keeps the audited
    * one-round structure. Below it, a minority of far members marks
    * orphaned natural clusters and the full leaf refinement runs
    * (measured on planted 30-member clusters: frac 0.61, 15× mass
    * reduction). Multi-parent (hierarchical) builds refine
    * UNCONDITIONALLY: their block sizes amortize the passes, and even
    * continuum-like corpora measured −22% mass there (the 8× media
    * sweep) — the trigger exists for the band where stage overhead
    * dominates.
    */
  val OrphanMaxFracKey = "spark.graft.ann.orphanMaxFrac"

  /** In-query hot-bucket admission caps (smallest-doc_id TopKPerKey on
    * the index side of the band/bucket self-joins).
    */
  val SimhashMaxPerBucketKey = "spark.graft.simhash.maxPerBucket"
  val MinhashMaxPerBucketKey = "spark.graft.minhash.maxPerBucket"
  val AnnBandMaxPerBucketKey = "spark.graft.ann.bandMaxPerBucket"

  /** Banded (hyperplane-sign LSH) range-engine geometry
    * (AnnPack.bandedRangeCandidatesOf): `bandNumBands` independent
    * bands, each keyed by the first `bits` sign bits of its
    * `bandMaxBits`-bit plane block, where `bits` derives from the label
    * block size n as the smallest b with bandTargetLoad·2^b ≥ n
    * (clamped to [4, bandMaxBits]). The plane count DERIVES as
    * bands × maxBits, so raising either knob adds planes consistently.
    * The r12 ladder topped out at compile-time constants: past
    * n ≈ targetLoad·2^maxBits (~262k at the defaults) per label,
    * `bits` clamps, bucket load grows linearly again, and the
    * bandMaxPerBucket cap truncates with a smallest-id retention bias
    * — recall decays on exactly the mega-blocks the engine exists for.
    * These keys make that point operable: a corpus with bigger label
    * blocks raises maxBits (each +1 doubles the ladder's reach) or
    * targetLoad per job, no recompile. The DuckDB gate oracles mirror
    * the DEFAULTS — gate rows must run at default geometry; specs that
    * turn the knobs assert engine-side invariants (mass bounds,
    * recall), not oracle hashes.
    */
  val BandNumBandsKey = "spark.graft.ann.bandNumBands"
  val BandMaxBitsKey = "spark.graft.ann.bandMaxBits"
  val BandTargetLoadKey = "spark.graft.ann.bandTargetLoad"

  /** Range-pair engine dispatch for the composed consumers (C10
    * semantic_dedup's pair generation, C16's election input, F7's
    * media verdict): `exact` (default — the recall-1 cell-bound path
    * every brute-force oracle verifies) or `banded` (the
    * linear-mass-by-construction LSH path; recall is the LSH contract,
    * pair graph ⊆ exact's at the same τ). The gate rows run at the
    * default; a 100× unstructured corpus flips this per job instead of
    * paying the exact path's data-dependent candidate curve.
    */
  val RangeEngineKey = "spark.graft.ann.rangeEngine"

  val DefaultTargetCellSize = 24
  val DefaultMaxCells = 64
  val DefaultMaxPerBucket = 1024
  val DefaultLeafLloydRounds = 2
  val DefaultOrphanAngleDeg = 30.0
  val DefaultOrphanMaxFrac = 0.8
  val DefaultBandNumBands = 8
  val DefaultBandMaxBits = 16
  val DefaultBandTargetLoad = 4
  val DefaultRangeEngine = "exact"

  private def intConf(s: SparkSession, key: String, default: Int): Int =
    s.conf.getOption(key).map(_.trim.toInt).getOrElse(default)

  def targetCellSize(s: SparkSession): Int =
    intConf(s, TargetCellSizeKey, DefaultTargetCellSize)

  def maxCells(s: SparkSession): Int = {
    val mc = intConf(s, MaxCellsKey, DefaultMaxCells)
    // the composite leaf id (c1−1)·2·maxCells + cell tops out at
    // 2·maxCells² and is an IntegerType column — past this ceiling the
    // cast would wrap and distinct leaves would silently collide into
    // one id (members cross-matched with wrong centroids), so fail
    // loudly at plan-build instead
    require(mc >= 2 && mc <= 16384,
      s"$MaxCellsKey must be in [2, 16384] (the composite leaf id " +
        s"2*maxCells^2 must fit an Int), got $mc")
    mc
  }

  def leafLloydRounds(s: SparkSession): Int =
    intConf(s, LeafLloydRoundsKey, DefaultLeafLloydRounds)

  def orphanAngleDeg(s: SparkSession): Double =
    s.conf.getOption(OrphanAngleDegKey).map(_.trim.toDouble)
      .getOrElse(DefaultOrphanAngleDeg)

  def orphanMaxFrac(s: SparkSession): Double =
    s.conf.getOption(OrphanMaxFracKey).map(_.trim.toDouble)
      .getOrElse(DefaultOrphanMaxFrac)

  def simhashMaxPerBucket(s: SparkSession): Int =
    intConf(s, SimhashMaxPerBucketKey, DefaultMaxPerBucket)

  def minhashMaxPerBucket(s: SparkSession): Int =
    intConf(s, MinhashMaxPerBucketKey, DefaultMaxPerBucket)

  def annBandMaxPerBucket(s: SparkSession): Int =
    intConf(s, AnnBandMaxPerBucketKey, DefaultMaxPerBucket)

  def bandNumBands(s: SparkSession): Int =
    intConf(s, BandNumBandsKey, DefaultBandNumBands)

  def bandMaxBits(s: SparkSession): Int =
    intConf(s, BandMaxBitsKey, DefaultBandMaxBits)

  def bandTargetLoad(s: SparkSession): Int =
    intConf(s, BandTargetLoadKey, DefaultBandTargetLoad)

  def rangeEngine(s: SparkSession): String = {
    val v = s.conf.getOption(RangeEngineKey).map(_.trim.toLowerCase)
      .getOrElse(DefaultRangeEngine)
    require(v == "exact" || v == "banded",
      s"$RangeEngineKey must be 'exact' or 'banded', got '$v'")
    v
  }
}
