package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2/§7.
  *
  * All operators live in [[QueryPack]] modules; this object is only the
  * aggregation point the driver calls.
  */
object SparkEntry {

  private def packs: Seq[QueryPack] = Seq(
    operators.Analytics,
    operators.CloudFrontPack,
    operators.TimeSeriesPack,
    operators.TextPack,
    operators.SearchPack,
    operators.DedupPack,
    operators.SimHashPack,
    operators.AnnPack,
    operators.MediaPack,
    operators.CurationPack)

  private lazy val registry: Map[String, GraftQuery] = {
    val all = packs.flatMap(_.queries)
    require(all.map(_.name).distinct.size == all.size,
      "duplicate query names across packs")
    all.map(q => q.name -> q).toMap
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The reference README's own headline query — synthesized
    * lines through the parser, melted to Timestream records, ago(24h),
    * bin(1h) × edge location, SUM(CASE measure_name).
    */
  def entry(spark: SparkSession): DataFrame =
    registry("q_timestream_headline").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, q) => n -> q.fn }

  /** Named builders for the packs' cross-query shared caches, in pack
    * declaration order — the benchmark's explicit warmup phase (see
    * [[QueryPack.warm]]).
    */
  def warmups: Seq[(String, (SparkSession, String) => DataFrame)] =
    packs.flatMap(_.warm)

  /** DuckDB-runnable oracle SQL for each oracle-verifiable query. */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, q) if q.oracle.isDefined =>
      n -> q.oracle.get.stripMargin.trim
    }
}
