package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator from SURVEY.md §2: a Spark query over the
  * testdata tables plus (optionally) the ANSI-SQL oracle the driver runs
  * in DuckDB against the same parquet tables.
  *
  * Determinism contract (SURVEY.md §6): column names aliased identically
  * on both sides; double outputs derived from exact decimal sums or
  * explicitly rounded; top-k orderings carry a unique tiebreaker.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** A module of related queries (one per SURVEY.md §2 block). */
trait QueryPack {
  def queries: Seq[GraftQuery]

  /** Named builders for this pack's CROSS-QUERY shared working sets
    * (persisted featurized frames several queries reuse through the
    * CacheManager's plan-identity dedupe). A benchmark harness
    * materializes these in an explicit warmup phase so their one-off
    * build cost is attributed by name instead of landing on whichever
    * query happens to touch the cache first — without warmup,
    * round-over-round per-query cold comparisons are meaningless
    * (round 5: cf_top_uris charged 28.6 s for the shared parse cache).
    * Only frames shared by MULTIPLE queries belong here; a
    * single-query persist is that query's real work.
    */
  def warm: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
    org.apache.spark.sql.DataFrame)] = Nil
}
