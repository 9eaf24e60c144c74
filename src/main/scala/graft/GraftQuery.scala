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
}
