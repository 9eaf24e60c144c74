package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling aggregation (SURVEY.md §5).
  *
  * A `groupBy(key).agg(...)` over a key with a pathological hot value
  * sends every hot row to one reducer. For ALGEBRAIC aggregates (sum,
  * count, min, max — anything with a partial form) the fix is two-phase
  * salted aggregation: phase 1 groups on (key, salt) so the hot key's
  * rows spread across `salts` reducers and map-side partial aggregation
  * still applies; phase 2 re-aggregates the per-salt partials on the key
  * alone — by then the hot key is `salts` rows, not millions.
  *
  * The salt must be DETERMINISTIC per row (here: a hash of a caller-
  * chosen discriminator column, e.g. a unique id) — `rand()`-salting
  * breaks retry idempotence: a re-executed task would re-draw salts and
  * double-count rows its first attempt already shipped.
  *
  * Note AQE's skew handling only splits skewed JOIN partitions, not
  * aggregation groups — hot-key aggregation remains the query author's
  * concern, which is what this helper packages.
  */
object Skew {

  /** Two-phase salted sum/count per key.
    *
    * @param disc deterministic per-row discriminator (unique-ish id)
    * @param salts phase-1 fanout per key
    */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     disc: Column, salts: Int): DataFrame =
    df.groupBy(key.as("key"), pmod(Portable.hash60(disc.cast("string")),
        lit(salts.toLong)).as("__salt"))
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).as("n"))
}
