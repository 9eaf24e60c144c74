package graft.timeseries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Timestream-style time-series query primitives over ordinary DataFrames
  * (the reference's query surface: README.md example queries use
  * bin(time, 1h), ago(24h), SUM(measure) GROUP BY dimension, and
  * CREATE_TIME_SERIES(time, value)).
  *
  * All primitives are pure column expressions or single-shuffle
  * aggregations — each composes into whatever plan the caller builds and
  * stays inside whole-stage codegen.
  */
object TimeSeries {

  /** Timestream `bin(ts, interval)`: floor ts to a multiple of
    * `binSeconds` since the epoch. Pure long arithmetic (no float
    * round-trip) so it is exact for any timestamp and any bin width.
    */
  def bin(ts: Column, binSeconds: Long): Column = {
    val us = binSeconds * 1000000L
    val u = unix_micros(ts.cast(TimestampType))
    timestamp_micros(u - pmod(u, lit(us)))
  }

  /** Timestream `time >= ago(N)` made deterministic for batch data: the
    * anchor is max(ts) of the dataset itself (a 1-row broadcast, not a
    * driver collect — stays one lazy plan).
    */
  def ago(df: DataFrame, tsCol: String, seconds: Long): DataFrame = {
    val anchor = df.agg(max(col(tsCol)).as("__anchor"))
    df.join(broadcast(anchor),
        col(tsCol) >= col("__anchor") - expr(s"INTERVAL $seconds SECONDS"))
      .drop("__anchor")
  }

  /** Timestream CREATE_TIME_SERIES(time, value): per group key, the
    * time-ordered array of measure values. `tiebreak` makes ordering total
    * when timestamps collide. Requires bounded per-key cardinality (same
    * constraint Timestream places on a series) — one shuffle on the key,
    * partial collect_list on the map side.
    */
  def createTimeSeries(df: DataFrame, key: Column, ts: Column,
                       tiebreak: Column, value: Column): DataFrame =
    df.groupBy(key)
      .agg(transform(
        array_sort(collect_list(struct(ts.as("t"), tiebreak.as("k"),
          value.as("v")))),
        x => x.getField("v")).as("series"))

  /** Two-table as-of join: for every left row, the most recent right row
    * with the same key and right.ts <= left.ts. Implemented as the
    * shuffle-minimal union-and-carry shape: tag both sides, ONE shuffle
    * on the key, sort within partitions by (ts, side, tiebreak) — right
    * rows before left rows at equal timestamps, matching `>=` as-of
    * semantics — then a running last-non-null carries each right value
    * forward. No per-row probe, no range join, no broadcast requirement
    * on either side: both sides stream through a single window, which is
    * the property that matters when BOTH tables are 100 TB facts.
    *
    * @param rightTiebreak column making right-side ordering total when
    *                      right timestamps collide (determinism).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, rightVals: Seq[String],
               rightTiebreak: Column = lit(0)): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tb", lit(0))
    val r0 = right.select((key +: rightTs +: rightVals).map(col): _*)
    val r = rightVals.foldLeft(
        r0.withColumn("__t", col(rightTs))
          .withColumn("__side", lit(0))
          .withColumn("__tb", rightTiebreak)) {
      (df, v) => df.withColumnRenamed(v, s"__r_$v")
    }
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(u) { (df, v) =>
      df.withColumn(s"asof_$v",
        last(col(s"__r_$v"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .drop(("__t" +: "__side" +: "__tb" +: rightTs +:
        rightVals.map(v => s"__r_$v")): _*)
  }

  /** Mergeable-sketch pre-aggregation — the scale path for distinct
    * counts a dashboard asks at many granularities. Build one HLL sketch
    * per (key, day) — a few-KB binary, map-side combinable — persist
    * that PRE-AGGREGATE, and answer any coarser rollup (weekly, whole-
    * period, per-key) by unioning sketches instead of rescanning raw
    * data. At
    * 100 TB the raw scan happens once; every rollup after it touches
    * only days × keys rows.
    */
  def dailyDistinctSketches(df: DataFrame, key: Column, ts: Column,
                            id: Column): DataFrame =
    df.groupBy(key.as("key"), bin(ts, 86400).cast(TimestampNTZType).as("day"))
      .agg(hll_sketch_agg(id).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Roll daily sketches up to one estimate per key (union is exact over
    * sketches: same answer as sketching the raw data directly).
    */
  def rollupDistinct(daily: DataFrame): DataFrame =
    daily.groupBy(col("key"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("approx_distinct"),
        sum(col("n_rows")).as("n_rows"))

  /** Gap-based sessionization (batch): assigns a per-user session sequence
    * number, a new session starting when the gap from the previous event
    * exceeds `gapSeconds`. One shuffle on the user key; everything else is
    * window functions over the sorted partition.
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 tiebreakCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val us = unix_micros(col(tsCol).cast(TimestampType))
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull ||
      (us - prev) > gapSeconds * 1000000L, 1).otherwise(0)
    df.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }
}
