package graft.timeseries

import graft.Caches.CachesSyntax
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
    * union-and-carry shape, TIME-SLICED so a low-cardinality key cannot
    * serialize the sort:
    *
    *  1. both sides are tagged and unioned, and every row gets a
    *     `__slice` = floor(ts / sliceSeconds) — the window partition key
    *     is (key, slice), so partition size is bounded by slice width,
    *     not by the key's share of the corpus;
    *  2. a running last-non-null inside each (key, slice) partition
    *     resolves every match whose right row lives in the same slice;
    *  3. each slice's FINAL right values (one row per key×slice — a
    *     per-partition summary, metadata-scale) feed an exclusive
    *     running carry across slices per key, giving each slice its
    *     boundary value from earlier slices — including across slices
    *     that contain no right rows at all;
    *  4. asof value = coalesce(local running last, carried boundary).
    *
    * Integer slice arithmetic plus the (ts, side, tiebreak) sort — right
    * rows before left rows at equal timestamps, matching `>=` as-of
    * semantics — makes the decomposition exactly equal to the
    * single-window formulation. No per-row probe, no range join, no
    * broadcast requirement on either side, which is the property that
    * matters when BOTH tables are 100 TB facts.
    *
    * @param rightTiebreak column making right-side ordering total when
    *                      right timestamps collide (determinism).
    * @param sliceSeconds  window partition granularity — tune so
    *                      (key, slice) blocks fit an executor task.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, rightVals: Seq[String],
               rightTiebreak: Column = lit(0),
               sliceSeconds: Long = 86400L): DataFrame = {
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
    val u0 = l.unionByName(r, allowMissingColumns = true)
    // any monotone floor of __t is a correct slice key; pick per type
    // (numeric time axes slice on the raw value, in "seconds")
    val sliceExpr = u0.schema("__t").dataType match {
      case TimestampType | TimestampNTZType => expr(
        s"unix_micros(CAST(`__t` AS TIMESTAMP)) div ${sliceSeconds * 1000000L}L")
      case DateType => expr(
        s"(unix_date(`__t`) * 86400L) div ${sliceSeconds}L")
      case _ => expr(s"CAST(`__t` AS BIGINT) div ${sliceSeconds}L")
    }
    val u = u0.withColumn("__slice", sliceExpr)
    // 2. running last-non-null inside each bounded (key, slice) block
    val wLoc = Window.partitionBy(col(key), col("__slice"))
      .orderBy(col("__t"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val loc = rightVals.foldLeft(u) { (df, v) =>
      df.withColumn(s"__loc_$v",
        last(col(s"__r_$v"), ignoreNulls = true).over(wLoc))
    }
    // 3. per-slice final right values — one row per (key, slice) even
    // when the slice has no right rows (fin stays null there), so the
    // cross-slice carry bridges right-free gaps
    val finAggs = rightVals.map(v =>
      expr(s"max_by(`__r_$v`, struct(`__t`, `__tb`)) " +
        s"FILTER (WHERE `__side` = 0 AND `__r_$v` IS NOT NULL)")
        .as(s"__fin_$v"))
    val fins = u.groupBy(col(key), col("__slice"))
      .agg(finAggs.head, finAggs.tail: _*)
    val wCarry = Window.partitionBy(col(key)).orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = rightVals.foldLeft(fins) { (df, v) =>
      df.withColumn(s"__in_$v",
        last(col(s"__fin_$v"), ignoreNulls = true).over(wCarry))
    }.select((col(key) +: col("__slice") +:
      rightVals.map(v => col(s"__in_$v"))): _*)
    // 4. combine; the join key (key, slice) matches loc's window
    // partitioning, and the carry side is per-partition-summary-sized
    val carried0 = loc.join(carry, Seq(key, "__slice"), "left")
    val carried = rightVals.foldLeft(carried0) { (df, v) =>
      df.withColumn(s"asof_$v",
        coalesce(col(s"__loc_$v"), col(s"__in_$v")))
    }
    carried.filter(col("__side") === 1)
      .drop(("__t" +: "__side" +: "__tb" +: "__slice" +: rightTs +:
        rightVals.flatMap(v =>
          Seq(s"__r_$v", s"__loc_$v", s"__in_$v"))): _*)
  }

  /** FORWARD as-of join: for each left row, the EARLIEST right row
    * with rightTs ≥ leftTs — next-event attribution (the quota that
    * takes effect next, the first error after a deploy). Implemented
    * by running [[asofJoin]] on the NEGATED time axis: "latest prior"
    * under −t IS "earliest following" under t, so the time-sliced,
    * shuffle-minimal, both-sides-can-be-facts decomposition is
    * inherited verbatim (trunc division is a monotone slice key for
    * negative values too). Ties at equal rightTs resolve to the MAX
    * `rightTiebreak` (inherited) — pass a negated column for
    * min-tiebreak semantics. Timestamp/date axes negate through epoch
    * micros; numeric axes negate directly.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String],
      rightTiebreak: Column = lit(0),
      sliceSeconds: Long = 86400L): DataFrame = {
    def micros(df: DataFrame, ts: String): Boolean =
      df.schema(ts).dataType match {
        case TimestampType | TimestampNTZType | DateType => true
        case _ => false
      }
    def neg(df: DataFrame, ts: String, out: String): DataFrame =
      df.withColumn(out,
        if (micros(df, ts)) -unix_micros(col(ts).cast(TimestampType))
        else -col(ts).cast(LongType))
    // the negated timestamp axis is in MICROseconds and takes
    // asofJoin's numeric-axis slice branch, so the slice width must
    // scale with it — unscaled, every distinct timestamp became its
    // own slice and the cross-slice carry window ran over a row-scale
    // partition per key, exactly the serialization slicing exists to
    // avoid (review finding; truncating the axis to seconds instead
    // would break sub-second tie ordering)
    val width =
      if (micros(left, leftTs)) sliceSeconds * 1000000L else sliceSeconds
    asofJoin(neg(left, leftTs, "__fwd_t"), neg(right, rightTs, "__fwd_rt"),
        key, "__fwd_t", "__fwd_rt", rightVals, rightTiebreak,
        width)
      .drop("__fwd_t")
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

  /** KMV (k-minimum-values) distinct sketch — the ENGINE-PORTABLE
    * counterpart to [[dailyDistinctSketches]]'s HLL. HLL estimates are
    * implementation-defined (Spark's HLL++ and DuckDB's HLL disagree on
    * the same input), so the HLL rows get a rows-only driver check; KMV
    * over an explicit integer hash is bit-for-bit reproducible in ANY
    * engine with 64-bit arithmetic, so these rows carry a FULL
    * hash-match oracle. Estimator (Bar-Yossef et al. 2002): keep the k
    * smallest distinct hash values; if fewer than k exist the count is
    * exact, else distinct ≈ (k-1)·P / h_(k).
    *
    * The hash is an affine map over the prime field P = 2^31-1:
    * h(x) = (pmod(x, P) · a + b) mod P, written with the double-mod
    * idiom so negative inputs agree across engines' `%` conventions.
    * Every intermediate stays below 2^62 — no overflow under ANSI
    * semantics and no engine-specific wrap.
    */
  val KmvP = 2147483647L // 2^31 - 1, prime
  private val KmvA = 1103515245L
  private val KmvB = 12345L

  def kmvHash(id: Column): Column =
    (((id % KmvP + KmvP) % KmvP) * KmvA + KmvB) % KmvP

  /** Per-(key, day) KMV sketch rows: the ≤ k smallest DISTINCT hashes.
    * Scale shape: one shuffle for the (key, day, hv) distinct (map-side
    * partial aggregation), then [[graft.plans.TopKPerKey]]'s bounded
    * heap prunes to k per group map-side before its (key, day) exchange
    * — the shuffle after the distinct carries at most k·partitions rows
    * per group, never the raw hash stream. The persisted sketch is
    * days × keys × k rows regardless of corpus size.
    */
  def kmvDaily(df: DataFrame, key: Column, ts: Column, id: Column,
               k: Int): DataFrame =
    graft.plans.TopKPerKey(
      df.select(key.as("key"),
        bin(ts, 86400).cast(TimestampNTZType).as("day"),
        kmvHash(id).as("hv")).distinct(),
      keys = Seq(col("key"), col("day")), order = Seq(col("hv")), k = k)

  /** Merge per-day KMV sketches to one per key. Lossless by
    * construction: every hash among the k globally smallest is among
    * its own day's k smallest, so re-selecting the k smallest distinct
    * hashes of the union reproduces EXACTLY the sketch a direct global
    * pass builds — which is what lets the rollup share the direct
    * query's oracle. Input is sketch-sized (days × keys × k), so both
    * steps are trivially small at any corpus scale.
    */
  def kmvMerge(daily: DataFrame, k: Int): DataFrame =
    graft.plans.TopKPerKey(
      daily.select(col("key"), col("hv")).distinct(),
      keys = Seq(col("key")), order = Seq(col("hv")), k = k)

  /** Estimate from sketch rows (key, hv): exact when the key has fewer
    * than k distinct hashes, else (k-1)·P / h_(k). The constant
    * (k-1)·P is folded to one double literal so Spark and the oracle
    * SQL perform the IDENTICAL single IEEE division.
    */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.groupBy(col("key"))
      .agg(count(lit(1)).as("__m"), max(col("hv")).as("__hk"))
      .select(col("key"),
        when(col("__m") < k, col("__m").cast(DoubleType))
          .otherwise(lit((k - 1).toDouble * KmvP.toDouble) /
            col("__hk").cast(DoubleType))
          .as("kmv_distinct"))

  /** Count-min sketch over an integer key column — the bounded-memory
    * frequency sketch (Cormode & Muthukrishnan '05) next to KMV's
    * distinct-count: `cmsD` hash rows × `cmsW` buckets of plain int64
    * counts. Every cell is a SUM of indicator contributions, so the
    * sketch is (a) exactly mergeable across any partitioning — sums
    * commute — and (b) fully deterministic: unlike most sketches, the
    * whole structure AND its estimates carry hash-match oracles. The
    * hash rows are a FIXED deterministic affine family over the prime
    * field mod P reduced mod `cmsW` — not the textbook
    * pairwise-independent family (that would need multipliers drawn
    * uniformly from the field), so the ε·N overestimate bound is
    * heuristic, not guaranteed; overestimate-only (est ≥ exact) holds
    * regardless, which is what the heavy-hitter pruning and the audit
    * view rely on. Every intermediate < 2^62.
    *
    * Scale shape: the sketch build is ONE map-side-combining
    * aggregation from the corpus down to ≤ d·w cells — the partials
    * ARE sketches, so a 100 TB scan ships d·w longs per task. Point
    * estimates broadcast the cell table.
    */
  val cmsD = 4
  val cmsW = 512

  /** Row-j bucket hash: the shared family's single-digit multipliers
    * (2j+1 ∈ 1,3,5,7) would let ids at regular strides (multiples of
    * w·small) collide in ALL d rows simultaneously against w=512
    * buckets — so the CMS rows use LARGE odd multipliers
    * a_j = ((2j+1)·1103515245) mod P instead (still compile-time
    * constants, still mirrored verbatim in the oracles' SQL).
    */
  private def cmsBucket(j: Int, id: Column): Column = {
    val a = ((2L * j + 1) * 1103515245L) % KmvP
    val b = (j.toLong * 40503L + 13L) % KmvP
    pmod(lit(a) * pmod(id, lit(KmvP)) + lit(b), lit(KmvP)) % cmsW
  }

  /** The d×w cell table (row_id, bucket, cnt) of `df`'s `id` column —
    * count of rows landing in each (hash row, bucket).
    */
  def cmsCells(df: DataFrame, id: Column): DataFrame =
    df.select(explode(array((0 until cmsD).map(j =>
        struct(lit(j.toLong).as("row_id"),
          cmsBucket(j, id).as("bucket"))): _*)).as("c"))
      .groupBy(col("c.row_id").as("row_id"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Per-day partial CMS cell tables (day, row_id, bucket, cnt) — the
    * persisted pre-aggregate shape a monitoring store lands per ingest
    * day.
    */
  def cmsDailyCells(df: DataFrame, ts: Column, id: Column): DataFrame =
    df.select(bin(ts, 86400).cast(TimestampNTZType).as("day"),
        explode(array((0 until cmsD).map(j =>
          struct(lit(j.toLong).as("row_id"),
            cmsBucket(j, id).as("bucket"))): _*)).as("c"))
      .groupBy(col("day"), col("c.row_id").as("row_id"),
        col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Merge partial cell tables cell-wise — exact for ANY partitioning
    * of the input (integer sums commute), which is why the rollup
    * shares the direct build's oracle verbatim.
    */
  def cmsMerge(daily: DataFrame): DataFrame =
    daily.groupBy(col("row_id"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for every distinct id in `df`: est(id) = min over
    * hash rows of that row's bucket count — ≥ the true count by
    * construction (collisions only add). `cells` is ≤ d·w rows,
    * broadcast; the probe is id-distinct-sized.
    */
  def cmsEstimate(df: DataFrame, id: Column,
      cells: DataFrame): DataFrame =
    df.select(id.as("id")).distinct()
      .select(col("id"), explode(array((0 until cmsD).map(j =>
        struct(lit(j.toLong).as("row_id"),
          cmsBucket(j, col("id")).as("bucket"))): _*)).as("c"))
      .select(col("id"), col("c.row_id").as("row_id"),
        col("c.bucket").as("bucket"))
      .join(broadcast(cells), Seq("row_id", "bucket"))
      .groupBy(col("id"))
      .agg(min(col("cnt")).as("n_est"))

  /** Mergeable quantile pre-aggregate: a decimal log-histogram over a
    * positive cents-precision measure. Bucket = (digit count,
    * leading-3-digits) of the cents value — i.e. a base-10 log scale at
    * 3-significant-digit resolution, ≤1% relative bucket width. Unlike
    * float-log sketches (KLL/t-digest/HDR's `log()` buckets) every step
    * is integer/string arithmetic, identical in any engine — so the
    * rollup gets a full hash-match oracle, not a rows-only check.
    *
    * Scale story: the raw measure column compresses to one row per
    * (key, day, bucket) — a few hundred buckets per key-day — and any
    * coarser rollup (weekly, global) is a count-sum over those rows
    * plus a cum-window over DISTINCT buckets. Merge is lossless by
    * construction (bucket counts are associative sums); raw data is
    * never rescanned.
    */
  def logHistDaily(df: DataFrame, key: Column, ts: Column,
                   value: Column): DataFrame =
    df.filter(value > 0)
      .withColumn("__cents", round(value * 100).cast(LongType))
      .withColumn("__nd", length(col("__cents").cast(StringType)))
      .withColumn("bucket_id",
        col("__nd").cast(LongType) * 1000 +
          substring(col("__cents").cast(StringType), 1, 3).cast(LongType))
      .groupBy(key.as("key"),
        bin(ts, 86400).cast(TimestampNTZType).as("day"), col("bucket_id"))
      .agg(count(lit(1)).as("cnt"))

  /** Roll (key, day, bucket) histograms up to per-key quantile BRACKETS:
    * for each target rank the bucket containing it, decoded to exact
    * [lo_cents, hi_cents) integer bounds. The histogram fully determines
    * the bracket, so daily→global merge gives byte-identical output to
    * histogramming the raw data directly.
    */
  def logHistRollup(daily: DataFrame,
                    ps: Seq[(String, Double)] = Seq("p50" -> 0.5,
                      "p99" -> 0.99)): DataFrame = {
    val h = daily.groupBy(col("key"), col("bucket_id"))
      .agg(sum(col("cnt")).as("cnt"))
    val cum = h
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col("key")).orderBy(col("bucket_id"))))
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(col("key"))))
    def pickBucket(p: Double) = min(when(
      col("cum") >= floor((col("tot") - 1) * p).cast(LongType) + 1,
      col("bucket_id")))
    // decode bucket -> exact integer cents bounds: lo = f3 zero-padded
    // to nd digits (string-built power of ten — no float pow)
    def lo(b: String) = expr(
      s"CAST(CAST($b % 1000 AS STRING) || " +
        s"repeat('0', int(greatest($b div 1000 - 3, 0))) AS BIGINT)")
    def hi(b: String) = expr(
      s"CAST(CAST($b % 1000 + 1 AS STRING) || " +
        s"repeat('0', int(greatest($b div 1000 - 3, 0))) AS BIGINT)")
    val agg = cum.groupBy(col("key"))
      .agg(max(col("tot")).as("n_rows"),
        ps.map { case (n, p) => pickBucket(p).as(s"__b_$n") }: _*)
    ps.foldLeft(agg) { case (df, (n, _)) =>
      df.withColumn(s"${n}_lo_cents", lo(s"__b_$n"))
        .withColumn(s"${n}_hi_cents", hi(s"__b_$n"))
    }.select(col("key") +: col("n_rows") +:
      ps.flatMap { case (n, _) =>
        Seq(col(s"${n}_lo_cents"), col(s"${n}_hi_cents")) }: _*)
  }

  /** Gap-based sessionization (batch): assigns a per-user session sequence
    * number, a new session starting when the gap from the previous event
    * exceeds `gapSeconds`.
    *
    * TIME-SLICED like [[asofJoin]], so a hot key (a NAT/bot `c_ip` owning
    * a large share of the corpus) never sorts its whole history in one
    * task — the decomposition that keeps per-task work bounded at 100 TB:
    *
    *  1. every row gets `__slice` = floor(ts / sliceSeconds); row-level
    *     windows partition by (user, slice), so task size is bounded by
    *     one key's density within one slice, not its share of the corpus;
    *  2. a row's gap test is local (lag within the slice) except the
    *     slice's FIRST row, whose previous event lives in an earlier
    *     slice;
    *  3. a per-(user, slice) summary — one row per occupied slice,
    *     metadata-scale — carries each slice's last event time and
    *     interior session-start count across slices (the only window
    *     partitioned by user alone runs over these summary rows, never
    *     row data);
    *  4. row session_seq = starts carried from earlier slices + running
    *     sum of local starts, the first row's start resolved from the
    *     carried boundary — exactly equal to the single-window
    *     formulation (a running sum splits at any cut).
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
                 tiebreakCol: String, gapSeconds: Long,
                 sliceSeconds: Long = 86400L): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val d = df
      .withColumn("__us", unix_micros(col(tsCol).cast(TimestampType)))
      .withColumn("__slice", expr(s"`__us` div ${sliceSeconds * 1000000L}L"))
    val wLoc = Window.partitionBy(col(userCol), col("__slice"))
      .orderBy(col(tsCol), col(tiebreakCol))
    // loc feeds two branches (the summary aggregation and the final
    // join) and Spark does not CSE across branches — persist it so the
    // scan + (user, slice) shuffle + window run once (same policy as
    // CurationPack.packShards for the identical shape)
    val loc = d
      .withColumn("__prev", lag(col("__us"), 1).over(wLoc))
      .withColumn("__new_loc",
        when(col("__prev").isNotNull &&
          col("__us") - col("__prev") > gapUs, 1L).otherwise(0L))
      .persistTracked
    // per-(user, slice) summary: same grouping keys as wLoc's partition
    // spec, so this aggregation reuses the window's shuffle
    val fins = loc.groupBy(col(userCol), col("__slice"))
      .agg(min(col("__us")).as("__first_us"),
        max(col("__us")).as("__last_us"),
        sum(col("__new_loc")).as("__interior"))
    val wSl = Window.partitionBy(col(userCol)).orderBy(col("__slice"))
    val carry = fins
      .withColumn("__prev_last", lag(col("__last_us"), 1).over(wSl))
      .withColumn("__bnew",
        when(col("__prev_last").isNull ||
          col("__first_us") - col("__prev_last") > gapUs, 1L).otherwise(0L))
      .withColumn("__before",
        coalesce(sum(col("__interior") + col("__bnew"))
          .over(wSl.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(userCol), col("__slice"), col("__bnew"), col("__before"))
    loc.join(carry, Seq(userCol, "__slice"))
      .withColumn("__new_row",
        when(col("__prev").isNull, col("__bnew")).otherwise(col("__new_loc")))
      .withColumn("session_seq",
        col("__before") + sum(col("__new_row"))
          .over(wLoc.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
      .drop("__us", "__slice", "__prev", "__new_loc", "__bnew", "__before",
        "__new_row")
  }
}
