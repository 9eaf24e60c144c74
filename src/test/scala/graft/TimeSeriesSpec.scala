package graft

import graft.sources.Tables
import graft.timeseries.TimeSeries
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends GraftSpec {
  import spark.implicits._

  test("bin floors to the interval boundary") {
    val df = Seq("2024-01-05 10:47:33.123", "2024-01-05 10:59:59.999")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
    val binned = df.select(TimeSeries.bin(col("ts"), 3600).as("b"))
      .distinct().collect()
    assert(binned.length == 1)
    assert(binned(0).getTimestamp(0).toInstant.toString ==
      "2024-01-05T10:00:00Z")
  }

  test("ago keeps only rows within the window of max(ts)") {
    val ev = Tables.events(spark, sfDir)
    val maxTs = ev.agg(max(col("ts"))).collect()(0).getAs[java.time.LocalDateTime](0)
    val recent = TimeSeries.ago(ev, "ts", 24 * 3600)
    val rows = recent.select(col("ts")).collect()
    assert(rows.nonEmpty)
    val cutoff = maxTs.minusSeconds(24 * 3600)
    assert(rows.forall(r => !r.getAs[java.time.LocalDateTime]("ts").isBefore(cutoff)))
    assert(recent.count() < ev.count())
  }

  test("createTimeSeries returns time-ordered values per key") {
    val ev = Tables.events(spark, sfDir)
    val ts = TimeSeries.createTimeSeries(ev, col("event_type"), col("ts"),
      col("event_id"), col("value"))
    val byType = ts.collect().map(r =>
      r.getString(0) -> r.getSeq[Double](1)).toMap
    val expected = ev.filter(col("event_type") === "error")
      .orderBy(col("ts"), col("event_id"))
      .select(col("value")).collect().map(_.getDouble(0)).toSeq
    assert(byType("error") == expected)
  }

  test("sessionize splits on gaps > threshold only") {
    val ev = Tables.events(spark, sfDir)
    val sessions = TimeSeries.sessionize(ev, "user_id", "ts", "event_id", 1800)
    // session_seq must be monotone per user in event-time order
    val u = sessions.filter(col("user_id") === 0)
      .orderBy(col("ts"), col("event_id"))
      .select(col("session_seq")).collect().map(_.getLong(0))
    assert(u.nonEmpty && u.head == 1L)
    assert(u.sliding(2).forall(p => p.length < 2 || p(1) - p(0) <= 1))
    assert(u.sameElements(u.sorted))
  }

  test("sessionize: sliced decomposition equals the single-window answer") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sfDir)
    // naive single-window reference (the pre-slicing formulation)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val us = unix_micros(col("ts").cast("timestamp"))
    val prev = lag(us, 1).over(w)
    val isNew = when(prev.isNull || (us - prev) > 1800L * 1000000L, 1L)
      .otherwise(0L)
    val naive = ev.withColumn("session_seq",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    // 1h slices on ~30 days of data force hundreds of cross-slice
    // boundaries per user — sessions cut mid-slice, empty slices bridged
    val sliced = TimeSeries.sessionize(ev, "user_id", "ts", "event_id",
      1800, sliceSeconds = 3600)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("user_id"), col("event_id"), col("session_seq"))
        .orderBy(col("user_id"), col("event_id")).collect().toSeq
    assert(norm(sliced) == norm(naive))
  }

  test("sessionize plan: no window sorts a user's whole history in one task") {
    // the hot-key hazard: a NAT/bot c_ip owning a large share of events
    // would serialize in a window partitioned by user alone and ordered
    // by row time — every row-level window must be (user, slice)-keyed
    spark.conf.set("spark.sql.debug.maxToStringFields", "10000")
    val df = SparkEntry.queries("sessionize")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("windowspecdefinition\\(user_id#\\d+, ts#".r
        .findFirstIn(plan).isEmpty,
      s"sessionize: row-data window partitioned by user alone:\n$plan")
    assert(plan.contains("__slice"),
      "sessionize plan should carry the (user, slice) decomposition")
  }

  test("approx metrics are close to exact counterparts") {
    val exact = Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = SparkEntry.queries("metrics_approx")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, v) <- exact)
      assert(math.abs(approx(k) - v).toDouble / v < 0.1,
        s"$k: approx ${approx(k)} vs exact $v")
  }

  test("sketch rollup: daily HLL sketches union to the whole-period answer") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    val daily = graft.timeseries.TimeSeries.dailyDistinctSketches(
      ev, col("event_type"), col("ts"), col("user_id"))
    // pre-aggregate is small: one row per (key, day)
    val nDays = ev.select(
      graft.timeseries.TimeSeries.bin(col("ts"), 86400)).distinct().count()
    val nKeys = ev.select(col("event_type")).distinct().count()
    assert(daily.count() <= nDays * nKeys)
    val rolled = graft.timeseries.TimeSeries.rollupDistinct(daily)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // merging daily sketches gives the SAME estimate as sketching the
    // raw stream directly (union is lossless over sketches)...
    val direct = ev.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, v) <- direct) assert(rolled(k) == v, s"$k: ${rolled(k)} vs $v")
    // ...and both are within HLL error of the exact distinct
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((k, v) <- exact)
      assert(math.abs(rolled(k) - v).toDouble / v < 0.05,
        s"$k: sketch ${rolled(k)} vs exact $v")
  }

  test("log-histogram rollup: brackets contain the exact percentiles and merge is lossless") {
    import org.apache.spark.sql.functions._
    import graft.timeseries.TimeSeries
    val events = graft.sources.Tables.events(spark, sfDir)
    val daily = TimeSeries.logHistDaily(
      events, col("event_type"), col("ts"), col("value"))
    val rolled = TimeSeries.logHistRollup(daily).collect()
      .map(r => r.getString(0) -> r).toMap
    // merge losslessness: one global pseudo-day gives identical output
    val global = TimeSeries.logHistRollup(
      TimeSeries.logHistDaily(
        events.withColumn("ts", lit("2020-01-01 00:00:00").cast("timestamp")),
        col("event_type"), col("ts"), col("value"))).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rolled.keySet == global.keySet && rolled.keySet.nonEmpty)
    rolled.foreach { case (k, r) =>
      (1 to 5).foreach(i => assert(r.getLong(i) == global(k).getLong(i),
        s"daily-merged != global for $k col $i"))
    }
    // bracket correctness: the exact discrete percentile (same rank
    // construction) falls inside [lo, hi) cents, and the bracket is
    // <= 1% relative width for 3+-digit values
    val exact = events.filter(col("value") > 0)
      .select(col("event_type"),
        expr("CAST(round(value * 100, 0) AS BIGINT)").as("cents"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) =>
        val sorted = rs.map(_.getLong(1)).sorted
        k -> Seq(0.5, 0.99).map(p =>
          sorted((math.floor((sorted.length - 1) * p)).toInt))
      }
    exact.foreach { case (k, Seq(e50, e99)) =>
      val r = rolled(k) // cols: key, n_rows, p50_lo, p50_hi, p99_lo, p99_hi
      assert(r.getLong(2) <= e50 && e50 < r.getLong(3),
        s"$k p50=$e50 outside [${r.getLong(2)}, ${r.getLong(3)})")
      assert(r.getLong(4) <= e99 && e99 < r.getLong(5),
        s"$k p99=$e99 outside [${r.getLong(4)}, ${r.getLong(5)})")
      if (e50 >= 100)
        assert((r.getLong(3) - r.getLong(2)).toDouble / r.getLong(2) <= 0.011)
    }
  }

  test("ts_interpolate fills gaps between observed neighbors") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("ts_interpolate")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val interp = rows.filter(r => r.getBoolean(r.fieldIndex("interpolated")))
    // interpolated values (when both neighbors exist) lie between them
    assert(interp.nonEmpty)
    def epochS(r: org.apache.spark.sql.Row): Long =
      r.getAs[java.time.LocalDateTime](1)
        .toEpochSecond(java.time.ZoneOffset.UTC)
    val byKey = rows.groupBy(_.getString(0))
    byKey.values.foreach { ks =>
      val sorted = ks.sortBy(epochS)
      // spine is contiguous hourly
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(epochS(b) - epochS(a) == 3600L)
        case _ =>
      }
    }
  }

  test("ts_asof counts events preceded by an error per user") {
    val df = SparkEntry.queries("ts_asof")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_after_error")) <=
        r.getLong(r.fieldIndex("n")))
    }
  }

  test("metrics_kmv estimates within KMV error bounds of exact distinct") {
    import org.apache.spark.sql.functions._
    val est = SparkEntry.queries("metrics_kmv")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = graft.sources.Tables.events(spark, sfDir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, d) =>
      val e = est(k)
      if (d < 64) assert(e == d.toDouble, s"$k: sub-k must be exact")
      // KMV std error ≈ 1/sqrt(k-2) ≈ 12.7% at k=64; allow 4 sigma
      else assert(math.abs(e - d) / d < 0.51,
        s"$k: est $e vs exact $d out of bounds")
    }
  }

  test("metrics_kmv_rollup (daily-sketch merge) equals the direct pass") {
    val direct = SparkEntry.queries("metrics_kmv")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    val rollup = SparkEntry.queries("metrics_kmv_rollup")(spark, sfDir)
      .collect().map(_.toString).sorted.toSeq
    assert(direct == rollup, "KMV merge must be lossless")
  }

  test("ts_ema replays the exact recurrence per dimension") {
    val rows = SparkEntry.queries("ts_ema")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1),
        r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, g) =>
      val sorted = g.sortBy(_._2.toString)
      assert(g.toSeq == sorted.toSeq, s"$et not bin-ordered per key")
      var s = sorted.head._3
      assert(sorted.head._4 == s, s"$et: first ema must equal first avg")
      sorted.tail.foreach { case (_, bin, x, ema) =>
        s = s + 0.25 * (x - s)
        assert(ema == s, s"$et @ $bin: ema $ema != replay $s")
      }
    }
  }

  test("ts_holt replays the exact two-state recurrence per dimension") {
    val rows = SparkEntry.queries("ts_holt")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (et, g) =>
      var s = g.head._3
      var b = 0.0
      assert(g.head._4 == s && g.head._5 == 0.0 && g.head._6 == s)
      g.tail.foreach { case (_, bin, x, level, trend, forecast) =>
        val s2 = 0.5 * x + 0.5 * (s + b)
        b = 0.25 * (s2 - s) + 0.75 * b
        s = s2
        assert(level == s && trend == b && forecast == s + b,
          s"$et @ $bin: ($level,$trend,$forecast) != replay ($s,$b)")
      }
    }
  }

  test("cms_heavy_hitters: every reported user truly clears the " +
      "threshold and none are missed") {
    val ev = Tables.events(spark, sfDir)
    val n = ev.count()
    val users = ev.select("user_id").distinct().count()
    val thr = (5 * n) / (4 * users)
    val exact = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= thr)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("cms_heavy_hitters")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exact, "sketch pruning must have recall 1")
    assert(exact.nonEmpty, "threshold yields no hitters at sf0.001")
  }

  test("cms: cells reconcile with the corpus, the daily merge is " +
      "exact, and every estimate dominates its exact count") {
    val ev = Tables.events(spark, sfDir)
    val cells = TimeSeries.cmsCells(ev, col("user_id"))
    // each hash row partitions the corpus: its cells sum to N
    val n = ev.count()
    val rowTotals = cells.groupBy(col("row_id"))
      .agg(sum(col("cnt")).as("t")).collect()
    assert(rowTotals.length == TimeSeries.cmsD)
    assert(rowTotals.forall(_.getLong(1) == n))
    // cell-wise merge of per-day partials == the direct build
    val direct = cells.orderBy(col("row_id"), col("bucket"))
      .collect().toSeq
    val merged = TimeSeries.cmsMerge(
        TimeSeries.cmsDailyCells(ev, col("ts"), col("user_id")))
      .orderBy(col("row_id"), col("bucket")).collect().toSeq
    assert(direct == merged, "CMS daily merge must be exact")
    // overestimate-only: est(u) >= exact(u) for every user
    val audit = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_exact"))
      .join(TimeSeries.cmsEstimate(ev, col("user_id"), cells)
        .withColumnRenamed("id", "user_id"), Seq("user_id"))
      .collect()
    assert(audit.nonEmpty)
    audit.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS underestimated user ${r.getLong(0)}"))
  }
}
