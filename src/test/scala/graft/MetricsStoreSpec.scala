package graft

import graft.sources.{MetricsStore, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sources/MetricsStore (SURVEY.md §2 A10g): the persisted KMV sketch
  * store — estimate-after-append ≡ one global pass, replays and
  * compaction are estimate-stable, the stored k governs appends.
  */
class MetricsStoreSpec extends GraftSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def cleanup(base: String, path: String): Unit = {
    Seq("kmv", "meta").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS ${base}_$t"))
    Caches.deleteDir(path)
  }

  test("estimate over write + day-splitting append equals the " +
      "in-query metrics_kmv") {
    val base = s"graft_kmv_spec_${System.nanoTime()}"
    val path = s"${sys.props("java.io.tmpdir")}/$base"
    val ev = Tables.events(spark, sfDir)
    try {
      // the split is by event_id — it slices DAYS apart, which is
      // exactly the case the merge's losslessness must cover
      MetricsStore.write(ev.filter(pmod(col("event_id"), lit(2)) === 0),
        col("event_type"), col("ts"), col("user_id"), base, path)
      MetricsStore.append(spark, base,
        ev.filter(pmod(col("event_id"), lit(2)) =!= 0),
        col("event_type"), col("ts"), col("user_id"))
      val got = rows(MetricsStore.estimate(spark, base)
        .withColumnRenamed("key", "event_type").orderBy("event_type"))
      val want = rows(SparkEntry.queries("metrics_kmv")(spark, sfDir))
      assert(got == want)
    } finally cleanup(base, path)
  }

  test("replayed appends and compaction cannot change the estimate; " +
      "the stored k governs, including the exact small-count mode") {
    import spark.implicits._
    val base = s"graft_kmv_spec2_${System.nanoTime()}"
    val path = s"${sys.props("java.io.tmpdir")}/$base"
    def ev(rows: (Long, String, Long)*): DataFrame =
      rows.toSeq.toDF("event_id", "event_type", "uid")
        .withColumn("ts", expr(
          "to_timestamp('2024-03-01 10:00:00') + " +
            "make_interval(0, 0, 0, 0, cast(event_id AS INT), 0, 0)"))
    // key "a": 3 distinct uids (< k=4 → EXACT count mode);
    // key "b": 6 distinct uids (> k → estimator mode)
    val batch1 = ev((1L, "a", 10L), (2L, "a", 11L), (3L, "b", 20L),
      (4L, "b", 21L), (5L, "b", 22L))
    val batch2 = ev((30L, "a", 12L), (31L, "b", 23L), (32L, "b", 24L),
      (33L, "b", 25L))
    try {
      MetricsStore.write(batch1, col("event_type"), col("ts"), col("uid"),
        base, path, k = 4)
      MetricsStore.append(spark, base, batch2,
        col("event_type"), col("ts"), col("uid"))
      val est = MetricsStore.estimate(spark, base).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      // exact mode: 3 distinct < k
      assert(est("a") == 3.0, s"exact small-count mode broke: $est")
      // estimator mode engaged (k=4 from the META table, not a caller
      // arg): the estimate is (k-1)·P/h_(4), not the raw count 6
      assert(est("b") != 6.0 && est("b") > 0.0, s"estimator mode: $est")
      val s1 = rows(MetricsStore.estimate(spark, base))
      // crash-replayed append: duplicate sketch rows collapse at read
      MetricsStore.append(spark, base, batch2,
        col("event_type"), col("ts"), col("uid"))
      assert(rows(MetricsStore.estimate(spark, base)) == s1)
      MetricsStore.compact(spark, base)
      assert(rows(MetricsStore.estimate(spark, base)) == s1)
    } finally cleanup(base, path)
  }

  test("cms leg: write + day-splitting append equals the direct cell " +
      "build; a replayed append's delta collapses; compact is stable") {
    val base = s"graft_cms_spec_${System.nanoTime()}"
    val path = s"${sys.props("java.io.tmpdir")}/$base"
    val ev = Tables.events(spark, sfDir)
    val odds = ev.filter(pmod(col("event_id"), lit(2)) =!= 0)
    try {
      MetricsStore.writeCms(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        col("ts"), col("user_id"), base, path)
      MetricsStore.appendCms(spark, base, odds,
        col("ts"), col("user_id"))
      val direct = rows(graft.timeseries.TimeSeries
        .cmsCells(ev, col("user_id")).orderBy("row_id", "bucket"))
      def stored() = rows(MetricsStore.cmsCells(spark, base)
        .orderBy("row_id", "bucket"))
      assert(stored() == direct,
        "cells-after-append must equal one global pass")
      // crash-replayed append: identical delta rows (same content-
      // derived batch_id) collapse at read — counts must NOT double
      MetricsStore.appendCms(spark, base, odds,
        col("ts"), col("user_id"))
      assert(stored() == direct, "replayed delta must collapse at read")
      MetricsStore.compactCms(spark, base)
      assert(stored() == direct)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${base}_cms")
      cleanup(base, path)
    }
  }

  test("cms leg: two DISTINCT same-shaped batches both count — only a " +
      "true replay collapses") {
    import spark.implicits._
    val base = s"graft_cms_spec2_${System.nanoTime()}"
    val path = s"${sys.props("java.io.tmpdir")}/$base"
    // same user, same day, same count — identical CELL tables, so a
    // cell-content-derived batch id would wrongly collapse batch2
    // (the review finding this test pins); distinct event_ids make
    // them distinct ingest units
    def batch(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
      ids.map(i => (i, 7L)).toDF("event_id", "user_id")
        .withColumn("ts", expr("to_timestamp('2024-03-01 10:00:00')"))
    try {
      MetricsStore.writeCms(batch(Seq(1L, 2L, 3L)),
        col("ts"), col("user_id"), base, path)
      MetricsStore.appendCms(spark, base, batch(Seq(4L, 5L, 6L)),
        col("ts"), col("user_id"))
      def total() = MetricsStore.cmsCells(spark, base)
        .filter(col("row_id") === 0).agg(sum(col("cnt")))
        .collect()(0).getLong(0)
      assert(total() == 6L,
        "distinct same-shaped batches must both count")
      // a genuine replay of batch2 still collapses
      MetricsStore.appendCms(spark, base, batch(Seq(4L, 5L, 6L)),
        col("ts"), col("user_id"))
      assert(total() == 6L, "replayed batch must collapse")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${base}_cms")
      Caches.deleteDir(path)
    }
  }

  test("hist leg: write + day-splitting append equals the direct cell " +
      "build and rollup; a replayed append collapses; compact is " +
      "stable") {
    val base = s"graft_hist_spec_${System.nanoTime()}"
    val path = s"${sys.props("java.io.tmpdir")}/$base"
    val ev = Tables.events(spark, sfDir)
    val odds = ev.filter(pmod(col("event_id"), lit(2)) =!= 0)
    try {
      MetricsStore.writeHist(
        ev.filter(pmod(col("event_id"), lit(2)) === 0),
        col("event_type"), col("ts"), col("value"), base, path)
      MetricsStore.appendHist(spark, base, odds,
        col("event_type"), col("ts"), col("value"))
      val directCells = rows(graft.timeseries.TimeSeries
        .logHistDaily(ev, col("event_type"), col("ts"), col("value"))
        .orderBy("key", "day", "bucket_id"))
      val directRoll = rows(graft.timeseries.TimeSeries.logHistRollup(
        graft.timeseries.TimeSeries.logHistDaily(ev, col("event_type"),
          col("ts"), col("value"))).orderBy("key"))
      def cells() = rows(MetricsStore.histCells(spark, base)
        .orderBy("key", "day", "bucket_id"))
      def roll() = rows(graft.timeseries.TimeSeries.logHistRollup(
        MetricsStore.histCells(spark, base)).orderBy("key"))
      assert(cells() == directCells,
        "cells-after-append must equal one global pass")
      assert(roll() == directRoll,
        "brackets-after-append must equal one global pass")
      MetricsStore.appendHist(spark, base, odds,
        col("event_type"), col("ts"), col("value"))
      assert(cells() == directCells, "replayed delta must collapse")
      MetricsStore.compactHist(spark, base)
      assert(cells() == directCells && roll() == directRoll)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${base}_hist")
      cleanup(base, path)
    }
  }
}
