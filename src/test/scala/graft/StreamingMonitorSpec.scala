package graft

import graft.sources.{MetricsStore, SnapshotStore, Tables}
import graft.streaming.StreamingMonitor
import graft.timeseries.TimeSeries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** streaming/StreamingMonitor (SURVEY.md §2 A10g/A10k/A19b streaming
  * legs): the observability stores fed from a live micro-batch stream —
  * after any prefix of batches each store's read equals ONE global pass
  * over everything ingested so far, and a crash-replayed batch
  * converges (KMV by the merge's distinct, CMS/snapshot by the
  * content-derived batch id).
  */
class StreamingMonitorSpec extends GraftSpec {

  private def rows(df: DataFrame, order: String*): Seq[String] =
    df.orderBy(order.map(col): _*).collect().map(_.toString).toSeq

  private val kmvK = 64

  test("two micro-batches fold into estimates that equal one global " +
      "pass; a replayed batch converges on all three stores") {
    val tag = System.nanoTime()
    val kmvBase = s"graft_mon_kmv_$tag"
    val cmsBase = s"graft_mon_cms_$tag"
    val histBase = s"graft_mon_hist_$tag"
    val snapBase = s"graft_mon_snap_$tag"
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-monitor-spec").toString
    val ev = Tables.events(spark, sfDir)
    val seed = ev.filter(pmod(col("event_id"), lit(3)) === 0)
    val b1 = ev.filter(pmod(col("event_id"), lit(3)) === 1)
    val b2 = ev.filter(pmod(col("event_id"), lit(3)) === 2)
    try {
      // seed the stores from the pre-stream history
      MetricsStore.write(seed, col("event_type"), col("ts"),
        col("user_id"), kmvBase, s"$tmp/kmv", k = kmvK)
      MetricsStore.writeCms(seed, col("ts"), col("user_id"),
        cmsBase, s"$tmp/cms")
      MetricsStore.writeHist(seed, col("event_type"), col("ts"),
        col("value"), histBase, s"$tmp/hist")
      SnapshotStore.write(seed, snapBase, s"$tmp/snap")
      // two arrival files → two real micro-batches
      val incoming = s"$tmp/incoming"
      b1.coalesce(1).write.parquet(s"$incoming/b1")
      b2.coalesce(1).write.parquet(s"$incoming/b2")
      val stream = spark.readStream
        .schema("event_id LONG, user_id LONG, ts TIMESTAMP_NTZ, " +
          "event_type STRING, value DOUBLE, props STRING")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(incoming)
        .select(ev.columns.map(col): _*) // pin the column order
      val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = StreamingMonitor.run(spark, stream, kmvBase, cmsBase,
        Some(histBase), snapBase, id => seen += id)
      try q.processAllAvailable() finally q.stop()
      assert(seen.size == 2, s"expected 2 micro-batches, saw $seen")

      // each store read ≡ one global pass over ALL events
      val wantKmv = rows(TimeSeries.kmvEstimate(TimeSeries.kmvMerge(
        TimeSeries.kmvDaily(ev, col("event_type"), col("ts"),
          col("user_id"), kmvK), kmvK), kmvK), "key")
      val wantCms = rows(TimeSeries.cmsCells(ev, col("user_id")),
        "row_id", "bucket")
      val wantSnap = rows(
        SparkEntry.queries("q_latest")(spark, sfDir), "user_id")
      val wantHist = rows(TimeSeries.logHistRollup(
        TimeSeries.logHistDaily(ev, col("event_type"), col("ts"),
          col("value"))), "key")
      def gotKmv() = rows(MetricsStore.estimate(spark, kmvBase), "key")
      def gotCms() = rows(MetricsStore.cmsCells(spark, cmsBase),
        "row_id", "bucket")
      def gotSnap() = rows(SnapshotStore.snapshot(spark, snapBase),
        "user_id")
      def gotHist() = rows(TimeSeries.logHistRollup(
        MetricsStore.histCells(spark, histBase)), "key")
      assert(gotKmv() == wantKmv,
        "streamed KMV estimate must equal the one-pass estimate")
      assert(gotCms() == wantCms,
        "streamed CMS cells must equal the one-pass cells")
      assert(gotSnap() == wantSnap,
        "streamed snapshot must equal the one-pass q_latest")
      assert(gotHist() == wantHist,
        "streamed histogram brackets must equal the one-pass rollup")

      // crash replay: batch 2 re-delivered whole — KMV duplicates
      // collapse in the merge's distinct, CMS/snapshot on the
      // content-derived batch_id
      StreamingMonitor.processBatch(spark, kmvBase, cmsBase,
        Some(histBase), snapBase, b2)
      assert(gotKmv() == wantKmv, "replayed KMV rows must collapse")
      assert(gotHist() == wantHist, "replayed HIST delta must collapse")
      assert(gotCms() == wantCms, "replayed CMS delta must collapse")
      assert(gotSnap() == wantSnap, "replayed snapshot delta must collapse")

      // crash BETWEEN the appends: a partial first attempt landed only
      // the CMS delta, then the whole batch replays — every store must
      // still converge to the same one-pass state
      val b3 = ev.filter(pmod(col("event_id"), lit(3)) === 2)
        .withColumn("event_id", col("event_id") + lit(1000000000L))
      MetricsStore.appendCms(spark, cmsBase, b3, col("ts"),
        col("user_id"))
      StreamingMonitor.processBatch(spark, kmvBase, cmsBase,
        Some(histBase), snapBase, b3)
      val all3 = ev.unionByName(b3)
      assert(gotCms() == rows(TimeSeries.cmsCells(all3, col("user_id")),
        "row_id", "bucket"),
        "partial-then-replay CMS must converge to one pass over all")
      assert(gotKmv() == rows(TimeSeries.kmvEstimate(TimeSeries.kmvMerge(
        TimeSeries.kmvDaily(all3, col("event_type"), col("ts"),
          col("user_id"), kmvK), kmvK), kmvK), "key"))
    } finally {
      Seq(s"${kmvBase}_kmv", s"${kmvBase}_meta", s"${cmsBase}_cms",
        s"${histBase}_hist", s"${snapBase}_latest")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Caches.deleteDir(tmp)
    }
  }
}
