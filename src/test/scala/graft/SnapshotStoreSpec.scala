package graft

import graft.sources.{SnapshotStore, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sources/SnapshotStore (SURVEY.md §2 A19b): the persisted latest-
  * per-key snapshot — snapshot-after-append ≡ one global pass, replays
  * collapse on the content-derived batch id, compaction is layout-only,
  * late-arriving older rows cannot displace newer state.
  */
class SnapshotStoreSpec extends GraftSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.orderBy("user_id").collect().map(_.toString).toSeq

  private def cleanup(base: String, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${base}_latest")
    Caches.deleteDir(path)
  }

  test("snapshot over write + append equals the in-query q_latest; " +
      "replays and compaction are snapshot-stable") {
    val base = s"graft_snap_spec_${System.nanoTime()}"
    val path = s"${sys.props("java.io.tmpdir")}/$base"
    val ev = Tables.events(spark, sfDir)
    val odds = ev.filter(pmod(col("event_id"), lit(2)) =!= 0)
    try {
      SnapshotStore.write(
        ev.filter(pmod(col("event_id"), lit(2)) === 0), base, path)
      SnapshotStore.append(spark, base, odds)
      val want = rows(SparkEntry.queries("q_latest")(spark, sfDir))
      def got() = rows(SnapshotStore.snapshot(spark, base))
      assert(got() == want, "snapshot-after-append must equal one pass")
      // crash-replayed append: same content-derived batch_id, the
      // duplicate partials collapse at read — counts must NOT double
      SnapshotStore.append(spark, base, odds)
      assert(got() == want, "replayed delta must collapse at read")
      SnapshotStore.compact(spark, base)
      assert(got() == want)
    } finally cleanup(base, path)
  }

  test("a late-arriving OLDER record updates the count but cannot " +
      "displace newer state") {
    import spark.implicits._
    val base = s"graft_snap_spec2_${System.nanoTime()}"
    val path = s"${sys.props("java.io.tmpdir")}/$base"
    def ev(rows: (Long, Long, String, Double, String)*): DataFrame =
      rows.toSeq.toDF("event_id", "user_id", "event_type", "value", "s")
        .withColumn("ts", to_timestamp(col("s"))).drop("s")
    try {
      SnapshotStore.write(ev(
        (10L, 1L, "new", 2.0, "2024-03-02 10:00:00")), base, path)
      SnapshotStore.append(spark, base, ev(
        (4L, 1L, "old", 1.0, "2024-03-01 09:00:00"))) // older backfill
      val snap = SnapshotStore.snapshot(spark, base).collect()
      assert(snap.length == 1)
      assert(snap(0).getLong(2) == 10L && snap(0).getString(3) == "new",
        s"older backfill displaced newer state: ${snap(0)}")
      assert(snap(0).getLong(5) == 2L, s"count: ${snap(0)}")
    } finally cleanup(base, path)
  }
}
