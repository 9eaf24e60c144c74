package graft

import graft.expressions.BoundedCollectList
import org.apache.spark.sql.functions._

/** G8 — bounded collect_list aggregate. */
class BoundedCollectSpec extends GraftSpec {
  import spark.implicits._

  test("under-cap groups collect their complete element set") {
    val df = Seq((1, 10L), (1, 11L), (2, 20L), (2, 21L), (2, 22L))
      .toDF("k", "v")
    val got = df.groupBy($"k")
      .agg(BoundedCollectList.boundedCollect($"v", 5).as("vs"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).sorted).toMap
    assert(got(1) == Seq(10L, 11L))
    assert(got(2) == Seq(20L, 21L, 22L))
  }

  test("over-cap groups truncate at the cap on every path") {
    val rows = (1 to 10000).map(i => (i % 7, i.toLong))
    // many partitions force partial aggregation + merges
    val df = spark.createDataFrame(rows).toDF("k", "v").repartition(16)
    val got = df.groupBy($"k")
      .agg(BoundedCollectList.boundedCollect($"v", 9).as("vs"),
        count(lit(1)).as("n"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1).length == 9)
      assert(r.getLong(2) > 9) // exact count unaffected by the cap
      // truncated contents are still real elements of the group
      assert(r.getSeq[Long](1).forall(v => v % 7 == r.getInt(0)))
    }
  }

  test("matches collect_list as a set when the cap exceeds group size") {
    val ev = graft.sources.Tables.events(spark, sfDir).limit(2000)
    val a = ev.groupBy($"event_type")
      .agg(BoundedCollectList.boundedCollect($"event_id", 1000000).as("xs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    val b = ev.groupBy($"event_type")
      .agg(collect_list($"event_id").as("xs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).sorted).toMap
    assert(a == b)
  }
}
