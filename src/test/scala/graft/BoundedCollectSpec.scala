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

  test("MinHashAgg is bit-identical to 64 separate min(affine) aggregates") {
    import graft.functions.Portable.{affine, hashP}
    val n = 64
    val base = graft.sources.Tables.documents(spark, sfDir)
      .select($"doc_id", hashP(col("text")).as("h"))
    val one = base.groupBy($"doc_id")
      .agg(graft.expressions.MinHashAgg.minhashAgg($"h", n).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val many = base.groupBy($"doc_id")
      .agg(min(affine(0, $"h")).as("m0"),
        (1 until n).map(i => min(affine(i, $"h")).as(s"m$i")): _*)
      .collect().map(r => r.getLong(0) ->
        (1 to n).map(i => r.getLong(i)).toSeq).toMap
    assert(one == many)
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
