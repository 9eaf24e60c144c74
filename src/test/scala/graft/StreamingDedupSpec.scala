package graft

import java.nio.file.{Files, Paths}

import graft.streaming.StreamingDedup
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends GraftSpec {
  import spark.implicits._

  test("batch firstOccurrence keeps one row per key") {
    val ds = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "a"))
      .toDF("doc_id", "k").as[(Long, String)]
    val got = StreamingDedup.firstOccurrence[(Long, String)](ds, _._2)
      .collect().toMap
    assert(got.values.toSet == Set("a", "b"))
    assert(got.size == 2)
  }

  test("idleTimeout wiring leaves batch semantics unchanged") {
    // batch execution runs the same code path with the timeout conf set
    // (setTimeoutDuration is invoked per group; timeouts never fire in
    // batch). A live streaming assertion is impractical here: a
    // timeout-configured query schedules no-data batches indefinitely
    // to evaluate timeouts, so neither processAllAvailable nor
    // Trigger.AvailableNow ever terminates the query.
    val ds = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "a"))
      .toDF("doc_id", "k").as[(Long, String)]
    val got = StreamingDedup.firstOccurrence[(Long, String)](
      ds, _._2, idleTimeout = Some("1 hour")).collect().toMap
    assert(got.values.toSet == Set("a", "b") && got.size == 2)
    val latest = StreamingDedup.latestPerKey[(Long, String)](
      ds, _._2, r => (r._1, r._1), idleTimeout = Some("1 hour"))
      .collect()
    assert(latest.map(_._1).toSet == Set(4L, 3L))
  }

  test("streaming dedup drops repeats across micro-batches") {
    val dir = Files.createTempDirectory("graft-dedup-stream")
    // micro-batch 1: docs 1,2 (distinct texts); batch 2: doc 3 repeats 1
    Files.writeString(Paths.get(dir.toString, "b1.csv"),
      "1\talpha beta gamma\n2\tdelta epsilon zeta\n")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("sep", "\t")
      .csv(dir.toString)
    val q = StreamingDedup.dedupDocuments(stream.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == 2)
      Files.writeString(Paths.get(dir.toString, "b2.csv"),
        "3\tALPHA  beta gamma\n4\tnew unseen text\n")
      q.processAllAvailable()
      val rows = spark.table("dedup_stream").collect()
      // doc 3 normalizes to doc 1's fingerprint -> dropped by state
      assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("latestPerKey keeps the max-ordered row per key across batches") {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-latest")
    Files.writeString(Paths.get(dir.toString, "b1.csv"),
      "u1,10,100\nu1,20,101\nu2,5,102\n")
    val stream = spark.readStream
      .schema("user STRING, ts LONG, eid LONG")
      .csv(dir.toString)
      .as[(String, Long, Long)]
    val q = StreamingDedup.latestPerKey[(String, Long, Long)](
        stream, _._1, r => (r._2, r._3))
      .toDF("user", "ts", "eid")
      .writeStream.format("memory").queryName("latest_stream")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // batch 2: a NEWER u2 row and an OLDER (late) u1 row
      Files.writeString(Paths.get(dir.toString, "b2.csv"),
        "u2,50,103\nu1,15,104\n")
      q.processAllAvailable()
      val latest = spark.table("latest_stream").collect()
        .groupBy(_.getString(0))
        .map { case (k, rs) => k -> rs.map(r =>
          (r.getLong(1), r.getLong(2))).max }
      // late u1 row must NOT displace the newer state
      assert(latest("u1") == (20L, 101L))
      assert(latest("u2") == (50L, 103L))
    } finally q.stop()
  }

  test("streaming passage dedup: first arrival wins across micro-batches") {
    import java.nio.file.{Files, Paths}
    val boiler = (1 to 32).map(i => s"nav$i").mkString(" ")
    def body(tag: String) = (1 to 32).map(i => s"$tag$i").mkString(" ")
    val dir = Files.createTempDirectory("graft-passage-stream")
    Files.writeString(Paths.get(dir.toString, "b1.csv"),
      s"1\t$boiler ${body("a")}\n")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("sep", "\t")
      .csv(dir.toString)
    val q = graft.streaming.StreamingPassageDedup
      .keepFirstChunks(stream.toDF())
      .writeStream.format("memory").queryName("passage_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val r1 = spark.table("passage_stream").collect()
      assert(r1.length == 2 && r1.forall(_.getBoolean(4)),
        "doc 1's chunks are all first occurrences")
      // batch 2: doc 2 repeats the boilerplate, brings a fresh body
      Files.writeString(Paths.get(dir.toString, "b2.csv"),
        s"2\t$boiler ${body("b")}\n")
      q.processAllAvailable()
      val byDoc = spark.table("passage_stream").collect()
        .groupBy(_.getLong(0))
      val doc2 = byDoc(2L).map(r => r.getString(2) -> r.getBoolean(4)).toMap
      assert(!doc2(boiler), "doc 2's boilerplate chunk must be dropped")
      assert(doc2(body("b")), "doc 2's unique chunk must be kept")
      // global invariant: exactly one kept decision per distinct hash
      val all = spark.table("passage_stream").collect()
      all.groupBy(_.getString(3)).foreach { case (h, rs) =>
        assert(rs.count(_.getBoolean(4)) == 1, s"hash $h kept != 1")
      }
    } finally q.stop()
  }

  test("passage dedup idleTimeout wiring leaves batch semantics unchanged") {
    import spark.implicits._
    val boiler = (1 to 32).map(i => s"nav$i").mkString(" ")
    val docs = Seq((1L, boiler), (2L, boiler)).toDF("doc_id", "text")
    val got = graft.streaming.StreamingPassageDedup
      .keepFirstChunks(docs, idleTimeout = Some("1 hour")).collect()
    assert(got.length == 2 && got.count(_.kept) == 1)
  }

  test("passage dedup batch mode: every occurrence decided, one winner per hash") {
    import spark.implicits._
    val boiler = (1 to 32).map(i => s"nav$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler ${(1 to 32).map(i => s"x$i").mkString(" ")}"),
      (2L, boiler),
      (3L, boiler)).toDF("doc_id", "text")
    val got = graft.streaming.StreamingPassageDedup
      .keepFirstChunks(docs).collect()
    assert(got.length == 4, "4 chunk occurrences expected")
    val boilerDecisions = got.filter(_.chunk == boiler)
    assert(boilerDecisions.length == 3)
    assert(boilerDecisions.count(_.kept) == 1)
    assert(got.filter(_.chunk != boiler).forall(_.kept))
  }
}
