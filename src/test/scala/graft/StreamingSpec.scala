package graft

import java.nio.file.Files

import graft.operators.CloudFrontPack
import graft.sources.Tables
import graft.streaming.CloudFrontStream
import org.apache.spark.sql.functions._

/** A8/A9 — the streaming pipeline, driven end-to-end with the file
  * source standing in for Kinesis and a memory sink.
  */
class StreamingSpec extends GraftSpec {

  private def writeLines(dir: String): Long = {
    val lines = CloudFrontPack.synthLines(Tables.events(spark, sfDir))
    lines.coalesce(1).write.mode("overwrite").text(dir)
    lines.count()
  }

  test("cf_stream: file-source stream parses and aggregates hourly") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val n = writeLines(dir)
    val stream = spark.readStream
      .schema("value STRING")
      .text(dir)
      .withColumnRenamed("value", "line")
    val agg = CloudFrontStream.hourlyBytesByEdge(stream)
    val q = agg.writeStream
      .format("memory")
      .queryName("cf_hourly")
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("cf_hourly")
      // compare against the identical batch computation
      val batch = CloudFrontStream.hourlyBytesByEdge(
        CloudFrontPack.synthLines(Tables.events(spark, sfDir)))
      val g = got.agg(sum("total_bytes"), sum("n_requests")).head()
      val b = batch.agg(sum("total_bytes"), sum("n_requests")).head()
      assert(g.getLong(1) == n && b.getLong(1) == n)
      assert(g.getLong(0) == b.getLong(0))
      assert(got.count() == batch.count())
    } finally q.stop()
  }

  test("cf_stream sessions: session_window closes on gap") {
    val dir = Files.createTempDirectory("graft-stream-s").toString
    writeLines(dir)
    val stream = spark.readStream
      .schema("value STRING")
      .text(dir)
      .withColumnRenamed("value", "line")
    val q = CloudFrontStream.sessions(stream)
      .writeStream.format("memory").queryName("cf_sessions")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("cf_sessions")
      assert(got.count() > 0)
      // batch equivalence: same session_window computation on the same data
      val batch = CloudFrontStream.sessions(
        CloudFrontPack.synthLines(Tables.events(spark, sfDir)))
      assert(got.agg(sum("n_requests")).head().getLong(0) ==
        batch.agg(sum("n_requests")).head().getLong(0))
      assert(got.count() == batch.count())
    } finally q.stop()
  }
}
