package graft

import graft.streaming.StreamingAnomaly
import graft.streaming.StreamingAnomaly.{Anomaly, Bin}

class StreamingAnomalySpec extends GraftSpec {
  import spark.implicits._

  // Stable baseline around 100 with one spike at bin 20 and one dip at
  // bin 30; a second key stays flat (no anomalies).
  private val bins: Seq[Bin] =
    (0 until 40).map { i =>
      val x = if (i == 20) 500.0 else if (i == 30) -200.0
              else 100.0 + (i % 7)
      Bin("edge-a", i.toLong * 3600, x)
    } ++ (0 until 40).map(i => Bin("edge-b", i.toLong * 3600, 50.0 + (i % 3)))

  private def asSet(rows: Array[Anomaly]) =
    rows.map(a => (a.key, a.bin_start, a.x, a.z_ppm, a.n_prior)).toSet

  test("batch detect flags the spike and dip against the prior baseline only") {
    val got = StreamingAnomaly.detect(bins.toDS()).collect()
    val keys = got.map(a => (a.key, a.bin_start)).toSet
    assert(keys.contains(("edge-a", 20L * 3600)))
    assert(keys.contains(("edge-a", 30L * 3600)))
    assert(!got.exists(_.key == "edge-b"), "flat key must not alert")
    // prior-only: the spike's n_prior is exactly the bins before it
    assert(got.find(a => a.bin_start == 20L * 3600).get.n_prior == 20L)
  }

  test("streaming detect equals batch for any time-ordered chunking") {
    import java.nio.file.{Files, Paths}
    val want = asSet(StreamingAnomaly.detect(bins.toDS()).collect())
    val dir = Files.createTempDirectory("graft-anomaly-stream")
    // chunk by time: bins 0-14, 15-29, 30-39 (all keys interleaved);
    // each chunk is written AND drained before the next lands, so the
    // three micro-batches arrive in time order deterministically
    val byTime = bins.sortBy(_.bin_start)
    val chunks = Seq(byTime.filter(_.bin_start < 15 * 3600),
      byTime.filter(b => b.bin_start >= 15 * 3600 && b.bin_start < 30 * 3600),
      byTime.filter(_.bin_start >= 30 * 3600))
    val stream = spark.readStream
      .schema("key STRING, bin_start LONG, x DOUBLE")
      .csv(dir.toString)
      .as[Bin]
    val q = StreamingAnomaly.detect(stream)
      .toDF()
      .writeStream.format("memory").queryName("anomaly_stream")
      .outputMode("append").start()
    try {
      chunks.zipWithIndex.foreach { case (chunk, i) =>
        Files.writeString(Paths.get(dir.toString, s"b$i.csv"),
          chunk.map(b => s"${b.key},${b.bin_start},${b.x}")
            .mkString("", "\n", "\n"))
        q.processAllAvailable()
      }
      val got = asSet(spark.table("anomaly_stream").as[Anomaly].collect())
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
