package graft

import graft.streaming.StreamingMinHash
import org.apache.spark.sql.functions._

class StreamingMinHashSpec extends GraftSpec {

  private def asSet(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("batch dupPairs matches the C2 batch pipeline on documents") {
    val batch = SparkEntry.queries("dedup_minhash")(spark, sfDir)
      .select("doc_a", "doc_b", "n_shared_bands", "jaccard")
    val got = StreamingMinHash.dupPairs(
        graft.sources.Tables.documents(spark, sfDir)).toDF().collect()
    assert(asSet(got) == asSet(batch.collect()))
    assert(got.nonEmpty)
  }

  test("maxPerBucket caps state but newcomers still match residents") {
    import spark.implicits._
    val docs = (1L to 5L)
      .map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val capped = StreamingMinHash.dupPairs(docs, maxPerBucket = 1)
      .collect()
    // only doc 1 is resident; every later arrival is flagged against it
    assert(capped.map(p => (p.doc_a, p.doc_b)).toSet ==
      (2L to 5L).map(j => (1L, j)).toSet)
    val uncapped = StreamingMinHash.dupPairs(docs).collect()
    assert(uncapped.length == 10) // all C(5,2) pairs without the cap
  }

  test("streaming dupPairs equals batch regardless of micro-batch chunking") {
    import java.nio.file.{Files, Paths}
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).orderBy("doc_id").collect()
    // tab-free single-line text so a csv round-trip is faithful
    def esc(s: String) = s.replace("\t", " ").replace("\n", " ")
    val dir = Files.createTempDirectory("graft-minhash-stream")
    val third = docs.length / 3
    Seq(docs.slice(0, third), docs.slice(third, 2 * third),
        docs.slice(2 * third, docs.length)).zipWithIndex.foreach {
      case (chunk, i) =>
        Files.writeString(Paths.get(dir.toString, s"b$i.csv"),
          chunk.map(r => s"${r.getLong(0)}\t${esc(r.getString(1))}")
            .mkString("", "\n", "\n"))
        // one file per processAllAvailable → three real micro-batches
    }
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("sep", "\t").option("maxFilesPerTrigger", "1")
      .csv(dir.toString)
    val q = StreamingMinHash.dupPairs(stream.toDF())
      .toDF()
      .writeStream.format("memory").queryName("minhash_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = asSet(spark.table("minhash_stream").collect())
      // expected: the same pipeline over the csv round-tripped text (tab
      // and newline escaping may perturb a shingle, so the reference is
      // the batch run on the SAME escaped corpus, not on raw parquet)
      val escaped = spark.createDataFrame(
        spark.sparkContext.parallelize(docs.toIndexedSeq.map(r =>
          org.apache.spark.sql.Row(r.getLong(0), esc(r.getString(1))))),
        org.apache.spark.sql.types.StructType.fromDDL(
          "doc_id LONG, text STRING"))
      val want = asSet(StreamingMinHash.dupPairs(escaped).toDF().collect())
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }
}
