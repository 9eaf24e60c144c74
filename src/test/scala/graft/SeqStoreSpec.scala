package graft

import graft.sources.{SeqStore, Tables}
import org.apache.spark.sql.functions._

/** sources/SeqStore (SURVEY.md §2 H9b): the persisted sequence
  * packing — segments-after-monotone-appends ≡ one global pass,
  * replays pack nothing, non-monotone appends refuse loudly,
  * compaction is layout-only.
  */
class SeqStoreSpec extends GraftSpec {

  private def segRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.orderBy("doc_id", "seg_idx").collect().map(_.toString).toSeq

  test("write + two monotone appends equal the one-pass packing; a " +
      "replayed batch packs nothing; compact is stable") {
    val base = s"graft_seq_spec_${System.nanoTime()}"
    val path = s"${sys.props("java.io.tmpdir")}/$base"
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val mx = docs.agg(max(col("doc_id"))).head.getLong(0)
    val (t1, t2) = (mx / 3, 2 * mx / 3)
    try {
      SeqStore.write(docs.filter(col("doc_id") <= t1), base, path)
      SeqStore.append(spark, base,
        docs.filter(col("doc_id") > t1 && col("doc_id") <= t2))
      SeqStore.append(spark, base, docs.filter(col("doc_id") > t2))
      val want = segRows(
        SparkEntry.queries("pack_sequences")(spark, sfDir))
      def got() = segRows(SeqStore.segments(spark, base))
      assert(got() == want,
        "segments after monotone appends must equal one pass")
      // crash replay: the whole last batch re-delivered — the novel
      // filter packs zero docs, nothing changes
      SeqStore.append(spark, base, docs.filter(col("doc_id") > t2))
      assert(got() == want, "replayed batch must pack nothing")
      // a batch that OVERLAPS history packs only its novel tail
      // (replay + new arrivals in one delivery)
      val extra = docs.filter(col("doc_id") > t2)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
      SeqStore.append(spark, base,
        docs.filter(col("doc_id") > t2).unionByName(extra))
      val wantExtra = segRows(graft.operators.CurationPack.packSegments(
        docs.unionByName(extra), {
          import spark.implicits._; Seq(0L).toDF("off")
        }))
      assert(got() == wantExtra,
        "overlapping delivery must pack exactly the novel tail")
      SeqStore.compact(spark, base)
      assert(got() == wantExtra, "compact must be layout-only")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${base}_segs")
      Caches.deleteDir(path)
    }
  }

  test("a replayed batch carrying a zero-token doc still converges " +
      "after later appends (the eternally-novel hazard, pinned)") {
    val base = s"graft_seq_spec3_${System.nanoTime()}"
    val path = s"${sys.props("java.io.tmpdir")}/$base"
    import spark.implicits._
    try {
      SeqStore.write(Seq((1L, "alpha beta")).toDF("doc_id", "text"),
        base, path)
      // batch 1 contains a whitespace-only doc: it occupies no token
      // positions and never lands in the segment index
      val b1 = Seq((10L, "gamma delta"), (11L, "   "))
        .toDF("doc_id", "text")
      SeqStore.append(spark, base, b1)
      SeqStore.append(spark, base,
        Seq((20L, "epsilon zeta")).toDF("doc_id", "text"))
      val before = SeqStore.segments(spark, base)
        .orderBy("doc_id", "seg_idx").collect().map(_.toString).toSeq
      // crash replay of batch 1: doc 11 must not read as novel and
      // trip the monotone check against the stored max of 20
      SeqStore.append(spark, base, b1)
      val after = SeqStore.segments(spark, base)
        .orderBy("doc_id", "seg_idx").collect().map(_.toString).toSeq
      assert(after == before, "replay must be a no-op")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${base}_segs")
      Caches.deleteDir(path)
    }
  }

  test("a non-monotone append refuses loudly") {
    val base = s"graft_seq_spec2_${System.nanoTime()}"
    val path = s"${sys.props("java.io.tmpdir")}/$base"
    import spark.implicits._
    try {
      SeqStore.write(Seq((10L, "alpha beta gamma"), (20L, "delta"))
        .toDF("doc_id", "text"), base, path)
      val e = intercept[IllegalArgumentException] {
        SeqStore.append(spark, base,
          Seq((15L, "out of order")).toDF("doc_id", "text"))
      }
      assert(e.getMessage.contains("append-only layout"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${base}_segs")
      Caches.deleteDir(path)
    }
  }
}
