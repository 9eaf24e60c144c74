package graft

import graft.expressions.Log2FixImpl
import graft.sources.LmStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sources/LmStore (SURVEY.md §2 I5): the persisted incremental bigram
  * LM — score ≡ the oracle-verified in-query lm_score, appends are
  * exact and crash-replay-convergent, and out-of-vocabulary bigrams
  * score at the smoothing floor instead of dropping.
  */
class LmStoreSpec extends GraftSpec {

  private def docs = sources.Tables.documents(spark, sfDir)

  private var n = 0
  private def freshBase(): (String, String) = {
    n += 1
    val base = s"graft_lm_spec_${System.nanoTime()}_$n"
    (base, s"${sys.props("java.io.tmpdir")}/$base")
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Long)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  private def cleanup(base: String, path: String): Unit = {
    Seq("uni", "big", "docs").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS ${base}_$s"))
    Caches.deleteDir(path)
  }

  private lazy val inQuery: Seq[(Long, Long, Long, Long)] =
    rows(SparkEntry.queries("lm_score")(spark, sfDir))

  test("score over a full-corpus model equals in-query lm_score") {
    val (base, path) = freshBase()
    try {
      LmStore.write(docs, base, path)
      assert(rows(LmStore.score(spark, base, docs)) == inQuery)
    } finally cleanup(base, path)
  }

  test("write evens + append odds equals the full-corpus model, " +
      "and re-appending history is a no-op") {
    val (base, path) = freshBase()
    try {
      LmStore.write(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        base, path)
      LmStore.append(spark, base,
        docs.filter(pmod(col("doc_id"), lit(2)) =!= 0))
      assert(rows(LmStore.score(spark, base, docs)) == inQuery)
      val before = spark.table(s"${base}_uni").count()
      LmStore.append(spark, base, docs)
      assert(spark.table(s"${base}_uni").count() == before)
      assert(rows(LmStore.score(spark, base, docs)) == inQuery)
    } finally cleanup(base, path)
  }

  test("append is ONE critical section under the _docs lease: a " +
      "foreign holder blocks the whole append before any delta lands") {
    val (base, path) = freshBase()
    val lock = new java.io.File(s"$path/docs__lock")
    try {
      LmStore.write(docs.limit(10), base, path)
      val uniBefore = spark.table(s"${base}_uni").count()
      val docsBefore = spark.table(s"${base}_docs").count()
      // a LIVE foreign-host writer's marker: never judged dead, so the
      // append must refuse loudly — at its OUTER acquisition, before
      // the novelty probe or either n-gram delta runs (the DsirStore
      // r12 double-count fix, mirrored here)
      lock.getParentFile.mkdirs()
      val w = new java.io.FileWriter(lock)
      try w.write("pid=1 host=not-this-host at=never") finally w.close()
      intercept[java.util.ConcurrentModificationException] {
        LmStore.append(spark, base,
          docs.limit(20).filter(col("doc_id") >= 10))
      }
      spark.catalog.refreshTable(s"${base}_uni")
      spark.catalog.refreshTable(s"${base}_docs")
      assert(spark.table(s"${base}_uni").count() == uniBefore,
        "a refused append leaked n-gram delta rows")
      assert(spark.table(s"${base}_docs").count() == docsBefore,
        "a refused append leaked commit rows")
    } finally {
      lock.delete()
      cleanup(base, path)
    }
  }

  test("crash replay converges: count deltas landed but no commit " +
      "record — the re-run's duplicates collapse at read") {
    val (base, path) = freshBase()
    try {
      LmStore.write(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        base, path)
      val odds = docs.filter(pmod(col("doc_id"), lit(2)) =!= 0)
      // simulate: an append crashed after both count-delta legs but
      // before the _docs commit — run append against a store whose
      // _docs we then roll back by re-running the full append, which
      // still sees the batch as novel only if the commit never landed.
      // Drive it through the public API: append once (full), then
      // FORCE a duplicate delta by appending the same deltas directly.
      LmStore.append(spark, base, odds)
      val expect = rows(LmStore.score(spark, base, docs))
      assert(expect == inQuery)
      // physically duplicate EVERY delta row in both tables — exactly
      // what a replayed crashed-before-commit append lands (same
      // content-derived batch_ids)
      Seq("uni", "big").foreach { t =>
        val dup = spark.table(s"${base}_$t").localCheckpoint(true)
        dup.write.mode("append").format("parquet")
          .saveAsTable(s"${base}_$t")
        spark.catalog.refreshTable(s"${base}_$t")
        dup.unpersist()
      }
      // duplicated rows with identical batch_ids must not change the
      // merged model
      assert(rows(LmStore.score(spark, base, docs)) == expect)
    } finally cleanup(base, path)
  }

  test("out-of-vocabulary bigrams score at the smoothing floor " +
      "instead of dropping") {
    import spark.implicits._
    val (base, path) = freshBase()
    try {
      LmStore.write(Seq((1L, "a b a b"), (2L, "a b c")).toDF(
        "doc_id", "text"), base, path)
      // model: V=3; c1(a)=3, c1(b)=3, c1(c)=1
      // bigram counts: (a,b)=3, (b,a)=1, (b,c)=1
      val got = rows(LmStore.score(spark, base,
        Seq((9L, "a b zz qq")).toDF("doc_id", "text")))
      val lg = (x: Long) => Log2FixImpl.log2q20(x)
      // costs: (a,b): lg(3+3)-lg(3+1); (b,zz): lg(3+3)-lg(0+1);
      //        (zz,qq): lg(0+3)-lg(0+1)  — unseen context c1=0
      val xent = (lg(6) - lg(4)) + (lg(6) - lg(1)) + (lg(3) - lg(1))
      assert(got == Seq((9L, 3L, xent, xent * 1000L / (3L * 1048576L))))
    } finally cleanup(base, path)
  }

  test("compact is layout-only: one file, rows and batch_ids " +
      "preserved, scores unchanged") {
    val (base, path) = freshBase()
    try {
      LmStore.write(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        base, path)
      LmStore.append(spark, base,
        docs.filter(pmod(col("doc_id"), lit(2)) =!= 0))
      val idsBefore = spark.table(s"${base}_uni")
        .select("batch_id").distinct().collect().map(_.getString(0)).toSet
      val rowsBefore = spark.table(s"${base}_uni").count()
      LmStore.compact(spark, base)
      assert(rows(LmStore.score(spark, base, docs)) == inQuery)
      // rows and their replay-dedup keys survive the rewrite exactly
      assert(spark.table(s"${base}_uni").count() == rowsBefore)
      assert(spark.table(s"${base}_uni").select("batch_id").distinct()
        .collect().map(_.getString(0)).toSet == idsBefore)
      // and the layout goal is met: one data file per delta table
      Seq("uni", "big").foreach { t =>
        val loc = spark.sessionState.catalog.getTableMetadata(
          spark.sessionState.sqlParser
            .parseTableIdentifier(s"${base}_$t")).location
        val files = new java.io.File(loc).listFiles()
          .filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"${base}_$t: ${files.length} files")
      }
    } finally cleanup(base, path)
  }

  test("compact between a crashed append and its replay still " +
      "converges (the fold-across-ids hazard, pinned)") {
    val (base, path) = freshBase()
    try {
      LmStore.write(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        base, path)
      val odds = docs.filter(pmod(col("doc_id"), lit(2)) =!= 0)
      // crash: delta legs landed, no _docs commit record
      val novel = LmStore.novelSlice(spark, base, odds)
      LmStore.appendDeltas(spark, base, novel)
      novel.unpersist()
      // an operator compacts the store while the append is un-replayed
      LmStore.compact(spark, base)
      // the replay lands the same deltas under the same content ids —
      // compaction preserved the ids, so they still collapse at read
      LmStore.append(spark, base, odds)
      assert(rows(LmStore.score(spark, base, docs)) == inQuery)
    } finally cleanup(base, path)
  }

  test("registry rows gate both store paths against the I1 oracle") {
    val o = SparkEntry.oracleSql
    assert(o("lm_index_score") == o("lm_score"))
    assert(o("lm_index_append_score") == o("lm_score"))
  }
}
