package graft

import graft.sources.DsirStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sources/DsirStore (SURVEY.md §2 H11b): the persisted incremental
  * DSIR model — score ≡ the oracle-verified in-query dsir_weights,
  * appends are exact and crash-replay-convergent, the store is
  * target-agnostic at scoring time, and compaction is layout-only.
  */
class DsirStoreSpec extends GraftSpec {

  private def docs = sources.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"), col("lang"))

  private var n = 0
  private def freshBase(): (String, String) = {
    n += 1
    val base = s"graft_dsir_spec_${System.nanoTime()}_$n"
    (base, s"${sys.props("java.io.tmpdir")}/$base")
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Long, Boolean)] =
    df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSeq

  private def cleanup(base: String, path: String): Unit = {
    Seq("cnt", "docs").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS ${base}_$s"))
    Caches.deleteDir(path)
  }

  private lazy val inQuery: Seq[(Long, Long, Long, Boolean)] =
    rows(SparkEntry.queries("dsir_weights")(spark, sfDir))

  test("score over a full-corpus model equals in-query dsir_weights") {
    val (base, path) = freshBase()
    try {
      DsirStore.write(docs, base, path)
      assert(rows(DsirStore.score(spark, base,
        docs.select(col("doc_id"), col("text")))) == inQuery)
    } finally cleanup(base, path)
  }

  test("write evens + append odds equals the full retrain, and " +
      "re-appending history is a no-op") {
    val (base, path) = freshBase()
    try {
      DsirStore.write(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        base, path)
      DsirStore.append(spark, base,
        docs.filter(pmod(col("doc_id"), lit(2)) =!= 0))
      val batch = docs.select(col("doc_id"), col("text"))
      assert(rows(DsirStore.score(spark, base, batch)) == inQuery)
      val before = spark.table(s"${base}_cnt").count()
      DsirStore.append(spark, base, docs)
      assert(spark.table(s"${base}_cnt").count() == before)
      assert(rows(DsirStore.score(spark, base, batch)) == inQuery)
    } finally cleanup(base, path)
  }

  test("append refuses under a foreign _docs lease BEFORE any leg " +
      "runs, and the refused append leaks nothing") {
    val (base, path) = freshBase()
    val lock = new java.io.File(s"$path/docs__lock")
    try {
      DsirStore.write(docs.limit(10), base, path)
      val cntBefore = spark.table(s"${base}_cnt").count()
      val docsBefore = spark.table(s"${base}_docs").count()
      lock.getParentFile.mkdirs()
      val w = new java.io.FileWriter(lock)
      try w.write("pid=1 host=not-this-host at=never") finally w.close()
      intercept[java.util.ConcurrentModificationException] {
        DsirStore.append(spark, base,
          docs.limit(20).filter(col("doc_id") >= 10))
      }
      spark.catalog.refreshTable(s"${base}_cnt")
      spark.catalog.refreshTable(s"${base}_docs")
      assert(spark.table(s"${base}_cnt").count() == cntBefore,
        "a refused append leaked count delta rows")
      assert(spark.table(s"${base}_docs").count() == docsBefore,
        "a refused append leaked commit rows")
    } finally {
      lock.delete()
      cleanup(base, path)
    }
  }

  test("crash replay converges: count delta landed but no commit " +
      "record — the replay's duplicates collapse at read") {
    val (base, path) = freshBase()
    try {
      DsirStore.write(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        base, path)
      val odds = docs.filter(pmod(col("doc_id"), lit(2)) =!= 0)
      // crash: the delta leg landed, the _docs commit did not — the
      // replayed append re-derives the identical content batch_id, so
      // its duplicate delta rows must collapse at read
      val novel = DsirStore.novelSlice(spark, base, odds)
      DsirStore.appendDelta(spark, base, novel)
      novel.unpersist()
      DsirStore.append(spark, base, odds)
      assert(rows(DsirStore.score(spark, base,
        docs.select(col("doc_id"), col("text")))) == inQuery)
    } finally cleanup(base, path)
  }

  test("the store is target-agnostic: one store scores any reference " +
      "slice, matching a retrain with that targetLang") {
    val (base, path) = freshBase()
    try {
      DsirStore.write(docs, base, path)
      val got = rows(DsirStore.score(spark, base,
        docs.select(col("doc_id"), col("text")), targetLang = "de"))
      val want = rows(operators.CurationPack
        .dsirWeightsOver(docs, targetLang = "de"))
      assert(got == want)
      // and the two targets genuinely disagree somewhere (the spec
      // would be vacuous on a corpus where they coincide)
      assert(got != inQuery)
    } finally cleanup(base, path)
  }

  test("compact is layout-only: one file, rows and batch_ids " +
      "preserved, scores unchanged") {
    val (base, path) = freshBase()
    try {
      DsirStore.write(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        base, path)
      DsirStore.append(spark, base,
        docs.filter(pmod(col("doc_id"), lit(2)) =!= 0))
      val idsBefore = spark.table(s"${base}_cnt")
        .select("batch_id").distinct().collect().map(_.getString(0)).toSet
      val rowsBefore = spark.table(s"${base}_cnt").count()
      DsirStore.compact(spark, base)
      assert(rows(DsirStore.score(spark, base,
        docs.select(col("doc_id"), col("text")))) == inQuery)
      assert(spark.table(s"${base}_cnt").count() == rowsBefore)
      assert(spark.table(s"${base}_cnt").select("batch_id").distinct()
        .collect().map(_.getString(0)).toSet == idsBefore)
      val loc = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser
          .parseTableIdentifier(s"${base}_cnt")).location
      val files = new java.io.File(loc).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${base}_cnt: ${files.length} files")
    } finally cleanup(base, path)
  }

  test("registry rows gate both store paths against the H11 oracle") {
    val o = SparkEntry.oracleSql
    assert(o("dsir_store_score") == o("dsir_weights"))
    assert(o("dsir_store_append_score") == o("dsir_weights"))
  }
}
