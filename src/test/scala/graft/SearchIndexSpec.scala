package graft

import graft.operators.SearchPack
import graft.sources.SearchIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sources/SearchIndex (SURVEY.md §2 I4): the persisted BM25 inverted
  * index — search ≡ the oracle-verified in-query bm25_search, appends
  * are exact and crash-replay-convergent, and the postings scan is
  * statically bucket-pruned to the query terms.
  */
class SearchIndexSpec extends GraftSpec {

  private val terms = Seq("spark", "hash", "merge", "vector", "stream")
  private def docs = sources.Tables.documents(spark, sfDir)

  private var n = 0
  /** Fresh store base+path per test (stores are single-writer and the
    * catalog is session-global).
    */
  private def freshBase(): (String, String) = {
    n += 1
    val base = s"graft_bm25_spec_${System.nanoTime()}_$n"
    (base, s"${sys.props("java.io.tmpdir")}/$base")
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def cleanup(base: String, path: String): Unit = {
    Seq("postings", "docs", "totals").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS ${base}_$s"))
    Caches.deleteDir(path)
  }

  private lazy val inQuery: Seq[(Long, Long, Long)] =
    rows(SparkEntry.queries("bm25_search")(spark, sfDir))

  test("index search over a full-corpus store equals in-query bm25") {
    val (base, path) = freshBase()
    try {
      SearchIndex.write(docs, base, path)
      assert(rows(SearchIndex.search(spark, base, terms, 20)) == inQuery)
    } finally cleanup(base, path)
  }

  test("postings scan is bucket-pruned to the query terms' buckets") {
    val (base, path) = freshBase()
    try {
      SearchIndex.write(docs, base, path)
      val q = SearchIndex.search(spark, base, terms, 20)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(plan)
      assert(m.isDefined, "no bucket pruning in plan:\n" + plan.take(2000))
      assert(m.get.group(1).toInt <= terms.size &&
        m.get.group(1).toInt < m.get.group(2).toInt,
        s"expected ≤ ${terms.size} buckets, got ${m.get.group(0)}")
    } finally cleanup(base, path)
  }

  test("write evens + append odds equals the full-corpus index, " +
      "and re-appending history is a no-op") {
    val (base, path) = freshBase()
    try {
      SearchIndex.write(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        base, path)
      val odds = docs.filter(pmod(col("doc_id"), lit(2)) =!= 0)
      SearchIndex.append(spark, base, odds)
      assert(rows(SearchIndex.search(spark, base, terms, 20)) == inQuery)
      // novelty filter: appending already-ingested content changes
      // nothing — not the scores, not the postings row count
      val before = spark.table(s"${base}_postings").count()
      SearchIndex.append(spark, base, docs)
      assert(spark.table(s"${base}_postings").count() == before)
      assert(rows(SearchIndex.search(spark, base, terms, 20)) == inQuery)
    } finally cleanup(base, path)
  }

  test("crash replay converges: a partial append (no commit record) " +
      "re-run lands duplicates that the read path collapses") {
    val (base, path) = freshBase()
    try {
      SearchIndex.write(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        base, path)
      val odds = docs.filter(pmod(col("doc_id"), lit(2)) =!= 0)
      // crash after postings+totals, BEFORE the _docs commit record
      val novel = SearchIndex.novelSlice(spark, base, odds)
      SearchIndex.appendPostings(spark, base, novel)
      SearchIndex.appendTotals(spark, base, novel)
      novel.unpersist()
      // replay the whole append: the novelty filter still sees the
      // batch as novel (no commit record), so every leg re-runs
      SearchIndex.append(spark, base, odds)
      // duplicated postings rows and a duplicated (same batch_id)
      // totals delta are collapsed by the read path
      assert(rows(SearchIndex.search(spark, base, terms, 20)) == inQuery)
      // totals: one logical batch despite two physical delta rows
      val t = spark.table(s"${base}_totals")
      assert(t.count() == 3) // write + appendTotals + replayed append
      assert(t.select(countDistinct(col("batch_id"))).first().getLong(0)
        == 2) // the two delta rows share one content-derived id
    } finally cleanup(base, path)
  }

  test("compact restores one file per bucket; search results unchanged") {
    val (base, path) = freshBase()
    try {
      SearchIndex.write(docs.filter(pmod(col("doc_id"), lit(2)) === 0),
        base, path)
      SearchIndex.append(spark, base,
        docs.filter(pmod(col("doc_id"), lit(2)) =!= 0))
      SearchIndex.compact(spark, base)
      assert(rows(SearchIndex.search(spark, base, terms, 20)) == inQuery)
    } finally cleanup(base, path)
  }

  test("registry rows gate both store paths against the I2 oracle") {
    val names = SparkEntry.oracleSql
    assert(names("bm25_index_search") == names("bm25_search"))
    assert(names("bm25_index_append_search") == names("bm25_search"))
  }
}
