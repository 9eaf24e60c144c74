package graft

import graft.sources.{PqStore, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** sources/PqStore (SURVEY.md §2 D12): the persisted PQ index — store
  * search ≡ the in-query ann_pq, appends encode against fixed books
  * and are replay-tolerated at read, compaction is score-stable.
  */
class PqStoreSpec extends GraftSpec {

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("persisted-index search equals the in-query ann_pq result") {
    assert(rows(SparkEntry.queries("pq_index_search")(spark, sfDir))
      == rows(SparkEntry.queries("ann_pq")(spark, sfDir)))
  }

  test("append encodes against the fixed books; re-appends and " +
      "compaction cannot change a search") {
    val base = s"graft_pq_spec_${System.nanoTime()}"
    val path = s"${sys.props("java.io.tmpdir")}/$base"
    val corpus = Tables.embeddings(spark, sfDir)
      .filter(pmod(col("vec_id"), lit(50)) =!= 0)
      .select(col("vec_id"), col("embedding"))
    val held = corpus.filter(pmod(col("vec_id"), lit(11)) === 5)
    val queries = Tables.embeddings(spark, sfDir)
      .filter(pmod(col("vec_id"), lit(50)) === 0)
      .select(col("vec_id"), col("embedding"))
    try {
      PqStore.write(corpus.filter(pmod(col("vec_id"), lit(11)) =!= 5),
        base, path)
      PqStore.append(spark, base, held)
      val s1 = rows(PqStore.search(spark, base, queries))
      assert(s1.nonEmpty)
      // appended vectors are actually searchable: some held-out vec_id
      // appears in somebody's top-k (the held slice is ~9% of the
      // corpus; with 10 queries × 5 ranks the expectation is ~4-5 hits)
      val heldIds = held.select("vec_id").collect()
        .map(_.getLong(0)).toSet
      val hitIds = PqStore.search(spark, base, queries)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(hitIds.intersect(heldIds).nonEmpty,
        s"no appended vector ever surfaced: $hitIds")
      // crash-replayed append: duplicate code/vec rows collapse at read
      PqStore.append(spark, base, held)
      assert(rows(PqStore.search(spark, base, queries)) == s1)
      PqStore.compact(spark, base)
      assert(rows(PqStore.search(spark, base, queries)) == s1)
    } finally {
      Seq("books", "codes", "vecs").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS ${base}_$t"))
      Caches.deleteDir(path)
    }
  }
}
