package graft.sources

import graft.functions.Vectors
import graft.operators.AnnPack
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the build-once / query-many form of D5's
  * in-query k-means ANN (SURVEY.md §2 block D).
  *
  * `write` trains the deterministic k-means coarse quantizer
  * (AnnPack.kmCentroids — identical arithmetic to `ann_ivf_kmeans`, so
  * the persisted index IS the oracle-verified one) and lands two
  * parquet tables under `path`:
  *
  *   - `centroids/` — (cell, cv, cc): k rows, broadcast at query time.
  *   - `lists/`     — the postings: (vec_id, v, nrm) PARTITIONED BY
  *     cell, so a probe reads ONLY the probed cells' files.
  *
  * `search` loads the centroids (tiny), picks each query's nprobe
  * nearest cells, narrows the postings scan with a partition filter
  * over the probed cell set — static partition pruning, spec-asserted
  * structurally — and exact-cosine re-ranks inside the probed lists via
  * TopKPerKey bounded heaps. At 100 TB the postings are the corpus;
  * the probe set bounds the scan to nprobe/k of it per query batch,
  * which is the entire point of writing the index down instead of
  * re-clustering per query.
  */
object AnnIndex {

  /** Train on `embs` (vec_id, embedding) and persist under `path`. */
  def write(embs: DataFrame, path: String, k: Int = 8,
      iters: Int = 2): Unit = {
    val n = embs
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    val corpus = AnnPack.kmCorpus(n)
    val cent = AnnPack.kmCentroids(corpus, k, iters)
    cent.write.mode("overwrite").parquet(s"$path/centroids")
    AnnPack.kmAssign(corpus, cent)
      .join(n.select(col("vec_id"), col("nrm")), "vec_id")
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/lists")
  }

  /** Fold new vectors into the index WITHOUT retraining — the ANN leg
    * of the incremental-ingest loop ([[FingerprintStore.append]] /
    * [[MinHashStore.append]] are the exact/minhash legs): each vector
    * is routed to its nearest EXISTING centroid (the same argmin
    * assignment `write` uses) and appended to that cell's postings
    * partition, so the next `search` sees it through the same
    * partition-pruned scan. The quantizer stays fixed — centroids are
    * the search contract; under heavy distribution drift the answer is
    * a rebuild (`write`), not an append. Single-writer ingest contract.
    */
  def append(spark: SparkSession, path: String, embs: DataFrame): Unit = {
    val cent = spark.read.parquet(s"$path/centroids")
    val n = embs
      .select(col("vec_id"), Vectors.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", Vectors.norm(col("v")))
    AnnPack.kmAssign(AnnPack.kmCorpus(n), cent)
      .join(n.select(col("vec_id"), col("nrm")), "vec_id")
      .select(col("vec_id"), col("v"), col("nrm"), col("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$path/lists")
  }

  /** Top-k cosine neighbors of `queries` (vec_id, embedding) from the
    * index at `path`. Returns (query_id, rank, vec_id, cos_sim, cell).
    */
  def search(spark: SparkSession, path: String, queries: DataFrame,
      k: Int = 5, nprobe: Int = 3): DataFrame = {
    val cent = spark.read.parquet(s"$path/centroids")
    val q = queries
      .select(col("vec_id").as("query_id"),
        Vectors.toDouble(col("embedding")).as("qv"))
      .withColumn("qn", Vectors.norm(col("qv")))
      .withColumn("qq", Vectors.dot(col("qv"), col("qv")))
    val probed = AnnPack.kmProbe(q, cent, nprobe)
    // the probed cell set is metadata-scale (≤ nprobe · |queries|,
    // deduped to ≤ k cells) — collecting it turns the postings scan
    // into a statically partition-pruned read of only those cells
    val cells = probed.select(col("cell")).distinct()
      .collect().map(_.getLong(0))
    // partition-column type inference may narrow cell to int on read;
    // compare in long so the probe literals always line up (the cast is
    // evaluable over partition values, so pruning stays static)
    val lists = spark.read.parquet(s"$path/lists")
      .filter(col("cell").cast("long").isin(cells: _*))
      .withColumn("cell", col("cell").cast("long"))
      // a crash-replayed append duplicates postings rows (same vec_id,
      // same cell — routing is deterministic); without this dedupe a
      // duplicated vector occupies TWO ranks of the result (the defect
      // the PqStore spec planted and caught in its own search; the
      // duplicate rows are byte-identical, so which survives is
      // immaterial)
      .dropDuplicates("vec_id")
    val pairs = lists.join(broadcast(probed), Seq("cell"))
      .withColumn("cos_sim",
        Vectors.cosine(col("qv"), col("v"), col("qn"), col("nrm")))
      .select(col("query_id"), col("vec_id"), col("cell"), col("cos_sim"))
    AnnPack.topKPerQuery(pairs, k, Seq("cell"))
      .orderBy(col("query_id"), col("rank"))
  }
}
