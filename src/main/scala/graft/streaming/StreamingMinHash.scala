package graft.streaming

import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** Streaming MinHash/LSH near-duplicate detection — the streaming
  * counterpart of C2's batch dedup (operators/DedupPack.scala
  * minhashPairs), stateful LSH banding via flatMapGroupsWithState keyed
  * by (band, bucket-key).
  *
  * Each incoming document is shingled and minhash-signed with EXACTLY
  * the batch arithmetic (Portable.shingles3Hashed; the MinHashAgg
  * affine family, expressions/MinHashAgg.scala:49) and fanned out to
  * its numBands (band, key) rows. Grouping on the bucket key gives the
  * batch pipeline's core scale property for free: candidates are
  * generated only inside buckets, never all-pairs, and state is sharded
  * across the cluster by bucket.
  *
  * A true pair collides in every shared band. To emit it exactly once
  * WITHOUT a downstream distinct (a second stateful operator), the
  * bucket whose band index is the pair's smallest shared band claims
  * it: both full signatures are in hand, so each bucket computes the
  * shared-band set locally and emits only when it owns the minimum —
  * no cross-group coordination, and n_shared_bands matches the batch
  * count exactly.
  *
  * State per bucket is the member list (doc_id, signature, shingles),
  * HARD-CAPPED at `maxPerBucket`: a bucket at the cap stops ADMITTING
  * members but still compares arrivals against the stored ones. This
  * bounds every bucket's state and per-arrival work by a constant —
  * the same O(cap) discipline as the batch side's BoundedCollectList.
  * Precise cap-loss semantics: an arrival is still FLAGGED against any
  * capped bucket's residents, but a specific pair (m, f) is lost when
  * the pair's minimum shared band's bucket was already full when the
  * earlier member arrived — the emitting bucket cannot know m's
  * residency elsewhere (admission happens independently per bucket),
  * so a higher shared band cannot safely claim the pair without
  * duplicating the uncapped common case. Buckets that hot are
  * near-identical clusters whose members interlink through the
  * residents anyway (the clustering step closes over those links).
  * `idleTimeout` ages idle buckets out of the store entirely (a real
  * processing-time timeout, same parameterization as StreamingDedup).
  */
object StreamingMinHash {

  /** Batch-identical LSH geometry (DedupPack.scala:37-39). */
  val numHashes = 64
  val numBands = 32
  val tau = 0.8

  private val P = Portable.P

  final case class DocFeat(doc_id: Long, band: Int, key: String,
      sig: Array[Long], shingles: Array[Long])
  final case class DupPair(doc_a: Long, doc_b: Long,
      n_shared_bands: Long, jaccard: Double)

  /** MinHash signature of a hashed-shingle set: element-wise min of the
    * affine family `(2i+1)·h + (i·40503+13 mod P) mod P` — the same
    * arithmetic MinHashAgg aggregates in batch, evaluated per row here
    * because a stream row carries its whole shingle set already.
    */
  def signature(shingles: Array[Long]): Array[Long] = {
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < shingles.length) {
      val h = shingles(j)
      var i = 0
      while (i < numHashes) {
        val m = ((2L * i + 1L) * h + (i.toLong * 40503L + 13L) % P) % P
        if (m < sig(i)) sig(i) = m
        i += 1
      }
      j += 1
    }
    sig
  }

  /** 2-row band key, identical to the batch concat_ws formulation. */
  def bandKey(sig: Array[Long], b: Int): String =
    s"${sig(2 * b)},${sig(2 * b + 1)}"

  /** Exact Jaccard over two distinct-element shingle arrays, rounded
    * like the batch jaccard column (Spark round = HALF_UP to 6).
    */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    val sa = a.toSet
    var inter = 0
    var i = 0
    while (i < b.length) { if (sa.contains(b(i))) inter += 1; i += 1 }
    java.math.BigDecimal.valueOf(inter.toDouble / (a.length + b.length - inter))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** documents-shaped input (doc_id, text, ...) → one row per (doc,
    * band) carrying the bucket key, signature, and shingles. The
    * shingling itself is the batch Catalyst expression; only the
    * per-row signature fold is typed Scala.
    */
  def features(docs: DataFrame): Dataset[DocFeat] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long").as("doc_id"),
        Portable.words(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), Portable.shingles3Hashed(col("w")).as("sh"))
      .as[(Long, Array[Long])]
      .flatMap { case (id, sh) =>
        val sig = signature(sh)
        (0 until numBands).iterator
          .map(b => DocFeat(id, b, bandKey(sig, b), sig, sh))
      }
  }

  /** Verified near-duplicate pairs, emitted as documents arrive. Works
    * identically on a batch DataFrame (empty state, all docs in one
    * group iterator) — the spec's batch/stream equivalence lever.
    */
  def dupPairs(docs: DataFrame,
      idleTimeout: Option[String] = None,
      maxPerBucket: Int = 64): Dataset[DupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    features(docs)
      .groupByKey(f => s"${f.band}:${f.key}")(Encoders.STRING)
      .flatMapGroupsWithState[List[DocFeat], DupPair](
        OutputMode.Append(), StreamingDedup.timeoutConf(idleTimeout)) {
        (_: String, it: Iterator[DocFeat], state: GroupState[List[DocFeat]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          var members = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[DupPair]
          // doc_id order within the batch: arrival order inside a
          // micro-batch is not meaningful, and a deterministic order
          // makes batch == stream-of-any-chunking
          it.toSeq.sortBy(_.doc_id).foreach { f =>
            members.foreach { m =>
              if (m.doc_id != f.doc_id) {
                var shared = 0
                var minBand = -1
                var b = 0
                while (b < numBands) {
                  if (bandKey(m.sig, b) == bandKey(f.sig, b)) {
                    shared += 1
                    if (minBand < 0) minBand = b
                  }
                  b += 1
                }
                // the smallest shared band's bucket owns the pair
                if (minBand == f.band) {
                  val j = jaccard(m.shingles, f.shingles)
                  if (j >= tau)
                    out += DupPair(math.min(m.doc_id, f.doc_id),
                      math.max(m.doc_id, f.doc_id), shared.toLong, j)
                }
              }
            }
            if (members.length < maxPerBucket) members = f :: members
          }
          state.update(members)
          idleTimeout.foreach(state.setTimeoutDuration)
          out.result().iterator
          }
      }(implicitly, implicitly)
  }
}
