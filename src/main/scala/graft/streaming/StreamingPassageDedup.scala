package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** Streaming passage-level dedup — the streaming counterpart of C8's
  * batch `passage_dedup` (operators/DedupPack.scala passageDedupOver),
  * stateful first-occurrence election via flatMapGroupsWithState keyed
  * by the chunk hash.
  *
  * Incoming documents are chunked with EXACTLY the batch arithmetic
  * ([[graft.operators.DedupPack.passageChunksRaw]]: 32-word passages,
  * md5 chunk hash, (doc_id, idx) occurrence key), then every chunk
  * occurrence is routed to its hash's state group. The first occurrence
  * of a chunk hash in stream-arrival order is kept; every later
  * occurrence is emitted with `kept = false`, so a downstream sink can
  * reassemble cleaned documents (all of a document's chunk decisions
  * land in the same micro-batch its text arrived in). Where the batch
  * operator's winner is the global smallest (doc_id, idx), the stream's
  * winner is the earliest ARRIVAL — the natural streaming semantics
  * (an earlier micro-batch always beats a later one; within one
  * micro-batch the group's iteration order decides).
  *
  * Scale shape: state per chunk hash is ONE boolean — O(distinct
  * passages), the same footprint class as StreamingDedup — and the
  * grouping shards the election across the cluster by hash. The group
  * function is a LAZY one-pass map over the occurrence iterator (O(1)
  * memory however hot the passage — a boilerplate chunk occurring a
  * million times in one micro-batch never buffers; deliberately NOT a
  * buffer-and-sort, which would be the hot-key blowup this repo
  * eliminates everywhere else). `idleTimeout` ages hashes idle beyond
  * the horizon out of the store (real processing-time timeout, the
  * shared StreamingDedup parameterization); within the horizon the
  * election is exact, beyond it a re-arriving passage is treated as
  * new — the deliberate recall/state trade every long-running
  * streaming dedup makes.
  */
object StreamingPassageDedup {

  final case class ChunkDecision(doc_id: Long, idx: Long, chunk: String,
      h: String, kept: Boolean)

  /** documents-shaped stream (doc_id, text) → one decision per chunk
    * occurrence, first arrival per chunk hash kept.
    */
  def keepFirstChunks(docs: DataFrame,
      idleTimeout: Option[String] = None): Dataset[ChunkDecision] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = graft.operators.DedupPack.passageChunksRaw(docs)
      .select("doc_id", "idx", "chunk", "h")
      .as[(Long, Long, String, String)]
    chunks.groupByKey(_._4)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, ChunkDecision](OutputMode.Append(),
        StreamingDedup.timeoutConf(idleTimeout)) {
        (h: String, it: Iterator[(Long, Long, String, String)],
            state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var first = !state.exists
            state.update(true)
            idleTimeout.foreach(state.setTimeoutDuration)
            it.map { case (d, i, c, hh) =>
              val kept = first; first = false
              ChunkDecision(d, i, c, hh, kept)
            }
          }
      }(Encoders.scalaBoolean, Encoders.product[ChunkDecision])
  }
}
