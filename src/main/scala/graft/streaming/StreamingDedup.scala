package graft.streaming

import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming first-occurrence deduplication (SURVEY.md A9/§4 custom
  * state via flatMapGroupsWithState; the streaming counterpart of C1's
  * batch exact dedup).
  *
  * State per fingerprint is a single boolean, so the state store grows
  * O(distinct keys) — at production scale the key would carry an
  * event-time timeout (`GroupStateTimeout.EventTimeTimeout` + watermark)
  * to age out fingerprints beyond the dedup horizon; the operator takes
  * the timeout as a parameter so both modes are the same code path.
  * Works identically on batch Datasets (Spark executes the same
  * function with empty state), which is what the spec exploits for
  * batch/stream equivalence checks.
  */
object StreamingDedup {

  final case class Fingerprinted(doc_id: Long, fingerprint: String)

  /** Generic first-occurrence-by-key: keeps the first element seen per
    * key across the stream's lifetime (and within each micro-batch).
    */
  def firstOccurrence[T](ds: Dataset[T], key: T => String,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
      implicit enc: Encoder[T]): Dataset[T] =
    ds.groupByKey(key)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, T](OutputMode.Append(), timeout) {
        (_: String, it: Iterator[T], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); it.take(1) }
      }(Encoders.scalaBoolean, enc)

  /** documents-shaped stream (doc_id, text, ...) → first occurrence per
    * normalized-text md5 fingerprint.
    */
  def dedupDocuments(docs: DataFrame): Dataset[Fingerprinted] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fp = docs.select(col("doc_id").cast("long").as("doc_id"),
        md5(Portable.normText(col("text"))).as("fingerprint"))
      .as[Fingerprinted]
    firstOccurrence[Fingerprinted](fp, _.fingerprint)
  }

  /** Streaming latest-per-key (the stream counterpart of q_latest's SCD
    * snapshot): state per key is ONE element — the max-by-`order` row
    * seen so far — emitted whenever it changes (Update mode). State
    * size is O(distinct keys × row size); with an event-time timeout
    * the key set itself ages out, same parameterization as
    * [[firstOccurrence]].
    */
  def latestPerKey[T](ds: Dataset[T], key: T => String,
      order: T => (Long, Long),
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)(
      implicit enc: Encoder[T]): Dataset[T] =
    ds.groupByKey(key)(Encoders.STRING)
      .mapGroupsWithState[T, T](timeout) {
        (_: String, it: Iterator[T], state: GroupState[T]) =>
          val incoming = it.maxBy(order)
          val best = state.getOption match {
            case Some(prev) if Ordering[(Long, Long)]
              .gteq(order(prev), order(incoming)) => prev
            case _ => incoming
          }
          state.update(best)
          best
      }
}
