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
  * O(distinct keys). Passing `idleTimeout` (e.g. "30 minutes") ages a
  * key out of the store after that long without arrivals — a REAL
  * processing-time timeout (setTimeoutDuration + hasTimedOut →
  * remove), so a months-long stream holds state only for keys active
  * within the horizon. Works identically on batch Datasets (Spark
  * executes the same function with empty state and no timeouts), which
  * is what the spec exploits for batch/stream equivalence checks.
  */
object StreamingDedup {

  final case class Fingerprinted(doc_id: Long, fingerprint: String)

  private[streaming] def timeoutConf(idleTimeout: Option[String]): GroupStateTimeout =
    if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout

  /** Generic first-occurrence-by-key: keeps the first element seen per
    * key across the stream's lifetime (and within each micro-batch),
    * or within `idleTimeout` of the key's last arrival.
    */
  def firstOccurrence[T](ds: Dataset[T], key: T => String,
      idleTimeout: Option[String] = None)(
      implicit enc: Encoder[T]): Dataset[T] =
    ds.groupByKey(key)(Encoders.STRING)
      .flatMapGroupsWithState[Boolean, T](OutputMode.Append(),
        timeoutConf(idleTimeout)) {
        (_: String, it: Iterator[T], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out =
              if (state.exists) Iterator.empty
              else { state.update(true); it.take(1) }
            idleTimeout.foreach(state.setTimeoutDuration)
            out
          }
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
    * size is O(distinct keys × row size); `idleTimeout` ages out keys
    * idle beyond the horizon, same parameterization as
    * [[firstOccurrence]].
    */
  def latestPerKey[T](ds: Dataset[T], key: T => String,
      order: T => (Long, Long),
      idleTimeout: Option[String] = None)(
      implicit enc: Encoder[T]): Dataset[T] =
    ds.groupByKey(key)(Encoders.STRING)
      .flatMapGroupsWithState[T, T](OutputMode.Update(),
        timeoutConf(idleTimeout)) {
        (_: String, it: Iterator[T], state: GroupState[T]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val incoming = it.maxBy(order)
            val best = state.getOption match {
              case Some(prev) if Ordering[(Long, Long)]
                .gteq(order(prev), order(incoming)) => prev
              case _ => incoming
            }
            state.update(best)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single(best)
          }
      }(enc, enc)
}
