package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, OutputMode}

/** Streaming anomaly detection — the alerting half of the reference's
  * real-time monitoring purpose (the dashboard's Timestream queries
  * exist to spot deviations; this operator emits them continuously).
  *
  * Semantics: per key, each arriving time-bin is z-scored against the
  * running moments of all PRIOR bins (prior-only, so an anomaly cannot
  * suppress itself by inflating the baseline it is judged against —
  * deliberately different from batch ts_anomaly's full-window moments,
  * which need the whole period in hand). State per key is three
  * numbers (Welford n/mean/M2): O(keys) total, constant per event —
  * this runs for months without state growth; `idleTimeout` ages out
  * keys idle beyond the horizon (a real processing-time timeout).
  *
  * Topology: the input is an already-binned stream — in the CloudFront
  * pipeline, the (measure_name, day)-partitioned store's hourly rollup,
  * i.e. the standard two-job layout (ingest→store, store→alert) that
  * avoids chaining a windowed aggregation into a stateful map in one
  * query. Batch Datasets run the identical code path (empty state, all
  * bins in one sorted group pass), which the spec uses for
  * chunking-invariance.
  */
object StreamingAnomaly {

  final case class Bin(key: String, bin_start: Long, x: Double)
  final case class Anomaly(key: String, bin_start: Long, x: Double,
      z_ppm: Long, n_prior: Long)
  /** Welford running moments: mean + centered M2, NOT sum/sumsq — at
    * bytes-scale magnitudes (x ~ 1e9) sumsq/n − mean² cancels
    * catastrophically (both terms ~1e18, difference below one ulp) and
    * would silently disable detection; the centered recurrence keeps
    * full precision at any magnitude.
    */
  final case class Moments(n: Long, mean: Double, m2: Double)

  /** Flag bins whose |z| vs the prior-bin baseline clears `zThreshold`,
    * once at least `minPrior` bins have been seen for the key. Bins are
    * processed in bin_start order within each micro-batch, so any
    * time-ordered chunking of the same bins yields identical output.
    */
  def detect(bins: Dataset[Bin], zThreshold: Double = 2.0,
      minPrior: Long = 5,
      idleTimeout: Option[String] = None): Dataset[Anomaly] = {
    val spark = bins.sparkSession
    import spark.implicits._
    bins.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[Moments, Anomaly](
        OutputMode.Append(), StreamingDedup.timeoutConf(idleTimeout)) {
        (key: String, it: Iterator[Bin], state: GroupState[Moments]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
          var st = state.getOption.getOrElse(Moments(0L, 0.0, 0.0))
          val out = List.newBuilder[Anomaly]
          it.toSeq.sortBy(_.bin_start).foreach { b =>
            if (st.n >= minPrior) {
              val variance = st.m2 / st.n
              if (variance > 0) {
                val z = (b.x - st.mean) / math.sqrt(variance)
                if (math.abs(z) >= zThreshold)
                  out += Anomaly(key, b.bin_start, b.x,
                    math.floor(z * 1e6).toLong, st.n)
              }
            }
            val n1 = st.n + 1
            val delta = b.x - st.mean
            val mean1 = st.mean + delta / n1
            st = Moments(n1, mean1, st.m2 + delta * (b.x - mean1))
          }
          state.update(st)
          idleTimeout.foreach(state.setTimeoutDuration)
          out.result().iterator
          }
      }(implicitly, implicitly)
  }
}
