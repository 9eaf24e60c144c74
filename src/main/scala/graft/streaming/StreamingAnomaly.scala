package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming anomaly detection — the alerting half of the reference's
  * real-time monitoring purpose (the dashboard's Timestream queries
  * exist to spot deviations; this operator emits them continuously).
  *
  * Semantics: per key, each arriving time-bin is z-scored against the
  * running moments of all PRIOR bins (prior-only, so an anomaly cannot
  * suppress itself by inflating the baseline it is judged against —
  * deliberately different from batch ts_anomaly's full-window moments,
  * which need the whole period in hand). State per key is three
  * numbers (n, Σx, Σx²): O(keys) total, constant per event — this runs
  * for months without state growth; pair with an event-time timeout to
  * age out dead keys.
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
  final case class Moments(n: Long, sum: Double, sumsq: Double)

  /** Flag bins whose |z| vs the prior-bin baseline clears `zThreshold`,
    * once at least `minPrior` bins have been seen for the key. Bins are
    * processed in bin_start order within each micro-batch, so any
    * time-ordered chunking of the same bins yields identical output.
    */
  def detect(bins: Dataset[Bin], zThreshold: Double = 2.0,
      minPrior: Long = 5,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout): Dataset[Anomaly] = {
    val spark = bins.sparkSession
    import spark.implicits._
    bins.groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState[Moments, Anomaly](
        OutputMode.Append(), timeout) {
        (key: String, it: Iterator[Bin], state: GroupState[Moments]) =>
          var st = state.getOption.getOrElse(Moments(0L, 0.0, 0.0))
          val out = List.newBuilder[Anomaly]
          it.toSeq.sortBy(_.bin_start).foreach { b =>
            if (st.n >= minPrior) {
              val mean = st.sum / st.n
              val variance = st.sumsq / st.n - mean * mean
              if (variance > 0) {
                val z = (b.x - mean) / math.sqrt(variance)
                if (math.abs(z) >= zThreshold)
                  out += Anomaly(key, b.bin_start, b.x,
                    math.floor(z * 1e6).toLong, st.n)
              }
            }
            st = Moments(st.n + 1, st.sum + b.x, st.sumsq + b.x * b.x)
          }
          state.update(st)
          out.result().iterator
      }(implicitly, implicitly)
  }
}
