package org.apache.spark

/** Bridge into the `spark` package for the benchmark harness
  * (listenerBus is private[spark]) — the same pattern as
  * [[org.apache.spark.sql.GraftColumnBridge]].
  */
object GraftSparkBridge {
  /** Drain the async listener bus so per-query task-metric attribution
    * can't bleed a query's trailing TaskEnd events into the next
    * query's bucket. Best-effort: a timeout just leaves a few tasks
    * attributed late, it never fails the bench.
    */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Exception => () }
}
