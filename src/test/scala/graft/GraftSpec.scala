package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for specs: one local SparkSession per suite. */
abstract class GraftSpec extends AnyFunSuite {
  val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = GraftSpec.session
}

object GraftSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // build.sbt's parallel test groups put 6 such sessions on the
      // box at once; a co-tenant stall that starves the local
      // executor's heartbeat for >120 s must not kill a whole group's
      // JVM (measured: one group died exactly that way on a contended
      // host — "no recent heartbeats: 130102 ms exceeds 120000 ms")
      .config("spark.network.timeout", "600s")
      // every action renders its plan into the SQLExecution listener
      // event, capped only by this conf's ~2 GB default — the deep
      // iterative cell-build plans render hundreds of MB of throwaway
      // string per action (UI is off!), which both burns driver time
      // and OOM'd AnnPackSpec's group at 16 g inside
      // QueryExecution.explainString. Truncation only affects debug
      // strings, never results.
      .config("spark.sql.maxPlanStringLength", (16 * 1024 * 1024).toString)
      // the Bench session's floor (see Bench.scala): AQE's BYTES-based
      // partition coalescing collapses compute-dense, byte-light
      // shuffle stages (candidate-pair verification over planted
      // vector corpora) to ONE partition — the AnnPackSpec mass test
      // ran 26+ min single-threaded under the default
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "64KB")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
