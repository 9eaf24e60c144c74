package graft

import java.nio.file.Files

import graft.sources.{Bucketed, Tables}
import org.apache.spark.sql.functions._

class BucketedSpec extends GraftSpec {

  test("bucketed fact-fact join runs with zero shuffle exchanges") {
    val tmp = Files.createTempDirectory("graft-buckets").toString
    Bucketed.writeBucketed(
      Tables.lineitem(spark, sfDir).select("l_orderkey", "l_extendedprice"),
      "li_b", "l_orderkey", 8, s"$tmp/li")
    Bucketed.writeBucketed(
      Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"),
      "ord_b", "o_orderkey", 8, s"$tmp/ord")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join so the exchange-elision is what's tested
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("l_extendedprice")).as("v"))
      joined.collect()
      // AQE prints "== Final Plan ==" then "== Initial Plan =="; keep
      // only the final executed section for positional checks
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // the join itself must not shuffle; the only exchange allowed is
      // the final groupBy(o_custkey) aggregation exchange
      assert(plan.contains("SortMergeJoin"))
      // in the plan string, a node's children print after it — so no
      // "Exchange" may appear at or below the SortMergeJoin
      assert(plan.indexOf("Exchange", plan.indexOf("SortMergeJoin")) == -1,
        s"unexpected exchange below the join:\n$plan")
      // stronger check: scanning both bucketed tables reports buckets
      assert(plan.contains("SelectedBucketsCount") ||
        plan.contains("Bucketed: true"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("single-writer lease: a second writer refuses loudly; the lease releases on exit") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-lease").toString
    Bucketed.writeBucketed(
      (1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"),
      "lease_t", "k", 4, s"$tmp/store")
    try {
      val add = Seq((21L, "new")).toDF("k", "v")
      def lock = new java.io.File(s"$tmp/store__lock")
      // a concurrent writer holds the lease (the marker an in-flight
      // append or compaction creates): both mutation paths must refuse
      // with the recovery instructions, not corrupt silently
      assert(lock.createNewFile())
      val e1 = intercept[java.util.ConcurrentModificationException] {
        Bucketed.appendBucketed(spark, add, "lease_t")
      }
      assert(e1.getMessage.contains("single-writer") &&
        e1.getMessage.contains("store__lock"), e1.getMessage)
      intercept[java.util.ConcurrentModificationException] {
        Bucketed.compactBucketed(spark, "lease_t")
      }
      // the refused append must not have landed rows
      assert(spark.table("lease_t").count() == 20)
      // dead-writer recovery: delete the marker, writes proceed — and
      // each releases the lease on exit so the next writer can run
      assert(lock.delete())
      Bucketed.appendBucketed(spark, add, "lease_t")
      assert(!lock.exists, "lease not released after a successful append")
      Bucketed.compactBucketed(spark, "lease_t")
      assert(!lock.exists, "lease not released after a compaction")
      assert(spark.table("lease_t").count() == 21)
      // the marker is generation-STABLE: after the compaction moved the
      // table location to a __g1 sibling, the same marker still excludes
      assert(lock.createNewFile())
      intercept[java.util.ConcurrentModificationException] {
        Bucketed.appendBucketed(spark, add, "lease_t")
      }
      assert(lock.delete())
      // a FAILING body (schema mismatch) must still release the lease
      intercept[Exception] {
        Bucketed.appendBucketed(spark,
          Seq((1, 2, 3)).toDF("x", "y", "z"), "lease_t")
      }
      assert(!lock.exists, "lease leaked after a failed append")
    } finally spark.sql("DROP TABLE IF EXISTS lease_t")
  }

  test("single-writer lease: a verifiably-dead same-host holder is broken automatically; a live one refuses") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-lease-dead").toString
    Bucketed.writeBucketed(
      (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"),
      "lease_dead", "k", 4, s"$tmp/store")
    try {
      val add = Seq((11L, "new")).toDF("k", "v")
      val lock = new java.io.File(s"$tmp/store__lock")
      val host = java.net.InetAddress.getLocalHost.getHostName
      def plant(pid: Long): Unit = {
        val w = new java.io.FileWriter(lock)
        try w.write(s"pid=$pid host=$host at=spec") finally w.close()
      }
      // a marker naming a same-host pid that verifiably does not exist
      // (a crashed writer): acquisition must break it and proceed — a
      // killed build must not wedge every later writer of the store
      var dead = 99999L
      while (ProcessHandle.of(dead).isPresent) dead += 1
      plant(dead)
      Bucketed.appendBucketed(spark, add, "lease_dead")
      assert(!lock.exists, "broken lease not released after the append")
      assert(spark.table("lease_dead").count() == 11)
      // a marker naming a LIVE same-host pid (this JVM): still refuses —
      // liveness, not age, is the break criterion
      plant(ProcessHandle.current().pid())
      intercept[java.util.ConcurrentModificationException] {
        Bucketed.appendBucketed(spark, add, "lease_dead")
      }
      // SPARK_GRAFT_LEASE_AUTOBREAK=0 (cloned-hostname fleets, where
      // local pid absence is not evidence of death): even a verifiably
      // -dead same-host marker refuses
      plant(dead)
      sys.props("SPARK_GRAFT_LEASE_AUTOBREAK") = "0"
      try intercept[java.util.ConcurrentModificationException] {
        Bucketed.appendBucketed(spark, add, "lease_dead")
      } finally sys.props.remove("SPARK_GRAFT_LEASE_AUTOBREAK")
      assert(lock.delete())
    } finally spark.sql("DROP TABLE IF EXISTS lease_dead")
  }

  test("single-writer lease: a store REBUILD under a foreign lease refuses too, and releases its own on exit") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-lease-rw").toString
    val df = (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v")
    try {
      // the overwrite path is a mutation like append/compact: a rebuild
      // racing an in-flight writer of the same location must refuse,
      // not delete files under the holder's scan
      val lock = new java.io.File(s"$tmp/store__lock")
      assert(new java.io.File(tmp).isDirectory || new java.io.File(tmp).mkdirs())
      assert(lock.createNewFile())
      val e = intercept[java.util.ConcurrentModificationException] {
        Bucketed.writeBucketed(df, "lease_rw", "k", 4, s"$tmp/store")
      }
      assert(e.getMessage.contains("single-writer"), e.getMessage)
      assert(!spark.catalog.tableExists("lease_rw"),
        "refused rebuild must not have registered the table")
      assert(lock.delete())
      Bucketed.writeBucketed(df, "lease_rw", "k", 4, s"$tmp/store")
      assert(!lock.exists, "lease not released after a rebuild")
      assert(spark.table("lease_rw").count() == 10)
    } finally spark.sql("DROP TABLE IF EXISTS lease_rw")
  }

  test("q3_bucketed registry query joins the store with zero exchanges") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // kill auto-broadcast so the fact-fact join stays sort-merge; the
      // dimension side keeps its explicit broadcast hint
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = SparkEntry.queries("q3_bucketed")(spark, sfDir)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("SortMergeJoin"), plan)
      // both fact scans are bucketed on the join key, whose column also
      // leads the groupBy — the whole plan runs without ANY shuffle
      assert(!plan.contains("Exchange") || plan.contains("BroadcastExchange")
        && !plan.replace("BroadcastExchange", "").contains("Exchange"),
        s"unexpected shuffle exchange:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
