package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** §5 scale lever: Spark's runtime Bloom-filter injection — a selective
  * filter on one join side materializes a Bloom filter that row-filters
  * the other side's scan BEFORE the shuffle. Pure configuration; this
  * spec pins that our join shapes are eligible and results unchanged.
  */
class RuntimeFilterSpec extends GraftSpec {

  test("runtime bloom filter injects into a selective fact-fact join") {
    val conf = spark.conf
    val prev = conf.get("spark.sql.optimizer.runtimeFilter.bloomFilter.enabled", "false")
    conf.set("spark.sql.optimizer.runtimeFilter.bloomFilter.enabled", "true")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    // disable broadcast so the join is shuffle-based (runtime filters
    // target big-big joins; broadcast joins prune inherently)
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.lineitem(spark, sfDir)
      val ord = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_totalprice") > 200000)
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter in:\n${plan.take(2000)}")
      // and the filter is semantics-preserving
      conf.set("spark.sql.optimizer.runtimeFilter.bloomFilter.enabled", "false")
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .collect().toSeq
      conf.set("spark.sql.optimizer.runtimeFilter.bloomFilter.enabled", "true")
      assert(j.collect().toSeq == expected)
    } finally {
      conf.set("spark.sql.optimizer.runtimeFilter.bloomFilter.enabled", prev)
      conf.unset("spark.sql.autoBroadcastJoinThreshold")
      conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
