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
