package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends GraftSpec {

  test("TopKPerKey matches window row_number on orders per customer") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val got = TopKPerKey(orders,
        keys = Seq(col("o_custkey")),
        order = Seq(col("o_totalprice").desc, col("o_orderkey")),
        k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val want = orders.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }

  test("TopKPerKey emits best-first within each key") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val rows = TopKPerKey(orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc, col("o_orderkey")), 3).collect()
    rows.groupBy(_.getLong(0)).values.foreach { ks =>
      // rows arrive grouped per key; within a key prices non-increasing
      val prices = ks.map(_.getDouble(2)).toSeq
      assert(prices == prices.sorted.reverse)
      assert(ks.length <= 3)
    }
  }

  test("planned tree contains partial and final TopKPerKeyExec + one exchange") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val df = TopKPerKey(orders, Seq(col("o_custkey")),
      Seq(col("o_totalprice").desc), 2)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert("TopKPerKey \\d".r.findAllIn(plan).length >= 2, plan)
    assert(plan.contains("Exchange"), plan)
  }
}
