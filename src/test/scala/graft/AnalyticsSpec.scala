package graft

import graft.operators.Analytics

class AnalyticsSpec extends GraftSpec {

  for (q <- Analytics.queries) {
    test(s"${q.name} runs and returns rows at sf0.001") {
      val df = q.fn(spark, sfDir)
      assert(df.count() > 0)
    }
  }

  test("q1_agg aggregates are exact over known subset") {
    import org.apache.spark.sql.functions._
    val df = Analytics.queries.find(_.name == "q1_agg").get.fn(spark, sfDir)
    val row = df.filter(col("l_returnflag") === "A" && col("l_linestatus") === "F")
      .collect().headOption
    assert(row.nonEmpty, "expected (A, F) group present")
    val r = row.get
    // count_order must equal the raw filter count
    val expected = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")) &&
        col("l_returnflag") === "A" && col("l_linestatus") === "F")
      .count()
    assert(r.getAs[Long]("count_order") == expected)
  }

  test("q_topk is deterministically ordered") {
    val rows = Analytics.queries.find(_.name == "q_topk").get.fn(spark, sfDir)
      .collect()
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
    assert(rows.length == 20)
  }

  test("salted aggregation equals the direct aggregation") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sfDir)
    val salted = graft.functions.Skew.saltedSumCount(
        ev, col("event_type"), col("value").cast("decimal(18,2)"),
        col("event_id"), salts = 16)
      .withColumn("sum_value", col("sum_value").cast("double"))
    val direct = ev.groupBy(col("event_type").as("key"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double")
        .as("sum_value"), count(lit(1)).as("n"))
    assert(salted.orderBy("key").collect().toSeq ==
      direct.orderBy("key").collect().toSeq)
    // phase 1 really fans each key out across salts
    val fan = ev.groupBy(col("event_type"),
      pmod(graft.functions.Portable.hash60(col("event_id").cast("string")),
        lit(16L))).count()
    assert(fan.count() > direct.count())
  }
}
