package graft

import graft.cloudfront.CloudFrontLogs
import graft.operators.CloudFrontPack
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The SQL face of the engine: a user coming from the reference's
  * Timestream console should be able to run the README query shape as
  * plain SQL over the melted records — graft functions registered,
  * bin() via graft_bin, ago() as a max-anchored subquery.
  */
class SqlSurfaceSpec extends GraftSpec {

  test("README headline query runs as pure SQL and matches the DataFrame plan") {
    graft.expressions.GraftFunctions.register(spark)
    val parsed = CloudFrontLogs.parse(
      CloudFrontPack.synthLines(Tables.events(spark, sfDir)))
    CloudFrontLogs.toRecords(parsed,
        measures = Seq("sc_bytes", "time_taken"),
        dimensions = Seq("x_edge_location"))
      .createOrReplaceTempView("records")
    val sqlResult = spark.sql("""
      SELECT graft_bin(time, 3600) AS binned_time,
        dimensions['x_edge_location'] AS x_edge_location,
        SUM(CASE WHEN measure_name = 'sc_bytes'
            THEN CAST(measure_value AS BIGINT) END) AS sum_bytes
      FROM records
      WHERE time >= (SELECT max(time) - INTERVAL 24 HOUR FROM records)
      GROUP BY 1, 2
      ORDER BY 1, 2""").collect()
    assert(sqlResult.nonEmpty)
    val df = SparkEntry.queries("q_timestream_headline")(spark, sfDir)
      .collect()
    assert(sqlResult.length == df.length)
    // same totals; column shapes differ (NTZ cast) but values align
    assert(sqlResult.map(_.getAs[Long]("sum_bytes")).sum ==
      df.map(_.getAs[Long]("sum_bytes_downloaded")).sum)
  }

  test("graft SQL functions compose: hash60 and bin over a view") {
    graft.expressions.GraftFunctions.register(spark)
    Tables.events(spark, sfDir).createOrReplaceTempView("ev")
    val r = spark.sql("""
      SELECT graft_bin(ts, 86400) AS day,
        count(DISTINCT graft_hash60(CAST(user_id AS STRING))) % 1000 AS h
      FROM ev GROUP BY 1 ORDER BY 1""").collect()
    assert(r.nonEmpty)
    // graft_bin floors to day boundaries
    r.foreach { row =>
      val t = row.getTimestamp(0).toInstant
      assert(t.getEpochSecond % 86400 == 0)
    }
  }

  test("graft_log2_q20 is SQL-callable and matches the JVM kernel") {
    graft.expressions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT id + 1 AS x, graft_log2_q20(id + 1) AS lg FROM range(100)")
      .collect()
    r.foreach { row =>
      assert(row.getLong(1) ==
        graft.expressions.Log2FixImpl.log2q20(row.getLong(0)))
    }
  }
}
