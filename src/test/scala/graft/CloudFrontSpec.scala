package graft

import graft.cloudfront.CloudFrontLogs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CloudFrontSpec extends GraftSpec {
  import spark.implicits._

  // One realistic line, mirroring the reference's test.json event (40
  // fields, mapping order, '-' for absent values).
  private val sampleLine = Seq(
    "1602646738.145", "1.2.3.4", "0.002", "200", "16653", "GET", "https",
    "somehost123.cloudfront.net", "/image.jpg", "59", "IAD66-C1",
    "boNb1al7B50G5T7jXDOGi2zlYAF2VWrba2fnZWfuc_UA==",
    "somehost123.cloudfront.net", "0.002", "HTTP/2.0", "IPv4",
    "curl/7.53.1", "-", "-", "-", "Hit", "-", "TLSv1.2",
    "ECDHE-RSA-AES128-GCM-SHA256", "Hit", "-", "-", "image/jpeg", "16335",
    "-", "-", "50226", "Hit", "US", "gzip", "*/*", "*",
    "Host:somehost123.cloudfront.net%0AUser-Agent:curl%2F7.53.1",
    "Host%0AUser-Agent", "2").mkString("\t")

  test("parse maps all 40 fields with types; '-' becomes NULL") {
    val df = CloudFrontLogs.parse(Seq(sampleLine).toDF("line"),
      dropHeaders = false)
    assert(df.columns.length == 40)
    val r = df.collect()(0)
    assert(r.getAs[Double]("timestamp") == 1602646738.145)
    assert(r.getAs[Int]("sc_status") == 200)
    assert(r.getAs[Long]("sc_bytes") == 16653L)
    assert(r.getAs[Double]("time_taken") == 0.002)
    assert(r.getAs[String]("c_ip") == "1.2.3.4")
    assert(r.getAs[String]("x_edge_location") == "IAD66-C1")
    assert(r.isNullAt(r.fieldIndex("cs_referer")))
    assert(r.isNullAt(r.fieldIndex("sc_range_start")))
    assert(r.getAs[Int]("cs_headers_count") == 2)
    val schema = df.schema
    assert(schema("sc_bytes").dataType == LongType)
    assert(schema("time_to_first_byte").dataType == DoubleType)
    assert(schema("c_port").dataType == IntegerType)
  }

  test("loadFieldMappings round-trips the reference's own config file") {
    val refConfig = sys.env.getOrElse("GRAFT_REFERENCE_CONFIG",
      "/root/reference/log-processor/config/cf_realtime_log_field_mappings.json")
    // skip (not fail) on checkouts without the reference repo
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(refConfig)))
    val loaded = CloudFrontLogs.loadFieldMappings(refConfig)
    // the reference config reproduces the built-in table exactly —
    // names, order, and types
    assert(loaded == CloudFrontLogs.fieldMappings)
    // and a parse driven by the loaded mapping behaves identically
    val df = CloudFrontLogs.parse(Seq(sampleLine).toDF("line"),
      dropHeaders = false, mappings = loaded)
    val builtin = CloudFrontLogs.parse(Seq(sampleLine).toDF("line"),
      dropHeaders = false)
    assert(df.schema == builtin.schema)
    assert(df.collect().toSeq == builtin.collect().toSeq)
  }

  test("loadFieldMappings rejects malformed config") {
    val tmp = java.nio.file.Files.createTempFile("graft-badmap", ".json")
    java.nio.file.Files.write(tmp,
      """{"cf_realtime_log_fields": {"a": "decimal"}}""".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      CloudFrontLogs.loadFieldMappings(tmp.toString)
    }
    val tmp2 = java.nio.file.Files.createTempFile("graft-badmap2", ".json")
    java.nio.file.Files.write(tmp2, """{"other": 1}""".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      CloudFrontLogs.loadFieldMappings(tmp2.toString)
    }
  }

  test("fromBinaryRecords decodes connector-shaped byte payloads") {
    val df = CloudFrontLogs.fromBinaryRecords(
      Seq(Tuple1(sampleLine.getBytes("UTF-8"))).toDF("data"))
    assert(df.select("line").as[String].collect()(0) == sampleLine)
  }

  test("readKinesisStream is a compile-complete seam: fails only on the missing connector") {
    val e = intercept[Exception] {
      CloudFrontLogs.readKinesisStream(spark, "log-stream", "us-east-1")
    }
    // the adapter must get as far as source resolution — any earlier
    // failure means the wiring itself broke
    assert(e.getMessage.toLowerCase.contains("kinesis"), e.getMessage)
  }

  test("parse drops header fields by default, like the reference") {
    val df = CloudFrontLogs.parse(Seq(sampleLine).toDF("line"))
    assert(df.columns.length == 38)
    assert(!df.columns.contains("cs_headers"))
    assert(!df.columns.contains("cs_header_names"))
  }

  test("parseHeaders decodes and splits name:value pairs") {
    val df = CloudFrontLogs.parse(Seq(sampleLine).toDF("line"),
        dropHeaders = false)
      .select(CloudFrontLogs.parseHeaders(col("cs_headers")).as("h"),
        CloudFrontLogs.parseHeaderNames(col("cs_header_names")).as("hn"))
    val r = df.collect()(0)
    val headers = r.getSeq[org.apache.spark.sql.Row](0)
    assert(headers.map(h => (h.getString(0), h.getString(1))) ==
      Seq(("Host", "somehost123.cloudfront.net"),
        ("User-Agent", "curl/7.53.1")))
    assert(r.getSeq[String](1) == Seq("Host", "User-Agent"))
  }

  test("toRecords melts to Timestream record shape") {
    val parsed = CloudFrontLogs.parse(Seq(sampleLine).toDF("line"))
    val rec = CloudFrontLogs.toRecords(parsed,
      measures = Seq("sc_bytes", "time_taken"),
      dimensions = Seq("x_edge_location", "c_country"))
    assert(rec.columns.toSeq ==
      Seq("time", "measure_name", "measure_value", "dimensions"))
    val rows = rec.orderBy("measure_name").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("measure_value") == 16653.0)
    assert(rows(0).getAs[Map[String, String]]("dimensions") ==
      Map("x_edge_location" -> "IAD66-C1", "c_country" -> "US"))
    // time truncated to whole seconds, like the reference's int(timestamp)
    assert(rows(0).getAs[java.time.LocalDateTime]("time").getNano == 0)
  }

  test("synthLines emits exactly 40 tab-separated fields") {
    val events = graft.sources.Tables.events(spark, sfDir)
    val n = graft.operators.CloudFrontPack.synthLines(events)
      .select(size(split(col("line"), "\t")).as("n")).distinct().collect()
    assert(n.map(_.getInt(0)).toSeq == Seq(40))
  }

  test("fromKinesisRecords base64-decodes payloads into parseable lines") {
    val b64 = java.util.Base64.getEncoder
      .encodeToString(sampleLine.getBytes("UTF-8"))
    val parsed = CloudFrontLogs.parse(
      CloudFrontLogs.fromKinesisRecords(Seq(b64).toDF("data")))
    val r = parsed.collect()(0)
    assert(r.getAs[Long]("sc_bytes") == 16653L)
    assert(r.getAs[String]("x_edge_location") == "IAD66-C1")
  }

  test("parse survives truncated and corrupt records with NULLs, not failures") {
    import spark.implicits._
    val lines = Seq(
      "1700000000.1\t1.2.3.4\t0.5", // 3 of 40 fields
      "", // empty line
      sampleLine.replace("16653", "not-a-number") // corrupt int field
    ).toDF("line")
    val rows = CloudFrontLogs.parse(lines).collect()
    assert(rows.length == 3)
    // truncated: present fields typed, absent fields NULL
    assert(rows(0).getAs[Double]("timestamp") == 1700000000.1)
    assert(rows(0).getAs[Any]("sc_status") == null)
    // corrupt numeric: that field NULL, neighbors intact
    val corrupt = rows(2)
    assert(corrupt.getAs[Any]("sc_bytes") == null)
    assert(corrupt.getAs[String]("x_edge_location") == "IAD66-C1")
  }

  test("fromKinesisEnvelopes unwraps lambda-trigger JSON to lines") {
    val b64 = java.util.Base64.getEncoder
      .encodeToString(sampleLine.getBytes("UTF-8"))
    val env =
      s"""{"Records":[{"kinesis":{"data":"$b64"}},{"kinesis":{"data":"$b64"}}]}"""
    val lines = CloudFrontLogs.fromKinesisEnvelopes(Seq(env).toDF("value"))
    assert(lines.count() == 2)
    val parsed = CloudFrontLogs.parse(lines).collect()
    assert(parsed.forall(_.getAs[Long]("sc_bytes") == 16653L))
  }

  test("readLogs round-trips a written log file through the parser") {
    val dir = java.nio.file.Files.createTempDirectory("graft-logs").toString
    val events = graft.sources.Tables.events(spark, sfDir)
    graft.operators.CloudFrontPack.synthLines(events)
      .coalesce(1).write.mode("overwrite").text(dir)
    val parsed = CloudFrontLogs.readLogs(spark, dir)
    assert(parsed.count() == events.count())
    assert(parsed.select(sum(col("sc_bytes"))).head().getLong(0) > 0)
  }

  test("parseHeaders drops entries without a colon, like the reference") {
    val raw = "Host:h1%0ANoColonHeader%0AX:1"
    val hs = Seq(raw).toDF("h")
      .select(CloudFrontLogs.parseHeaders(col("h")).as("p"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(hs.map(_.getString(0)) == Seq("Host", "X"))
  }

  test("toRecords default dimensions include every field (reference parity)") {
    val parsed = CloudFrontLogs.parse(Seq(sampleLine).toDF("line"))
    val rec = CloudFrontLogs.toRecords(parsed).collect()(0)
    val dims = rec.getAs[Map[String, String]]("dimensions")
    assert(dims.contains("sc_bytes") && dims.contains("timestamp"))
    assert(dims("cs_referer") == "-") // NULL surfaces as literal '-'
  }
}
