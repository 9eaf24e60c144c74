package graft.cloudfront

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CloudFront real-time log engine — the reference's core capability,
  * re-expressed as declarative Spark columns (whole-stage-codegen'd; no
  * UDFs, so filters/projections on parsed fields still push down).
  *
  * Semantics derive from the reference's processor
  * (/root/reference/log-processor/lambda_function.py:77-116) and its field
  * mapping config (cf_realtime_log_field_mappings.json):
  *  - records are tab-delimited, headerless, strictly ordered;
  *  - each field has a declared type (int/float/str);
  *  - a literal "-" means absent (the reference keeps it as a string; we
  *    surface it as NULL, the relational equivalent);
  *  - field names swap '-' for '_' (lambda_function.py:106);
  *  - cs-headers / cs-header-names are dropped by default for size
  *    (lambda_function.py:96-101), with an opt-in parser
  *    (lambda_function.py:36-53) that URL-decodes and splits name:value
  *    pairs.
  *
  * At 100 TB the parse is a pure per-row projection: no shuffle, fully
  * pipelined into whatever aggregation follows, and only the referenced
  * output columns survive column pruning.
  */
object CloudFrontLogs {

  /** Ordered field → Spark type mapping, mirroring
    * cf_realtime_log_field_mappings.json (all 40 CloudFront real-time
    * fields as of the reference's snapshot).
    */
  val fieldMappings: Seq[(String, DataType)] = Seq(
    "timestamp" -> DoubleType,
    "c-ip" -> StringType,
    "time-to-first-byte" -> DoubleType,
    "sc-status" -> IntegerType,
    "sc-bytes" -> LongType,
    "cs-method" -> StringType,
    "cs-protocol" -> StringType,
    "cs-host" -> StringType,
    "cs-uri-stem" -> StringType,
    "cs-bytes" -> LongType,
    "x-edge-location" -> StringType,
    "x-edge-request-id" -> StringType,
    "x-host-header" -> StringType,
    "time-taken" -> DoubleType,
    "cs-protocol-version" -> StringType,
    "c-ip-version" -> StringType,
    "cs-user-agent" -> StringType,
    "cs-referer" -> StringType,
    "cs-cookie" -> StringType,
    "cs-uri-query" -> StringType,
    "x-edge-response-result-type" -> StringType,
    "x-forwarded-for" -> StringType,
    "ssl-protocol" -> StringType,
    "ssl-cipher" -> StringType,
    "x-edge-result-type" -> StringType,
    "fle-encrypted-fields" -> StringType,
    "fle-status" -> StringType,
    "sc-content-type" -> StringType,
    "sc-content-len" -> LongType,
    "sc-range-start" -> LongType,
    "sc-range-end" -> LongType,
    "c-port" -> IntegerType,
    "x-edge-detailed-result-type" -> StringType,
    "c-country" -> StringType,
    "cs-accept-encoding" -> StringType,
    "cs-accept" -> StringType,
    "cache-behavior-path-pattern" -> StringType,
    "cs-headers" -> StringType,
    "cs-header-names" -> StringType,
    "cs-headers-count" -> IntegerType)

  /** Timestream-compatible column name: '-' → '_'. */
  def columnName(field: String): String = field.replace('-', '_')

  /** Fields the JSON config types "int" that the engine narrows to
    * int32: bounded-domain values (HTTP status, port, header count).
    * Every other "int" is a byte/offset counter and stays int64 — at
    * 100 TB a per-object byte counter overflows int32 routinely.
    */
  private val narrowInts = Set("sc-status", "c-port", "cs-headers-count")

  /** Load an ordered field mapping from the reference's JSON config
    * format ({"cf_realtime_log_fields": {"<field>": "int|float|str"}},
    * cf_realtime_log_field_mappings.json, loaded at cold start by
    * lambda_function.py:23-28). Ops teams edit the JSON when CloudFront
    * appends fields — the engine picks the change up at session init
    * instead of a code change. Declared order IS the tab order, so the
    * parse preserves it; the built-in [[fieldMappings]] is exactly what
    * this loader produces from the reference's own config file (proven
    * by spec).
    */
  def loadFieldMappings(path: String): Seq[(String, DataType)] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      "UTF-8")
    // Jackson (on Spark's classpath) keeps object-field declaration
    // order, which is load-bearing here
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    val fields = root.get("cf_realtime_log_fields")
    require(fields != null && fields.isObject,
      s"$path: expected a top-level cf_realtime_log_fields object")
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, DataType)]
    fields.fields().forEachRemaining { e =>
      val dt = e.getValue.asText() match {
        case "float" => DoubleType
        case "int"   => if (narrowInts(e.getKey)) IntegerType else LongType
        case "str"   => StringType
        case other => throw new IllegalArgumentException(
          s"$path: field ${e.getKey} has unsupported type '$other'")
      }
      buf += e.getKey -> dt
    }
    buf.toSeq
  }

  /** Parse a raw tab-delimited log line column into the 40 typed columns.
    *
    * @param dropHeaders drop cs_headers / cs_header_names like the
    *                    reference does by default (cost control).
    * @param keep        extra input columns to carry through.
    * @param mappings    ordered field mapping — the built-in table by
    *                    default, or [[loadFieldMappings]] output for a
    *                    config-driven schema.
    */
  def parse(lines: DataFrame, lineCol: String = "line",
            dropHeaders: Boolean = true,
            keep: Seq[String] = Nil,
            mappings: Seq[(String, DataType)] = fieldMappings): DataFrame = {
    val parts = split(col(lineCol), "\t")
    val parsed = mappings.zipWithIndex.map { case ((name, dt), i) =>
      // try_element_at: a truncated record yields NULL fields instead of
      // failing the job — one malformed line in a 100 TB scan must never
      // kill the query (the reference's per-record lambda would raise on
      // that record alone; a distributed scan has no such isolation).
      // try_cast likewise nulls un-castable numerics ('abc' in an int
      // field) instead of aborting under ANSI semantics.
      val raw = trim(try_element_at(parts, lit(i + 1)))
      when(raw === "-" || raw === "", lit(null))
        .otherwise(raw).try_cast(dt).as(columnName(name))
    }
    val out = lines.select(keep.map(col) ++ parsed: _*)
    if (dropHeaders) out.drop("cs_headers", "cs_header_names") else out
  }

  /** Parse a cs-headers value (URL-encoded, '\n'-separated name:value
    * pairs) into array<struct<name,value>> — the reference's
    * parse_headers(…, 'cs-headers') as higher-order column functions.
    * Entries without a ':' are dropped, exactly like the reference
    * (lambda_function.py:45-50 only appends when the split produced a
    * value part).
    */
  def parseHeaders(headers: Column): Column = {
    val entries = filter(split(url_decode(headers), "\n"),
      e => length(e) > 0 && instr(e, ":") > 0)
    transform(entries, e =>
      struct(
        substring_index(e, ":", 1).as("name"),
        substring(e, instr(e, ":") + 1, lit(1 << 24)).as("value")))
  }

  /** Parse a cs-header-names value (URL-encoded, '\n'-separated) into
    * array<string> — parse_headers(…, 'cs-header-names').
    */
  def parseHeaderNames(headerNames: Column): Column =
    filter(split(url_decode(headerNames), "\n"), e => length(e) > 0)

  /** Kinesis-shaped ingest: records carrying a base64 `data` payload
    * (what a Kinesis source/connector emits, and what the reference
    * base64-decodes per record — lambda_function.py:71-75) → a `line`
    * column ready for [[parse]]. The reference decodes byte-per-byte
    * (`chr`); log lines are ASCII, so UTF-8 is byte-identical.
    */
  def fromKinesisRecords(records: DataFrame,
                         dataCol: String = "data"): DataFrame =
    records.withColumn("line", decode(unbase64(col(dataCol)), "UTF-8"))

  /** Connector-shaped ingest: records whose payload is already raw
    * bytes (what a Kinesis/Kafka source column carries) → `line`.
    */
  def fromBinaryRecords(records: DataFrame,
                        dataCol: String = "data"): DataFrame =
    records.withColumn("line", decode(col(dataCol), "UTF-8"))

  /** Live Kinesis ingest — the production form of the file-source
    * stand-in, matching the reference's LogStream wiring
    * (template.yaml: a Kinesis stream feeding the processor). Requires
    * a Spark Kinesis connector jar on the classpath (`format
    * ("kinesis")`); this sandbox has none, so the seam is compile-only
    * here — the spec pins the failure mode so the adapter can't rot
    * silently. Everything downstream of the returned `line` column
    * (parse → melt → store) is byte-identical whichever source feeds
    * it.
    */
  def readKinesisStream(spark: org.apache.spark.sql.SparkSession,
                        streamName: String, region: String,
                        endpointUrl: Option[String] = None): DataFrame = {
    val r = spark.readStream.format("kinesis")
      .option("streamName", streamName)
      .option("region", region)
    fromBinaryRecords(endpointUrl.fold(r)(e => r.option("endpointUrl", e)).load())
  }

  /** Lambda-trigger-shaped ingest: JSON event envelopes
    * (`{"Records":[{"kinesis":{"data":"<base64>"}}]}` — the exact shape
    * the reference handler receives, lambda_function.py:66-71 /
    * test.json) → one `line` row per wrapped record. JSON path
    * extraction + explode, all codegen'd; works identically on a
    * streaming DataFrame of envelope strings.
    */
  def fromKinesisEnvelopes(envelopes: DataFrame,
                           jsonCol: String = "value"): DataFrame =
    envelopes
      .select(explode(from_json(col(jsonCol),
          org.apache.spark.sql.types.DataType.fromDDL(
            "Records ARRAY<STRUCT<kinesis: STRUCT<data: STRING>>>")
            .asInstanceOf[org.apache.spark.sql.types.StructType])
        ("Records")).as("r"))
      .select(decode(unbase64(col("r.kinesis.data")), "UTF-8").as("line"))

  /** Batch ingest of raw tab-delimited real-time log files: text source
    * → [[parse]]. The file layout plays the Kinesis stream's role for
    * backfill — same parser, same downstream plan.
    */
  def readLogs(spark: org.apache.spark.sql.SparkSession,
               path: String): DataFrame =
    parse(spark.read.text(path).withColumnRenamed("value", "line"))

  /** Wide parsed logs → long Timestream-style records: one row per
    * (record, measure) with the remaining fields packed as the dimension
    * map, time taken from the epoch-seconds `timestamp` field truncated to
    * whole seconds exactly like the reference (lambda_function.py:114:
    * 'Time': str(int(payload_dict['timestamp']))).
    *
    * Explode of a literal measure array is a per-row flatMap — still no
    * shuffle; dimension-map construction is deferred to output so column
    * pruning can drop it when the caller only aggregates measures.
    */
  def toRecords(parsed: DataFrame,
                measures: Seq[String] = Seq("sc_bytes"),
                dimensions: Seq[String] = Nil): DataFrame = {
    // default = ALL fields as dimensions, measure and timestamp included
    // — the reference's dimensions_list iterates the full payload dict
    // (lambda_function.py:105-110)
    val dims = if (dimensions.nonEmpty) dimensions else parsed.columns.toSeq
    val measureStructs = array(measures.map(m =>
      struct(lit(m).as("measure_name"),
        col(m).cast(DoubleType).as("measure_value"))): _*)
    // NULL (parsed '-') dimensions surface as the literal '-' string the
    // reference keeps for absent values (lambda_function.py:88-89)
    val dimMap = map(dims.flatMap(d =>
      Seq(lit(d), coalesce(col(d).cast(StringType), lit("-")))): _*)
    parsed
      .select(
        timestamp_seconds(col("timestamp").cast(LongType))
          .cast(TimestampNTZType).as("time"),
        explode(measureStructs).as("m"),
        dimMap.as("dimensions"))
      .select(col("time"), col("m.measure_name"), col("m.measure_value"),
        col("dimensions"))
  }
}
