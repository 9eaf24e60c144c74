package graft.operators

import graft.{GraftQuery, QueryPack}
import graft.Caches.CachesSyntax
import graft.cloudfront.CloudFrontLogs
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2 block A1–A3 — the CloudFront log engine itself.
  *
  * The testdata has no raw CloudFront lines, so each query first
  * SYNTHESIZES faithful tab-delimited real-time log lines (all 40 fields,
  * mapping order, '-' for absent values) deterministically from the
  * `events` table, then runs them through the real parser. The DuckDB
  * oracle computes the same final answers directly from `events` — so a
  * match proves parse(format(x)) == x across every typed field, the NULL
  * ('-') path included.
  *
  * Synthesis uses only exact arithmetic (integer %, floor of cents
  * values, division by powers of two) so both engines derive bit-equal
  * doubles. Spark's double→string cast round-trips exactly.
  */
object CloudFrontPack extends QueryPack {

  // ---- shared synthesis (Spark side) ----

  private def statusCol: Column =
    when(col("event_type") === "error", 500)
      .when(col("event_type") === "purchase", 201)
      .when(col("event_type") === "signup", 200)
      .when(col("event_type") === "view", 304)
      .otherwise(200)

  private def resultTypeCol: Column =
    when(col("event_type") === "error", "Error")
      .when(pmod(col("event_id"), lit(3)) === 0, "Hit")
      .when(pmod(col("event_id"), lit(3)) === 1, "Miss")
      .otherwise("RefreshHit")

  private def bytesCol: Column =
    (floor(col("value") * 100).cast(LongType) + 200)

  private def hostCol: Column =
    concat(lit("d"), pmod(col("user_id"), lit(10)).cast(StringType),
      lit(".cloudfront.net"))

  /** events → DataFrame with one `line` column of CloudFront log lines. */
  private[graft] def synthLines(events: DataFrame): DataFrame = {
    val dash = lit("-")
    val fields: Seq[Column] = Seq(
      unix_seconds(col("ts").cast(TimestampType)).cast(StringType), // timestamp
      concat(lit("10."), pmod(col("user_id"), lit(200)).cast(StringType),
        lit("."), pmod(col("event_id"), lit(250)).cast(StringType),
        lit(".7")), // c-ip
      (col("value") / 1024.0d).cast(StringType), // time-to-first-byte
      statusCol.cast(StringType), // sc-status
      bytesCol.cast(StringType), // sc-bytes
      when(col("event_type") === "purchase", "POST").otherwise("GET"), // cs-method
      lit("https"), // cs-protocol
      hostCol, // cs-host
      concat(lit("/"), col("event_type"), lit("/"),
        pmod(col("event_id"), lit(100)).cast(StringType)), // cs-uri-stem
      (pmod(col("event_id"), lit(960)) + 40).cast(StringType), // cs-bytes
      concat(lit("EDGE-"), pmod(col("user_id"), lit(8)).cast(StringType)), // x-edge-location
      md5(col("event_id").cast(StringType)), // x-edge-request-id
      hostCol, // x-host-header
      (col("value") / 64.0d).cast(StringType), // time-taken
      lit("HTTP/2.0"), // cs-protocol-version
      lit("IPv4"), // c-ip-version
      element_at(array( // cs-user-agent: deterministic variety so
          // the A30 bot-share analysis has something to classify; the
          // curl UA is the reference's own test record
          // (log-processor/test.json)
          lit("Mozilla/5.0 (Windows NT 10.0) Chrome/120"),
          lit("Mozilla/5.0 (Macintosh; Intel Mac OS X) Safari/605.1"),
          lit("curl/7.53.1"),
          lit("Googlebot/2.1 (+http://www.google.com/bot.html)"),
          lit("python-requests/2.28")),
        (pmod(col("event_id"), lit(5)) + lit(1)).cast(IntegerType)),
      dash, // cs-referer (exercises the NULL path)
      dash, // cs-cookie
      dash, // cs-uri-query
      resultTypeCol, // x-edge-response-result-type
      dash, // x-forwarded-for
      lit("TLSv1.3"), // ssl-protocol
      lit("TLS_AES_128_GCM_SHA256"), // ssl-cipher
      resultTypeCol, // x-edge-result-type
      dash, // fle-encrypted-fields
      dash, // fle-status
      lit("text/html"), // sc-content-type
      (floor(col("value") * 100).cast(LongType) + 100).cast(StringType), // sc-content-len
      dash, // sc-range-start
      dash, // sc-range-end
      (pmod(col("event_id"), lit(20000)) + 40000).cast(StringType), // c-port
      resultTypeCol, // x-edge-detailed-result-type
      concat(lit("C"), pmod(col("user_id"), lit(20)).cast(StringType)), // c-country
      lit("gzip"), // cs-accept-encoding
      lit("*/*"), // cs-accept
      lit("*"), // cache-behavior-path-pattern
      dash, // cs-headers
      dash, // cs-header-names
      lit("3") // cs-headers-count
    )
    require(fields.size == CloudFrontLogs.fieldMappings.size)
    events.select(concat_ws("\t", fields: _*).as("line"))
  }

  /** The same derivations, as DuckDB SQL over `events` (oracle side). */
  private val oracleDerived: String = """
    SELECT
      CASE WHEN event_type = 'error' THEN 500
           WHEN event_type = 'purchase' THEN 201
           WHEN event_type = 'signup' THEN 200
           WHEN event_type = 'view' THEN 304
           ELSE 200 END AS sc_status,
      CASE WHEN event_type = 'error' THEN 'Error'
           WHEN event_id % 3 = 0 THEN 'Hit'
           WHEN event_id % 3 = 1 THEN 'Miss'
           ELSE 'RefreshHit' END AS x_edge_result_type,
      CAST(floor(value * 100) AS BIGINT) + 200 AS sc_bytes,
      value / 64.0 AS time_taken,
      value / 1024.0 AS time_to_first_byte,
      '10.' || CAST(user_id % 200 AS VARCHAR) || '.' ||
        CAST(event_id % 250 AS VARCHAR) || '.7' AS c_ip,
      'EDGE-' || CAST(user_id % 8 AS VARCHAR) AS x_edge_location,
      'C' || CAST(user_id % 20 AS VARCHAR) AS c_country,
      '/' || event_type || '/' || CAST(event_id % 100 AS VARCHAR)
        AS cs_uri_stem,
      md5(CAST(event_id AS VARCHAR)) AS x_edge_request_id,
      CASE event_id % 5
        WHEN 0 THEN 'Mozilla/5.0 (Windows NT 10.0) Chrome/120'
        WHEN 1 THEN 'Mozilla/5.0 (Macintosh; Intel Mac OS X) Safari/605.1'
        WHEN 2 THEN 'curl/7.53.1'
        WHEN 3 THEN 'Googlebot/2.1 (+http://www.google.com/bot.html)'
        ELSE 'python-requests/2.28' END AS cs_user_agent,
      make_timestamp(CAST(floor(epoch(ts)) AS BIGINT) * 1000000) AS time
    FROM events"""

  /** Parse-once-query-many: the four metric queries below share one
    * persisted parse of the synthesized log lines (Spark's CacheManager
    * dedupes the identical subplan across queries). At cluster scale this
    * is the same shape as parsing the raw stream once and serving every
    * dashboard panel from the columnar result.
    */
  private def parsedCached(s: SparkSession, d: String): DataFrame =
    CloudFrontLogs.parse(synthLines(
        Tables.parallelized(Tables.events(s, d))))
      // cache only the union of columns the sharing queries touch —
      // materializing all 40 parsed fields costs ~3x the pruned set and
      // nothing downstream reads the rest (a cluster deployment would
      // likewise persist a projected columnar view, not the raw width)
      .select(col("timestamp"), col("sc_status"), col("sc_bytes"),
        col("time_taken"), col("c_ip"), col("cs_referer"),
        col("x_edge_location"), col("x_edge_result_type"),
        col("c_country"), col("cs_uri_stem"), col("x_edge_request_id"),
        col("cs_user_agent"))
      .persistTracked

  /** The A1 rollup: groups on two PARSED typed columns and checks
    * counts, exact sums, distincts, and that '-' parsed to NULL
    * (n_referer must be 0). Shared by cf_parse (built-in mapping table)
    * and cf_parse_config (mapping loaded from the reference-format JSON)
    * so both prove the identical contract against one oracle.
    */
  private def parseRollup(parsed: DataFrame): DataFrame =
    parsed.groupBy(col("x_edge_result_type"), col("sc_status"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("sc_bytes")).as("total_bytes"),
        sum(col("time_taken").cast(DecimalType(28, 10))).cast(DoubleType)
          .as("total_time"),
        countDistinct(col("c_ip")).as("uniq_ips"),
        count(col("cs_referer")).as("n_referer"))
      .orderBy(col("x_edge_result_type"), col("sc_status"))

  private val parseRollupSql: String = s"""
      WITH derived AS ($oracleDerived)
      SELECT x_edge_result_type, sc_status,
        COUNT(*) AS n,
        CAST(SUM(sc_bytes) AS BIGINT) AS total_bytes,
        CAST(SUM(CAST(time_taken AS DECIMAL(28,10))) AS DOUBLE) AS total_time,
        COUNT(DISTINCT c_ip) AS uniq_ips,
        0 AS n_referer
      FROM derived
      GROUP BY x_edge_result_type, sc_status
      ORDER BY x_edge_result_type, sc_status
    """

  // A1 — full parser round-trip over the built-in mapping table.
  private val cfParse = GraftQuery(
    "cf_parse",
    (s, d) => parseRollup(parsedCached(s, d)),
    Some(parseRollupSql))

  // A1b — the ops-editable config path end-to-end. The reference loads
  // its field schema from a JSON config at cold start
  // (log-processor/lambda_function.py:23-28) so ops can track CloudFront
  // field additions without a code change; this query drives the same
  // artifact through the driver gate: a reference-format mapping JSON
  // (bundled copy of log-processor/config/
  // cf_realtime_log_field_mappings.json) is materialized to disk, loaded
  // by [[CloudFrontLogs.loadFieldMappings]], and the loaded schema runs
  // the full parse + rollup. Hash-matching cf_parse's oracle proves the
  // config-driven parse is behaviourally identical to the built-in
  // table — names, order, types, and the '-'→NULL path.
  private val cfParseConfig = GraftQuery(
    "cf_parse_config",
    (s, d) => {
      // SPARK_GRAFT_FIELDMAP points the parser at an ops-edited mapping
      // file end-to-end (the reference's deploy-time config knob,
      // log-processor/lambda_function.py:23-28); unset, the bundled
      // copy of the reference's config exercises the identical loader.
      val path = sys.env.get("SPARK_GRAFT_FIELDMAP") match {
        case Some(p) =>
          require(java.nio.file.Files.isReadable(java.nio.file.Paths.get(p)),
            s"SPARK_GRAFT_FIELDMAP=$p is not a readable file")
          p
        case None => bundledFieldMapPath
      }
      val mappings = CloudFrontLogs.loadFieldMappings(path)
      parseRollup(CloudFrontLogs.parse(
        synthLines(Tables.parallelized(Tables.events(s, d))),
        mappings = mappings))
    },
    Some(parseRollupSql))

  /** The bundled reference field-mapping config, copied to a temp file
    * ONCE per JVM (the loader takes a filesystem path so the
    * SPARK_GRAFT_FIELDMAP override and the bundled default exercise the
    * identical code path). A per-invocation copy leaked one temp file
    * per bench iteration — unboundedly in a long-lived service.
    */
  private lazy val bundledFieldMapPath: String = {
    val cfg = java.nio.file.Files.createTempFile("graft-fieldmap", ".json")
    cfg.toFile.deleteOnExit()
    val in = getClass.getResourceAsStream(
      "/graft/cf_realtime_log_field_mappings.json")
    require(in != null, "bundled field-mapping config not on classpath")
    try java.nio.file.Files.copy(in, cfg,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    cfg.toString
  }

  // A2 — header parsing. Synthesizes URL-encoded cs-headers values (the
  // escape set %3A %0A %20 — DuckDB 1.0 lacks url_decode, the oracle
  // decodes with replace()) and aggregates the exploded name:value pairs.
  private val cfHeaders = GraftQuery(
    "cf_headers",
    (s, d) => {
      val enc = Tables.parallelized(Tables.events(s, d)).select(
        concat(
          lit("Host:"), hostCol,
          lit("%0AUser-Agent:Mozilla%205.0"),
          lit("%0AX-Req:"), pmod(col("event_id"), lit(50)).cast(StringType)
        ).as("cs_headers"))
      enc
        .select(explode(CloudFrontLogs.parseHeaders(col("cs_headers")))
          .as("h"))
        .groupBy(col("h.name").as("header_name"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("h.value")).as("uniq_values"))
        .orderBy(col("header_name"))
    },
    Some("""
      WITH hdrs AS (
        SELECT 'Host' AS header_name,
               'd' || CAST(user_id % 10 AS VARCHAR) || '.cloudfront.net' AS value
        FROM events
        UNION ALL
        SELECT 'User-Agent', 'Mozilla 5.0' FROM events
        UNION ALL
        SELECT 'X-Req', CAST(event_id % 50 AS VARCHAR) FROM events)
      SELECT header_name, COUNT(*) AS n,
        COUNT(DISTINCT value) AS uniq_values
      FROM hdrs
      GROUP BY header_name
      ORDER BY header_name
    """))

  // A3 — wide→long melt to Timestream-style records (measure_name,
  // measure_value, time), then an aggregate per measure over the long
  // form. Proves the record model the reference ingests into Timestream.
  private val cfMelt = GraftQuery(
    "cf_melt",
    (s, d) => {
      val parsed = parsedCached(s, d)
      val records = CloudFrontLogs.toRecords(parsed,
        measures = Seq("sc_bytes", "time_taken"),
        dimensions = Seq("x_edge_location", "c_country", "sc_status"))
      records.groupBy(col("measure_name"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("measure_value").cast(DecimalType(28, 10)))
            .cast(DoubleType).as("total"),
          min(col("time")).as("min_time"),
          max(col("time")).as("max_time"))
        .orderBy(col("measure_name"))
    },
    Some(s"""
      WITH derived AS ($oracleDerived),
      long_form AS (
        SELECT 'sc_bytes' AS measure_name,
               CAST(sc_bytes AS DOUBLE) AS measure_value, time FROM derived
        UNION ALL
        SELECT 'time_taken', time_taken, time FROM derived)
      SELECT measure_name, COUNT(*) AS n,
        CAST(SUM(CAST(measure_value AS DECIMAL(28,10))) AS DOUBLE) AS total,
        MIN(time) AS min_time, MAX(time) AS max_time
      FROM long_form
      GROUP BY measure_name
      ORDER BY measure_name
    """))

  // A6 — the README headline query, end-to-end through the parser:
  // hourly SUM(sc_bytes) + request count per x_edge_location (the
  // reference runs this shape in Timestream: bin(time, 1h), SUM(CASE
  // WHEN measure_name='sc_bytes' ...) GROUP BY x_edge_location).
  private val qBytesByEdge = GraftQuery(
    "q_bytes_by_edge",
    (s, d) => {
      val parsed = parsedCached(s, d)
      val eventTime = timestamp_seconds(col("timestamp").cast(LongType))
      parsed
        .groupBy(
          graft.timeseries.TimeSeries.bin(eventTime, 3600)
            .cast(TimestampNTZType).as("binned_time"),
          col("x_edge_location"))
        .agg(sum(col("sc_bytes")).as("total_bytes"),
          count(lit(1)).as("n_requests"))
        .orderBy(col("binned_time"), col("x_edge_location"))
    },
    Some(s"""
      WITH derived AS ($oracleDerived)
      SELECT make_timestamp(epoch_us(time) - epoch_us(time) % 3600000000)
          AS binned_time,
        x_edge_location,
        CAST(SUM(sc_bytes) AS BIGINT) AS total_bytes,
        COUNT(*) AS n_requests
      FROM derived
      GROUP BY 1, 2
      ORDER BY binned_time, x_edge_location
      """))

  // A6b — the reference README's query VERBATIM in shape
  // (README.md:100-113): over the melted Timestream records,
  // bin(time, 1h) × x_edge_location, SUM(CASE WHEN measure_name =
  // 'sc_bytes' THEN measure_value::bigint END), time >= ago(24h)
  // (anchored at max(time) for batch determinism).
  private val qTimestreamHeadline = GraftQuery(
    "q_timestream_headline",
    (s, d) => {
      // ago(24h) pushed BELOW the synth+parse+melt: records.time is
      // floor-to-second of ts, and floor is monotonic, so
      // `time >= floor(max_epoch) - 24h` ⟺ `epoch(ts) >= floor(max) -
      // 86400` on the raw events — the anchor pass scans one long
      // column instead of re-synthesizing and re-parsing every line,
      // and the expensive parse touches only the surviving window.
      val ev = Tables.events(s, d)
      val anchor = ev.agg(
        unix_seconds(max(col("ts")).cast(TimestampType)).as("mx"))
      val recent = ev.join(broadcast(anchor),
          unix_seconds(col("ts").cast(TimestampType)) >=
            col("mx") - 24L * 3600)
        .drop("mx")
      val parsed = CloudFrontLogs.parse(synthLines(recent))
      val records = CloudFrontLogs.toRecords(parsed,
        measures = Seq("sc_bytes", "time_taken"),
        dimensions = Seq("x_edge_location", "c_country", "sc_status"))
      records
        .filter(col("measure_name").isin("sc_bytes"))
        .groupBy(
          graft.timeseries.TimeSeries.bin(col("time"), 3600)
            .cast(TimestampNTZType).as("binned_time"),
          col("dimensions")("x_edge_location").as("x_edge_location"))
        .agg(sum(when(col("measure_name") === "sc_bytes",
            col("measure_value").cast(LongType)))
          .as("sum_bytes_downloaded"))
        .orderBy(col("binned_time"), col("x_edge_location"))
    },
    Some(s"""
      WITH derived AS ($oracleDerived),
      rec AS (
        SELECT 'sc_bytes' AS measure_name,
               CAST(sc_bytes AS DOUBLE) AS measure_value,
               time, x_edge_location
        FROM derived
        UNION ALL
        SELECT 'time_taken', time_taken, time, x_edge_location
        FROM derived),
      anch AS (SELECT max(time) AS mx FROM rec)
      SELECT make_timestamp(epoch_us(time) - epoch_us(time) % 3600000000)
          AS binned_time,
        x_edge_location,
        CAST(SUM(CASE WHEN measure_name = 'sc_bytes'
            THEN CAST(measure_value AS BIGINT) END) AS BIGINT)
          AS sum_bytes_downloaded
      FROM rec, anch
      WHERE time >= mx - INTERVAL 24 HOUR
        AND measure_name IN ('sc_bytes')
      GROUP BY 1, 2
      ORDER BY binned_time, x_edge_location
      """))

  // A13 — cache-result metrics, the reference's "cache result types"
  // purpose (README): per-edge hit ratio over x_edge_result_type.
  // Count-based, single IEEE division — deterministic on any cluster.
  private val cfCacheHitRatio = GraftQuery(
    "cf_cache_hit_ratio",
    (s, d) => {
      parsedCached(s, d)
        .groupBy(col("x_edge_location"))
        .agg(
          count(lit(1)).as("n_requests"),
          sum(when(col("x_edge_result_type").isin("Hit", "RefreshHit"), 1L)
            .otherwise(0L)).as("n_hits"),
          (sum(when(col("x_edge_result_type").isin("Hit", "RefreshHit"), 1L)
            .otherwise(0L)).cast(DoubleType) / count(lit(1)))
            .as("hit_ratio"))
        .orderBy(col("x_edge_location"))
    },
    Some(s"""
      WITH derived AS ($oracleDerived)
      SELECT x_edge_location, COUNT(*) AS n_requests,
        CAST(SUM(CASE WHEN x_edge_result_type IN ('Hit','RefreshHit')
             THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        CAST(SUM(CASE WHEN x_edge_result_type IN ('Hit','RefreshHit')
             THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS hit_ratio
      FROM derived
      GROUP BY x_edge_location
      ORDER BY x_edge_location
      """))

  // A14 — status-class breakdown per hour (the reference's "status"
  // purpose): 2xx/3xx/4xx/5xx counts + error rate, one scan, one
  // shuffle on the hour bin with map-side partial aggregation.
  private val cfStatusClasses = GraftQuery(
    "cf_status_classes",
    (s, d) => {
      val parsed = parsedCached(s, d)
      val eventTime = timestamp_seconds(col("timestamp").cast(LongType))
      def cls(c: Int) = sum(
        when(floor(col("sc_status") / 100) === c, 1L).otherwise(0L))
      parsed
        .groupBy(graft.timeseries.TimeSeries.bin(eventTime, 3600)
          .cast(TimestampNTZType).as("binned_time"))
        .agg(
          count(lit(1)).as("n"),
          cls(2).as("n_2xx"), cls(3).as("n_3xx"),
          cls(4).as("n_4xx"), cls(5).as("n_5xx"),
          (cls(5).cast(DoubleType) / count(lit(1))).as("error_rate"))
        .orderBy(col("binned_time"))
    },
    Some(s"""
      WITH derived AS ($oracleDerived)
      SELECT make_timestamp(epoch_us(time) - epoch_us(time) % 3600000000)
          AS binned_time,
        COUNT(*) AS n,
        CAST(SUM(CASE WHEN floor(sc_status/100) = 2 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_2xx,
        CAST(SUM(CASE WHEN floor(sc_status/100) = 3 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_3xx,
        CAST(SUM(CASE WHEN floor(sc_status/100) = 4 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_4xx,
        CAST(SUM(CASE WHEN floor(sc_status/100) = 5 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_5xx,
        CAST(SUM(CASE WHEN floor(sc_status/100) = 5 THEN 1 ELSE 0 END)
          AS DOUBLE) / COUNT(*) AS error_rate
      FROM derived
      GROUP BY 1
      ORDER BY binned_time
      """))

  // A15 — per-country top URIs by bytes (the reference's "per-country /
  // per-URI" purpose). Aggregate once on (country, uri), then a bounded
  // per-country window rank — the agg shrinks the data before the rank
  // shuffle, so the window never sees raw events.
  private val cfTopUris = GraftQuery(
    "cf_top_uris",
    (s, d) => {
      // top-3 per country through the custom TopKPerKey operator (G7):
      // per-partition bounded heaps + one exchange — the URI set per
      // country is unbounded at corpus scale, so a row_number window
      // over it would sort an ever-growing partition per task. The
      // rank window runs only over the <=3 surviving rows per country.
      val agg = parsedCached(s, d)
        .groupBy(col("c_country"), col("cs_uri_stem"))
        .agg(count(lit(1)).as("n_requests"),
          sum(col("sc_bytes")).as("total_bytes"))
      val top = graft.plans.TopKPerKey(agg,
        keys = Seq(col("c_country")),
        order = Seq(col("total_bytes").desc, col("cs_uri_stem")),
        k = 3)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("c_country"))
        .orderBy(col("total_bytes").desc, col("cs_uri_stem"))
      top.withColumn("rnk", row_number().over(w))
        .select(col("c_country"), col("cs_uri_stem"), col("n_requests"),
          col("total_bytes"), col("rnk"))
        .orderBy(col("c_country"), col("rnk"))
    },
    Some(s"""
      WITH derived AS ($oracleDerived),
      agg AS (
        SELECT c_country, cs_uri_stem, COUNT(*) AS n_requests,
          CAST(SUM(sc_bytes) AS BIGINT) AS total_bytes
        FROM derived GROUP BY 1, 2),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY c_country
          ORDER BY total_bytes DESC, cs_uri_stem) AS rnk
        FROM agg)
      SELECT c_country, cs_uri_stem, n_requests, total_bytes,
        CAST(rnk AS INTEGER) AS rnk
      FROM ranked WHERE rnk <= 3
      ORDER BY c_country, rnk
      """))

  // A16 — per-edge latency percentiles (the reference's "latency"
  // purpose: time_taken / time_to_first_byte): exact p50/p90/p99 by
  // the shared two-pass histogram rank-selection (HistogramRank.scala)
  // — the sorted partition holds one edge's DISTINCT latency values
  // (ms-granular, domain-bounded), never its raw rows, so an 8-edge
  // fleet at 100× cannot produce a multi-TB sort task.
  private val cfLatencyPercentiles = GraftQuery(
    "cf_latency_percentiles",
    (s, d) => HistogramRank.percentiles(parsedCached(s, d),
        col("x_edge_location"), col("time_taken"),
        Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99), "tmax")
      .orderBy(col("x_edge_location")),
    Some(s"""
      WITH derived AS ($oracleDerived),
      ranked AS (
        SELECT x_edge_location, time_taken,
          ROW_NUMBER() OVER (PARTITION BY x_edge_location
            ORDER BY time_taken, x_edge_request_id) AS rn,
          COUNT(*) OVER (PARTITION BY x_edge_location) AS cnt
        FROM derived)
      SELECT x_edge_location,
        MAX(CASE WHEN rn = CAST(floor((cnt-1) * 0.5) AS BIGINT) + 1
          THEN time_taken END) AS p50,
        MAX(CASE WHEN rn = CAST(floor((cnt-1) * 0.9) AS BIGINT) + 1
          THEN time_taken END) AS p90,
        MAX(CASE WHEN rn = CAST(floor((cnt-1) * 0.99) AS BIGINT) + 1
          THEN time_taken END) AS p99,
        MAX(time_taken) AS tmax
      FROM ranked
      GROUP BY x_edge_location
      ORDER BY x_edge_location
      """))

  // A30 — per-edge bot-traffic analysis off the user-agent field: the
  // CDN-monitoring view the reference's dashboards imply (is an edge's
  // traffic spike humans or a crawler?) — UA classified by the
  // standard heuristics (a 'bot' token, cli/library prefixes), per
  // (edge, class) volumes + distinct client IPs + byte share of the
  // edge in exact integer ppm. Reads the SHARED parse cache; one
  // map-side-combining agg + a keys-scale share join-back.
  private val cfUserAgents = GraftQuery(
    "cf_user_agents",
    (s, d) => {
      val cls = when(lower(col("cs_user_agent")).contains("bot") ||
          col("cs_user_agent").startsWith("curl/") ||
          col("cs_user_agent").startsWith("python-requests"), "bot")
        .otherwise("browser")
      val g = parsedCached(s, d)
        .groupBy(col("x_edge_location"), cls.as("ua_class"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("c_ip")).as("uniq_ips"),
          sum(col("sc_bytes")).as("total_bytes"))
      val tot = g.groupBy(col("x_edge_location"))
        .agg(sum(col("n")).as("t"))
      g.join(tot, Seq("x_edge_location"))
        // DECIMAL(38,0)-widened ppm numerator (source_report
        // discipline; r9 advice): int64 wraps past ~9.2e12 requests
        // per edge in non-ANSI Spark where DuckDB raises. `div` → BIGINT.
        .withColumn("share_ppm",
          expr("(CAST(1000000 AS DECIMAL(38,0)) * n) div t"))
        .select(col("x_edge_location"), col("ua_class"), col("n"),
          col("uniq_ips"), col("total_bytes"), col("share_ppm"))
        .orderBy(col("x_edge_location"), col("ua_class"))
    },
    Some(s"""
      WITH derived AS ($oracleDerived),
      c AS (SELECT x_edge_location, c_ip, sc_bytes,
          CASE WHEN lower(cs_user_agent) LIKE '%bot%'
                OR cs_user_agent LIKE 'curl/%'
                OR cs_user_agent LIKE 'python-requests%'
               THEN 'bot' ELSE 'browser' END AS ua_class
        FROM derived),
      g AS (SELECT x_edge_location, ua_class,
          CAST(COUNT(*) AS BIGINT) AS n,
          COUNT(DISTINCT c_ip) AS uniq_ips,
          CAST(SUM(sc_bytes) AS BIGINT) AS total_bytes
        FROM c GROUP BY 1, 2),
      t AS (SELECT x_edge_location, CAST(SUM(n) AS BIGINT) AS t
            FROM g GROUP BY 1)
      SELECT g.x_edge_location, g.ua_class, g.n, g.uniq_ips,
        g.total_bytes,
        CAST((CAST(1000000 AS HUGEINT) * g.n) // t.t AS BIGINT)
          AS share_ppm
      FROM g JOIN t ON g.x_edge_location = t.x_edge_location
      ORDER BY 1, 2
      """))

  override val queries: Seq[GraftQuery] =
    Seq(cfParse, cfParseConfig, cfHeaders, cfMelt, qBytesByEdge,
      qTimestreamHeadline,
      cfCacheHitRatio, cfStatusClasses, cfTopUris, cfLatencyPercentiles,
      cfUserAgents)

  /** Cross-query shared working set (see [[graft.QueryPack.warm]]): the
    * parse-once columnar view every CF metric query reads.
    */
  override def warm: Seq[(String,
      (SparkSession, String) => DataFrame)] =
    Seq("cf_parsed" -> ((s, d) => parsedCached(s, d)))
}
