package graft.streaming

import graft.cloudfront.CloudFrontLogs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2 A8/A9 — streaming ingest, Spark-first.
  *
  * The reference ingests CloudFront real-time logs from a Kinesis stream
  * into Timestream via a per-record Lambda. Here the same capability is
  * a Structured Streaming pipeline: any streaming (or batch) DataFrame
  * of raw `line` strings — file source as the Kinesis stand-in, since a
  * Kinesis connector is just another `readStream.format(...)` producing
  * the same shape — goes through the identical codegen'd parser used in
  * batch, then watermarked event-time aggregation.
  *
  * Every transform here is incremental-execution-safe: parse is
  * stateless; the aggregations keep per-window/per-session state bounded
  * by the watermark, so state store size is O(active windows × keys) —
  * the property that lets the same query run for months on a real
  * cluster without unbounded state growth.
  */
object CloudFrontStream {

  /** Raw lines → typed records with an event-time column (epoch-seconds
    * `timestamp` field truncated to whole seconds, like the reference).
    */
  def parsed(lines: DataFrame): DataFrame =
    CloudFrontLogs.parse(lines)
      .withColumn("event_time",
        timestamp_seconds(col("timestamp").cast(LongType)))

  /** README headline as a stream: hourly sum(sc_bytes)/count per edge
    * location, 1-hour watermark for late data.
    */
  def hourlyBytesByEdge(lines: DataFrame,
                        watermark: String = "1 hour"): DataFrame =
    parsed(lines)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), "1 hour"),
        col("x_edge_location"))
      .agg(sum(col("sc_bytes")).as("total_bytes"),
        count(lit(1)).as("n_requests"))

  /** A9 streaming sessionization: gap-based sessions per client IP via
    * `session_window` (state = one open session per key, closed and
    * emitted once the watermark passes the gap).
    */
  def sessions(lines: DataFrame, gap: String = "30 minutes",
               watermark: String = "1 hour"): DataFrame =
    parsed(lines)
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("c_ip"))
      .agg(count(lit(1)).as("n_requests"),
        sum(col("sc_bytes")).as("session_bytes"))

  /** The reference's STORE step (lambda → Timestream), Spark-first: melt
    * the parsed stream to long-form records and continuously append them
    * to a time-partitioned columnar store via foreachBatch. Partitioning
    * by (measure_name, day) is the Timestream layout's moral equivalent:
    * a dashboard query for one measure over a time range prunes to
    * exactly the partitions it touches.
    *
    * Idempotence: a blind append inside foreachBatch is only
    * at-least-once (a crash between the batch's file commit and the
    * checkpoint advancing re-executes the same batchId). Each batch is
    * therefore committed via [[commitBatch]]: staged under
    * `outDir/_staging/<tag>-<batchId>`, renamed into the live partition
    * tree under a batch-unique file prefix that a re-execution REPLACES
    * (delete-prefix-then-rename), and sealed with a marker under
    * `outDir/_graft_commits/` that lets a completed batch skip entirely.
    * A crash at ANY point — mid-stage, mid-rename, or between the data
    * commit and the marker — re-executes the batchId and converges to
    * exactly one copy of the batch, so the store is exactly-once without
    * a transactional table format.
    */
  def toTimestreamStore(lines: DataFrame, outDir: String,
      checkpointDir: String,
      measures: Seq[String] = Seq("sc_bytes", "time_taken"),
      dimensions: Seq[String] =
        Seq("x_edge_location", "c_country", "sc_status"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val records = CloudFrontLogs.toRecords(
        parsed(lines).drop("event_time"), measures, dimensions)
      .withColumn("day", to_date(col("time")))
    // batchIds are scoped to a checkpoint, so the marker namespace is
    // the stream's checkpoint identity — two streams appending to one
    // store don't collide at batch 0
    val streamTag = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpointDir.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    records.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(batch, outDir, streamTag, batchId)
      }
      .start()
  }

  /** Exactly-once commit of one micro-batch into the (measure_name, day)-
    * partitioned store — idempotent under re-execution after a crash at
    * any point:
    *
    *  1. marker exists → the batch fully committed before; skip (only
    *     sweeping any leftover staging dir).
    *  2. Write the batch to a private staging tree
    *     `outDir/_staging/<tag>-<batchId>` (mode overwrite, so a crashed
    *     attempt's partial staging is discarded wholesale).
    *  3. For each staged (measure_name, day) partition: delete live files
    *     carrying this batch's `<tag>-<batchId>-` prefix (a crashed
    *     attempt's partial publish), then rename the staged files in
    *     under that prefix — a re-execution REPLACES, never duplicates.
    *  4. Create the commit marker, then drop the staging dir.
    *
    * A crash before step 4 leaves no marker, so the re-executed batchId
    * redoes 2-3 and converges to exactly one copy; a crash after the
    * marker create makes the re-execution a no-op. Underscore-prefixed
    * `_staging` / `_graft_commits` are invisible to parquet readers, so
    * in-flight batches never surface to queries mid-commit.
    */
  private[graft] def commitBatch(batch: DataFrame, outDir: String,
      streamTag: String, batchId: Long,
      crashBeforeMarker: Boolean = false): Unit = {
    import org.apache.hadoop.fs.Path
    val hadoop = batch.sparkSession.sparkContext.hadoopConfiguration
    val out = new Path(outDir)
    val fs = out.getFileSystem(hadoop)
    val commits = new Path(out, "_graft_commits")
    val marker = new Path(commits, s"$streamTag-$batchId")
    val staging = new Path(out, s"_staging/$streamTag-$batchId")
    if (fs.exists(marker)) {
      fs.delete(staging, true) // crash landed between marker and cleanup
      return
    }
    batch.write.mode("overwrite")
      .partitionBy("measure_name", "day")
      .parquet(staging.toString)
    val prefix = s"$streamTag-$batchId-"
    for (measureDir <- fs.listStatus(staging)
           if measureDir.getPath.getName.startsWith("measure_name=");
         dayDir <- fs.listStatus(measureDir.getPath)
           if dayDir.isDirectory) {
      val liveDir = new Path(new Path(out, measureDir.getPath.getName),
        dayDir.getPath.getName)
      if (fs.exists(liveDir)) {
        for (f <- fs.listStatus(liveDir)
             if f.getPath.getName.startsWith(prefix))
          fs.delete(f.getPath, false)
      } else fs.mkdirs(liveDir)
      for (f <- fs.listStatus(dayDir.getPath);
           name = f.getPath.getName
           if !name.startsWith("_") && !name.startsWith(".")) {
        require(fs.rename(f.getPath, new Path(liveDir, prefix + name)),
          s"store commit: could not publish $name into $liveDir")
      }
    }
    if (crashBeforeMarker)
      throw new IllegalStateException(
        "injected crash between data commit and marker")
    fs.mkdirs(commits)
    fs.create(marker, true).close()
    fs.delete(staging, true)
  }

  /** Continuous "top URIs" dashboard feed: watermarked per-(window, uri)
    * counts — state bounded by the watermark; the aggregate is small
    * (windows × URIs), so the final per-window rank is a cheap batch
    * step on each micro-batch's output (see [[rankTop]]), not streaming
    * state.
    */
  def uriCountsPerWindow(lines: DataFrame, window_ : String = "1 hour",
                         watermark: String = "1 hour"): DataFrame =
    parsed(lines)
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), window_), col("cs_uri_stem"))
      .agg(count(lit(1)).as("n_requests"),
        sum(col("sc_bytes")).as("total_bytes"))

  /** Rank a uriCountsPerWindow aggregate to top-k per window (run inside
    * foreachBatch or on the complete-mode sink table).
    */
  def rankTop(agg: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window"))
      .orderBy(col("total_bytes").desc, col("cs_uri_stem"))
    agg.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Small-file compaction for the partitioned store: continuous
    * foreachBatch appends leave one file per (micro-batch × partition);
    * a periodic compaction rewrites each (measure_name, day) partition
    * into `filesPerPartition` files. The stream MUST be quiesced (or the
    * store's partitions otherwise frozen) while this runs: the
    * directory swap below is two renames, and an append landing between
    * them would be destroyed — so the swap verifies the live path
    * stayed absent and aborts (original data intact in the staged
    * directory) instead of deleting anything it cannot account for.
    */
  def compactStore(spark: org.apache.spark.sql.SparkSession,
                   path: String, filesPerPartition: Int = 1): Unit = {
    // Spark (rightly) refuses to overwrite a path it is reading, so the
    // compacted copy lands in a sibling directory and swaps in with two
    // renames — the same swap a table format does with a metadata commit.
    val hadoop = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hadoop)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compacting")
    val old = new org.apache.hadoop.fs.Path(path + "__precompact")
    spark.read.parquet(path)
      .repartition(filesPerPartition, col("measure_name"), col("day"))
      .write.mode("overwrite")
      .partitionBy("measure_name", "day")
      .parquet(tmp.toString)
    require(fs.rename(p, old), s"compact: could not stage $path")
    // carry store metadata — the _graft_commits idempotence markers and
    // the _graft_store.json retention manifest — into the compacted tree
    // by rename. The markers are load-bearing for exactly-once: the
    // rewrite strips batch prefixes from file names, so a post-compaction
    // restart re-executing its last batchId can only be stopped by the
    // marker. (_SUCCESS stays the rewrite's own; _staging is spent.)
    for (entry <- fs.listStatus(old);
         name = entry.getPath.getName
         if name.startsWith("_") && name != "_SUCCESS" && name != "_staging")
      require(fs.rename(entry.getPath, new org.apache.hadoop.fs.Path(tmp, name)),
        s"compact: could not carry $name")
    finishSwap(fs, p, tmp, old, "compact")
  }

  /** Final step of the two-rename store swap: the live path has been
    * staged at `old` and the replacement tree is ready at `tmp`. A writer
    * recreating the live path here would make the rename land INSIDE it
    * (Hadoop rename-into-existing-dir) and the cleanup delete destroy its
    * rows — so the swap verifies the live path stayed absent and aborts
    * (all data intact at `old` and `tmp`) instead of deleting anything it
    * cannot account for.
    */
  private[graft] def finishSwap(fs: org.apache.hadoop.fs.FileSystem,
      live: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path,
      old: org.apache.hadoop.fs.Path, what: String): Unit = {
    require(!fs.exists(live),
      s"$what: $live reappeared mid-swap (live writer?); " +
        s"aborting with all data intact at $old and $tmp")
    require(fs.rename(tmp, live), s"$what: could not swap in $tmp")
    fs.delete(old, true)
  }

  /** Store bootstrap — the analog of the reference's Timestream
    * database/table creation with retention properties (template.yaml:
    * 196-205: a Timestream table created with
    * MagneticStoreRetentionPeriodInDays 7, which the service then
    * enforces): creates the store directory and records the retention
    * policy in a `_graft_store.json` manifest (underscore-prefixed, so
    * parquet readers ignore it and [[expireStore]]'s sweep carries it).
    * The manifest-driven [[expireStore]] overload consumes it,
    * completing the store lifecycle the reference provisions
    * declaratively: init → ingest ([[toTimestreamStore]]) → compact
    * ([[compactStore]]) → expire ([[expireStore]]).
    */
  def initStore(spark: org.apache.spark.sql.SparkSession, path: String,
                retentionDays: Int): Unit = {
    import org.apache.hadoop.fs.Path
    require(retentionDays > 0, s"retentionDays must be > 0: $retentionDays")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new Path(p, "_graft_store.json")
    require(!fs.exists(manifest),
      s"store already initialized at $path (manifest exists)")
    fs.mkdirs(p)
    val out = fs.create(manifest, false)
    try out.write(
      s"""{"magnetic_store_retention_days": $retentionDays}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  /** Read the retention policy [[initStore]] recorded. */
  def storeRetentionDays(spark: org.apache.spark.sql.SparkSession,
                         path: String): Int = {
    import org.apache.hadoop.fs.Path
    val manifest = new Path(path, "_graft_store.json")
    val fs = manifest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(manifest),
      s"$path has no _graft_store.json manifest — initStore it first")
    val in = fs.open(manifest)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(text).get("magnetic_store_retention_days")
    require(node != null && node.canConvertToInt,
      s"$path: manifest lacks an integer magnetic_store_retention_days")
    node.asInt()
  }

  /** Manifest-driven retention sweep: max age comes from the policy
    * [[initStore]] recorded, like Timestream enforcing the table's own
    * RetentionProperties rather than a per-sweep parameter.
    */
  def expireStore(spark: org.apache.spark.sql.SparkSession, path: String,
                  asOf: java.time.LocalDate): Unit =
    expireStore(spark, path, storeRetentionDays(spark, path), asOf)

  /** Retention sweep for the partitioned store: drop every
    * (measure_name, day) partition whose day is older than `maxAgeDays`
    * before `asOf`. Mirrors the reference's Timestream retention
    * (template.yaml:203-205 — MemoryStoreRetentionPeriodInHours 24,
    * MagneticStoreRetentionPeriodInDays 7): without it, a months-running
    * ingest accumulates day partitions forever.
    *
    * Same quiesce/swap discipline as [[compactStore]], but survivors are
    * carried by RENAME, never rewritten — expired data is all that gets
    * deleted, and surviving partition files stay byte-identical. The
    * stream must be quiesced while this runs; a writer recreating the
    * live path mid-swap aborts the sweep with every row (expired and
    * surviving) intact in the staged directories.
    */
  def expireStore(spark: org.apache.spark.sql.SparkSession, path: String,
                  maxAgeDays: Int, asOf: java.time.LocalDate): Unit = {
    import org.apache.hadoop.fs.Path
    val hadoop = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(hadoop)
    val tmp = new Path(path + "__expiring")
    val old = new Path(path + "__preexpire")
    require(!fs.exists(tmp) && !fs.exists(old),
      s"expire: stale $tmp / $old from an aborted sweep — inspect and " +
        "remove before retrying")
    val cutoff = asOf.minusDays(maxAgeDays.toLong)
    require(fs.rename(p, old), s"expire: could not stage $path")
    fs.mkdirs(tmp)
    // carry survivors over by rename (byte-identical): non-partition
    // entries (the _graft_commits idempotence markers, _SUCCESS) whole,
    // partition trees day-by-day against the cutoff
    for (entry <- fs.listStatus(old)) {
      val name = entry.getPath.getName
      if (!name.startsWith("measure_name=")) {
        require(fs.rename(entry.getPath, new Path(tmp, name)),
          s"expire: could not carry $name")
      } else {
        for (dayDir <- fs.listStatus(entry.getPath)) {
          val dn = dayDir.getPath.getName
          val keep = !dn.startsWith("day=") ||
            !java.time.LocalDate.parse(dn.stripPrefix("day="))
              .isBefore(cutoff)
          if (keep) {
            val measureDir = new Path(tmp, name)
            fs.mkdirs(measureDir)
            require(fs.rename(dayDir.getPath, new Path(measureDir, dn)),
              s"expire: could not carry $name/$dn")
          }
        }
      }
    }
    finishSwap(fs, p, tmp, old, "expire")
  }

  /** The store's on-disk schema, for streaming readers (a file stream
    * needs an explicit schema up front; measure_name and day are
    * partition columns, resolved from the directory layout).
    */
  private val storeSchema = StructType(Seq(
    StructField("time", TimestampNTZType),
    StructField("measure_name", StringType),
    StructField("measure_value", DoubleType),
    StructField("dimensions", MapType(StringType, StringType)),
    StructField("day", DateType)))

  /** Middle job of the monitor-and-alert topology: stream the
    * (measure_name, day)-partitioned store, roll ONE measure up into
    * fixed time bins per key, and continuously append the closed bins to
    * a rollup store — the Spark shape of Timestream's scheduled-query
    * rollup tables the reference's dashboard reads. Append mode +
    * watermark means a (key, bin) row is written exactly once, when the
    * watermark passes the bin's end — which is what lets the alert job
    * downstream treat each arriving row as a finished observation.
    *
    * Kept as its own query (store → rollup store) rather than fused into
    * the alert job because a windowed aggregation cannot legally chain
    * into flatMapGroupsWithState inside one streaming query — and
    * operationally the rollup is worth persisting anyway (it IS the
    * dashboard feed; the alert job is one more reader).
    */
  def rollupStore(spark: org.apache.spark.sql.SparkSession,
      storePath: String, rollupDir: String, checkpointDir: String,
      measure: String = "sc_bytes", keyDim: String = "x_edge_location",
      binSeconds: Long = 3600L, watermark: String = "1 hour")
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(storeSchema).parquet(storePath)
      .filter(col("measure_name") === measure)
      // watermarks are only legal on TIMESTAMP; the NTZ store column is
      // UTC by construction, so the cast is a pure type change
      .withColumn("time", col("time").cast(TimestampType))
      .withWatermark("time", watermark)
      .groupBy(window(col("time"), s"$binSeconds seconds"),
        col("dimensions")(keyDim).as("key"))
      .agg(sum(col("measure_value")).as("x"))
      .filter(col("key").isNotNull)
      .select(col("key"),
        unix_seconds(col("window.start")).as("bin_start"),
        col("x"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .format("parquet")
      .option("path", rollupDir)
      .start()

  /** Final job of the topology: stream the rollup store and z-score each
    * closed bin against its key's prior baseline
    * ([[StreamingAnomaly.detect]]) — the continuously-running version of
    * the deviation-spotting the reference's dashboard queries exist for.
    * Sink the returned Dataset wherever alerts go (memory table,
    * parquet, a notification foreachBatch).
    */
  def storeAlerts(spark: org.apache.spark.sql.SparkSession,
      rollupDir: String, zThreshold: Double = 2.0, minPrior: Long = 5,
      idleTimeout: Option[String] = None)
      : org.apache.spark.sql.Dataset[StreamingAnomaly.Anomaly] = {
    import spark.implicits._
    StreamingAnomaly.detect(
      spark.readStream.schema("key STRING, bin_start BIGINT, x DOUBLE")
        .parquet(rollupDir).as[StreamingAnomaly.Bin],
      zThreshold, minPrior, idleTimeout)
  }

  /** Stream-static enrichment: join the parsed stream against a slowly-
    * changing dimension table (edge location → geography here). The
    * static side is broadcast — no shuffle of the stream, no streaming
    * state; Spark re-resolves the static relation each micro-batch.
    */
  def enrich(lines: DataFrame, edgeDims: DataFrame): DataFrame =
    parsed(lines).join(broadcast(edgeDims), Seq("x_edge_location"), "left")

  /** Stream-stream join: pair every request with 5xx errors from the
    * same client IP in the PRECEDING `horizon` — "what did this client
    * hit just before/while erroring". Both sides carry watermarks and
    * the join condition bounds event-time distance, so each side's
    * state store retains only a horizon's worth of rows — the condition
    * Structured Streaming requires to age state out of an inner
    * stream-stream join. Works identically on batch frames (the spec's
    * equivalence check).
    */
  def errorsNearRequests(lines: DataFrame, horizon: String = "10 minutes",
                         watermark: String = "1 hour"): DataFrame = {
    val reqs = parsed(lines)
      .withWatermark("event_time", watermark)
      .select(col("c_ip").as("ip"), col("event_time").as("req_time"),
        col("cs_uri_stem").as("uri"))
    val errs = parsed(lines)
      .filter(col("sc_status") >= 500)
      .withWatermark("event_time", watermark)
      .select(col("c_ip").as("err_ip"), col("event_time").as("err_time"))
    reqs.join(errs,
      col("ip") === col("err_ip") &&
        col("req_time") >= col("err_time") - expr(s"INTERVAL $horizon") &&
        col("req_time") <= col("err_time"))
      .select(col("ip"), col("uri"), col("req_time"), col("err_time"))
  }
}
