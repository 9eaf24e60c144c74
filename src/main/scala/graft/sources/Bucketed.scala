package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}
import org.apache.spark.sql.catalyst.catalog.BucketSpec

/** Bucketed-table utilities (SURVEY.md §4/§5: co-located fact-fact
  * joins).
  *
  * At 100 TB the lineitem⋈orders class of joins is the shuffle budget's
  * biggest line item. Writing both facts bucketed AND sorted by the join
  * key makes the join a zero-exchange sort-merge: each task reads
  * matching buckets from both sides — no network movement at query
  * time, amortized across every downstream query that joins on the key.
  * The spec asserts the property structurally (no shuffle exchange in
  * the executed plan).
  */
object Bucketed {

  /** Apply a catalog bucket spec to a writer — the ONE place the
    * bucketBy/sortBy layout is spelled, so write, append and compact can
    * never diverge from each other on the layout every probe relies on.
    */
  private def withSpec(w: DataFrameWriter[Row],
      spec: BucketSpec): DataFrameWriter[Row] = {
    val b = w.bucketBy(spec.numBuckets, spec.bucketColumnNames.head,
      spec.bucketColumnNames.tail: _*)
    if (spec.sortColumnNames.nonEmpty)
      b.sortBy(spec.sortColumnNames.head, spec.sortColumnNames.tail: _*)
    else b
  }

  /** Write `df` as a bucketed+sorted external parquet table registered
    * in the session catalog at `path`. Lease-guarded like the other two
    * mutation paths: a store REBUILD racing an in-flight append or
    * compaction of the same location would delete files under the
    * holder's scan — the overwrite is as much a single-writer mutation
    * as they are. A relative `path` is resolved against the CURRENT
    * DATABASE's location — the resolution `saveAsTable` itself applies
    * to a relative path option (warehouse root only for the default
    * database) — so the lease marker sits beside the actual table
    * files and locks the same path append/compact derive from the
    * catalog.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: String): Unit = {
    val spark = df.sparkSession
    requireNonGenerationPath(path)
    withWriterLeaseAt(spark, resolveLocation(spark, table, path), table) {
      // align the write with the bucket layout (r15): from an
      // arbitrarily-partitioned frame every task writes one file per
      // bucket it holds rows of — tasks × buckets small files
      // (measured: a 10k-row payload table landed 1,280 files where
      // an already-bucket-aligned input landed 8). One exchange on
      // the bucket key before the write gives one sorted file per
      // bucket — the exact layout compactBucketed exists to RESTORE
      // after appends, now the layout fresh stores START with; the
      // write-side shuffle is bytes that are about to hit disk anyway
      withSpec(df.repartition(buckets,
          org.apache.spark.sql.functions.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .option("path", path), BucketSpec(buckets, Seq(key), Seq(key)))
        .saveAsTable(table)
    }
  }

  /** Write `df` as a PLAIN (unbucketed) external parquet table at
    * `path`, one sorted file — for the stores' metadata-scale sidecar
    * tables ([[EmbedStore]]'s cells). Lease-guarded like
    * [[writeBucketed]]: a rebuild racing an append or compaction of the
    * same location is the same silent-corruption mode.
    */
  def writePlain(df: DataFrame, table: String, path: String,
      sortCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    requireNonGenerationPath(path)
    withWriterLeaseAt(spark, resolveLocation(spark, table, path), table) {
      df.repartition(1)
        .sortWithinPartitions(
          sortCols.map(org.apache.spark.sql.functions.col): _*)
        .write.mode("overwrite").format("parquet")
        .option("path", path).saveAsTable(table)
    }
  }

  /** The `__gN` suffix is RESERVED for compaction's generation
    * directories: a user table written at a path that matches it would
    * collide with a sibling table's generation namespace — its own
    * base-stripped lock would alias the sibling's, and the sibling's
    * compaction retirement sweep could delete it as an elder
    * generation. Refuse at write time, where the path is chosen.
    */
  private def requireNonGenerationPath(path: String): Unit =
    require(!path.stripSuffix("/").matches(".*__g\\d+$"),
      s"table path '$path' ends in the reserved generation suffix " +
        "__g<N> — pick another path (compaction owns that namespace)")

  /** The location `saveAsTable` will actually use for a `path` option —
    * a relative path resolves against the TABLE IDENTIFIER's database
    * location (not blindly the current database: saveAsTable("db.t")
    * resolves against db's location even when the current one differs) —
    * so the lease marker sits beside the actual table files and locks
    * the same path append/compact derive from the catalog.
    */
  private def resolveLocation(spark: SparkSession, table: String,
      path: String): String = {
    val raw = new org.apache.hadoop.fs.Path(path)
    if (raw.toUri.getScheme != null) return raw.toString
    // scheme-less paths — absolute AND relative — qualify against the
    // TABLE'S DATABASE location, exactly as Spark's
    // SessionCatalog.makeQualifiedTablePath will when saveAsTable runs:
    // a scheme-less absolute path on a database whose location is not
    // on the default filesystem (s3a warehouse, hdfs defaultFS) would
    // otherwise lease on a DIFFERENT filesystem than the
    // catalog-derived lock append/compact use, silently admitting a
    // rebuild beside an in-flight append
    val db = spark.sessionState.sqlParser.parseTableIdentifier(table)
      .database.getOrElse(spark.sessionState.catalog.getCurrentDatabase)
    val dbLoc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getDatabaseMetadata(db).locationUri)
    val resolved =
      if (raw.isAbsolute) new org.apache.hadoop.fs.Path(
        dbLoc.toUri.getScheme, dbLoc.toUri.getAuthority, path)
      else new org.apache.hadoop.fs.Path(dbLoc, path)
    resolved.toString
  }

  /** Single-writer lease over a bucketed store's mutations.
    *
    * The stores' ingest contract is single-writer — two concurrent
    * appends can both claim a novel fingerprint, and an append racing a
    * compaction can land files in a generation directory the swap is
    * about to retire. Those are SILENT corruption modes; this lease
    * turns them into a loud, immediate error. The lease marker is a
    * sibling of the table's generation directories (`<base>__lock`), so
    * it survives compaction's location swaps and excludes appenders,
    * compactors and rebuilders of the same table from each other.
    * Acquisition is atomic where the filesystem can promise it: HDFS's
    * no-overwrite create is atomic; on the LOCAL filesystem Hadoop's
    * `create(overwrite = false)` is check-then-act (no O_EXCL), so the
    * lock goes through `File.createNewFile`, which is; object stores
    * are best-effort — there, run ingest from one scheduler, which is
    * the contract anyway.
    *
    * A writer that DIED holding the lease leaves the marker behind. If
    * the marker names a SAME-HOST holder whose pid is verifiably gone
    * (`ProcessHandle` liveness — the one case where deadness is
    * checkable, not guessed), acquisition breaks it and proceeds: a
    * killed build must not wedge every later writer of the store. The
    * break claims the marker by atomic RENAME (one winner among
    * concurrent breakers) and verifies the claimed content before
    * discarding it. Host identity is hostname equality — where writer
    * hostnames are not unique (cloned containers), set
    * `SPARK_GRAFT_LEASE_AUTOBREAK=0` and recover dead leases manually.
    * Any other marker — live holder, other host, unreadable — refuses
    * with the marker path and holder so an operator can verify and
    * delete. TIME-based auto-expiry stays deliberately absent: expiring
    * under a live-but-slow writer re-opens the corruption this exists
    * to prevent. A failure of the holder's OWN acquisition (created the
    * marker, then could not write it) releases the marker and rethrows —
    * only a FOREIGN marker reads as contention.
    */
  private[graft] def withWriterLease[T](spark: SparkSession,
      table: String)(body: => T): T = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(table))
    withWriterLeaseAt(spark, meta.location.toString, table)(body)
  }

  /** Lock paths this THREAD currently holds — makes the lease
    * reentrant per thread, so a store operation that must cover
    * several leased legs in ONE critical section (DsirStore.append:
    * novelty probe + delta + docs commit) can take the lease once and
    * call the per-leg helpers, whose own acquisition then no-ops
    * instead of reading its own live marker as contention. Thread-
    * confined on purpose: a SECOND thread of the same process still
    * contends (the single-writer contract is per store, not per
    * process).
    */
  private val heldLeases = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue(): scala.collection.mutable.Set[String] =
      scala.collection.mutable.Set.empty
  }

  private[sources] def withWriterLeaseAt[T](spark: SparkSession,
      location: String, table: String)(body: => T): T = {
    val loc = location.stripSuffix("/")
    val rawLock = new org.apache.hadoop.fs.Path(
      loc.replaceAll("__g\\d+$", "") + "__lock")
    val fs = rawLock.getFileSystem(spark.sessionState.newHadoopConf())
    // reentrancy keys on the QUALIFIED path: the same physical lock can
    // arrive spelled two ways (catalog URI "file:/p/t__lock" vs a
    // resolveLocation-derived bare "/p/t__lock") and an unnormalized
    // key would read the holder's own live marker as contention
    val lock = fs.makeQualified(rawLock)
    if (heldLeases.get.contains(lock.toString)) return body
    val holder = s"pid=${ProcessHandle.current().pid()} host=${
      java.net.InetAddress.getLocalHost.getHostName} at=${
      java.time.Instant.now()}"
    val bytes = holder.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def readMarker(p: org.apache.hadoop.fs.Path): String = try {
      val in = fs.open(p)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } catch { case _: java.io.IOException => "unknown" }
    def readHolder(): String = readMarker(lock)
    // Deadness is only VERIFIABLE for a same-host holder: the pid is
    // checkable via ProcessHandle; anything else is a guess, and a
    // wrong guess re-opens the corruption the lease prevents. The host
    // test is HOSTNAME EQUALITY — in a fleet whose writers do not have
    // unique hostnames (cloned containers all reporting the same name),
    // a remote LIVE holder's pid can be absent locally and read as
    // dead: disable the auto-break there via
    // SPARK_GRAFT_LEASE_AUTOBREAK=0 and recover dead leases manually.
    // A marker that does not parse (corrupt, foreign format, pid
    // overflow) is never judged dead — it refuses with the recovery
    // message like any live holder's.
    def holderDead(who: String): Boolean =
      "pid=(\\d+) host=(\\S+)".r.findFirstMatchIn(who).exists { m =>
        m.group(2) == java.net.InetAddress.getLocalHost.getHostName &&
          scala.util.Try {
            val p = ProcessHandle.of(m.group(1).toLong)
            !p.isPresent || !p.get.isAlive
          }.getOrElse(false)
      }
    def contention(who: String): Nothing =
      throw new java.util.ConcurrentModificationException(
        s"$table already has an active writer ($who). Its store is " +
          s"single-writer: concurrent appends/compactions corrupt " +
          s"silently (double-claimed novel rows, interleaved " +
          s"generation swaps). If that writer is dead, delete the " +
          s"lease marker $lock and retry.")
    // Exclusive create of the lock with `content`; false on a FOREIGN
    // existing marker. A failure of our OWN creation (created the
    // marker, then could not write it) releases the marker and
    // rethrows, or the store would wedge on a lock naming a writer that
    // never ran.
    def tryCreate(content: Array[Byte]): Boolean =
      if (fs.getScheme == "file") {
        // Hadoop's local create(overwrite = false) is exists-then-open —
        // two racers can both pass the check; File.createNewFile is the
        // local FS's actual atomic exclusive create
        val f = new java.io.File(lock.toUri.getPath)
        Option(f.getParentFile).foreach(_.mkdirs())
        f.createNewFile() && {
          try {
            val out = new java.io.FileOutputStream(f)
            try out.write(content) finally out.close()
          } catch { case e: Throwable => f.delete(); throw e }
          true
        }
      } else {
        val created =
          try Some(fs.create(lock, /* overwrite = */ false))
          catch {
            case e: java.io.IOException =>
              if (!fs.exists(lock)) throw e // real IO failure, not contention
              None
          }
        created.exists { out =>
          try { try out.write(content) finally out.close() }
          catch { case e: Throwable => fs.delete(lock, false); throw e }
          true
        }
      }
    def tryAcquire(): Boolean = tryCreate(bytes)
    if (!tryAcquire()) {
      val who = readHolder()
      // system property first (per-JVM, spec-settable), env second
      // (per-deployment): both spell SPARK_GRAFT_LEASE_AUTOBREAK
      val autoBreak = !Seq("0", "false").contains(
        sys.props.get("SPARK_GRAFT_LEASE_AUTOBREAK")
          .orElse(sys.env.get("SPARK_GRAFT_LEASE_AUTOBREAK"))
          .getOrElse("1").toLowerCase)
      // Break a verifiably-dead holder's marker. The break must not
      // race another breaker into a double acquisition, so it is a
      // RENAME to a unique claim path — the filesystems' atomic
      // one-winner op; a plain delete could remove the marker a winning
      // breaker had already re-created, silently admitting two writers.
      // Rename cannot be made conditional on CONTENT, so after winning
      // the claim the content is verified to still be the marker that
      // was diagnosed: a live writer's fresh marker claimed by mistake
      // is restored by EXCLUSIVE create (a rename-back would OVERWRITE
      // a third writer's marker under POSIX rename semantics). The
      // residual window (diagnose → rename, with a restore needed and a
      // third writer appearing inside it) requires three simultaneous
      // writers on a store whose contract is one scheduler — the lease
      // is a safety net for that contract, not a substitute
      // coordination service.
      if (autoBreak && holderDead(who)) {
        // pid alone is not unique enough for the claim path: a crashed
        // breaker's orphaned claim plus a recycled pid would make the
        // HDFS rename return false forever (dest exists) and silently
        // un-break the store; the nanoTime nonce makes every claim fresh
        val claimed = new org.apache.hadoop.fs.Path(s"$lock.broken.${
          ProcessHandle.current().pid()}.${System.nanoTime()}")
        // a LOST race surfaces as `false` on HDFS but as an
        // IOException on the local FS (RawLocalFileSystem falls back to
        // a copy when renameTo fails, and the source is already gone) —
        // both just mean another breaker won
        val won = try fs.rename(lock, claimed)
          catch { case _: java.io.IOException => false }
        if (won) {
          // transient read failures must not leak the "unknown"
          // sentinel into a restored lock (an "unknown" marker never
          // parses as dead and would wedge the store permanently):
          // retry, and if the claimed marker stays unreadable, refuse
          // LOUDLY with the claim path kept for the operator — never
          // write back content that was not actually verified
          val got = (1 to 3).iterator.map(_ => readMarker(claimed))
            .find(_ != "unknown").getOrElse("unknown")
          if (got == "unknown") {
            // fail CLOSED, not open (r13 ADVICE): we won the rename, so
            // the — possibly LIVE — holder's marker is parked at the
            // claim path and the lock slot is EMPTY; a concurrent
            // writer could acquire the free slot while that holder
            // keeps writing. Re-close the slot first with a diagnostic
            // sentinel: it carries no pid=/host= fields, so holderDead
            // never parses it as dead and every later acquisition
            // refuses loudly until an operator inspects both paths. A
            // lost create race just means another writer closed the
            // slot — either way it is no longer free.
            tryCreate(("lease-break read-back failed; original marker " +
              s"parked at $claimed — inspect and remove both manually")
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            throw new java.util.ConcurrentModificationException(
              s"$table lease break claimed $claimed but its content " +
                "could not be read back for verification; the lock " +
                "slot was re-closed with a sentinel marker — inspect " +
                "and remove both manually, then retry.")
          }
          if (!(got == who || holderDead(got)))
            // claimed a live writer's marker: put it back if the slot
            // is still free; if a third writer took it meanwhile, the
            // conflict is already beyond local repair — refuse below
            tryCreate(got.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          fs.delete(claimed, false)
        }
        // whichever breaker won, the dead marker is gone exactly once;
        // re-attempt the normal acquisition — a loser (or a restored
        // live holder) shows up as fresh contention below
        if (!tryAcquire()) contention(readHolder())
      } else contention(who)
    }
    heldLeases.get += lock.toString
    try body finally {
      heldLeases.get -= lock.toString
      fs.delete(lock, false)
    }
  }

  /** Append `df` into an existing bucketed table, bucket-ALIGNED: the
    * bucket/sort spec is read from the catalog so an appender can never
    * diverge from the layout every probe query relies on. Appends add a
    * second file per bucket, after which Spark treats each bucket as
    * unsorted and inserts a LOCAL sort below a sort-merge probe — but
    * never an exchange: the in-place bucket read survives appends.
    */
  def appendBucketed(spark: SparkSession, df: DataFrame,
                     table: String): Unit = withWriterLease(spark, table) {
    val spec = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.getOrElse(throw new IllegalArgumentException(
        s"$table is not bucketed — appendBucketed would corrupt the " +
          "layout contract"))
    // bucket-aligned file layout (r15, the writeBucketed note): an
    // unaligned batch otherwise lands tasks × buckets files PER
    // APPEND — the amplification compactBucketed exists to undo,
    // bought down to one file per touched bucket for one batch-sized
    // exchange
    val cols = spec.bucketColumnNames
      .map(org.apache.spark.sql.functions.col)
    withSpec(df.repartition(spec.numBuckets, cols: _*)
      .write.mode("append").format("parquet"), spec)
      .saveAsTable(table)
    // the write invalidates the relation cache of DF'S session — which
    // inside foreachBatch is the streaming CLONE, not the session the
    // next probe reads through; refresh the caller's session explicitly
    // or it keeps serving the pre-append file-index snapshot
    spark.catalog.refreshTable(table)
  }

  /** Generation-swap scaffolding shared by the compaction paths:
    * compute the next `__gN` sibling of the live location, let `write`
    * land the new generation there under a staging catalog name,
    * repoint the live table through the catalog API, drop the staging
    * entry, and retire elder generations with one-generation grace.
    * The table's data is never overwritten in place — a crash at any
    * point leaves the pre-compaction generation fully live.
    */
  private def swapGeneration(spark: SparkSession, table: String)(
      write: (String, String) => Unit): Unit = {
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val oldPath = cat.getTableMetadata(ident).location.toString
      .stripSuffix("/")
    // generation-suffixed sibling: strip any prior suffix so repeated
    // compactions alternate rather than accumulate path segments
    val base = oldPath.replaceAll("__g\\d+$", "")
    val gen = "__g(\\d+)$".r.findFirstMatchIn(oldPath)
      .map(_.group(1).toLong + 1).getOrElse(1L)
    val newPath = s"${base}__g$gen"
    val tmpTable = s"${table}__compacting"
    write(newPath, tmpTable)
    // repoint through the catalog API, not string-built SQL: a location
    // containing a quote would break an interpolated ALTER TABLE mid-
    // compaction, after the new generation was already written. Stats
    // are dropped with the move (as the SQL command's updateTableStats
    // would): the new generation's size differs from the stale numbers,
    // which would otherwise steer broadcast decisions on the store
    val fresh = cat.getTableMetadata(ident)
    cat.alterTable(fresh.copy(stats = None,
      storage = fresh.storage.copy(
        locationUri = Some(new org.apache.hadoop.fs.Path(newPath).toUri))))
    // drop only the CATALOG entry of the staging name; its files are now
    // the live table's
    cat.dropTable(spark.sessionState.sqlParser
      .parseTableIdentifier(tmpTable), ignoreIfNotExists = false,
      purge = false)
    spark.catalog.refreshTable(table)
    // retire elder generations (grace: the dir retired by THIS compact
    // survives until the next one) on the location's own filesystem
    val live = new org.apache.hadoop.fs.Path(newPath)
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    val baseName = new org.apache.hadoop.fs.Path(base).getName
    val keep = Set(new org.apache.hadoop.fs.Path(oldPath).getName,
      live.getName)
    Option(fs.listStatus(live.getParent)).getOrElse(Array.empty)
      .map(_.getPath)
      .filter { p =>
        val n = p.getName
        val isGen = n == baseName || (n.startsWith(baseName + "__g") &&
          n.length > baseName.length + 3 &&
          n.drop(baseName.length + 3).forall(_.isDigit))
        isGen && !keep.contains(n)
      }
      .foreach(fs.delete(_, true))
  }

  /** Layout-only compaction of a PLAIN parquet table: rewrite the SAME
    * rows into one sorted file under a generation-swapped sibling.
    * Rows — and any logical keys they carry — are preserved exactly;
    * this exists for delta-log tables ([[LmStore]]) whose read-side
    * replay-dedup keys (content batch_ids) must SURVIVE compaction:
    * folding rows across batch_ids would erase the key that lets a
    * crash-replayed append collapse at read.
    */
  def compactPlain(spark: SparkSession, table: String,
      sortCols: Seq[String]): Unit =
    rewritePlain(spark, table, spark.table(table), sortCols)

  /** Lease-guarded, generation-swapped REWRITE of a plain table with
    * new content. `df` MAY read from the table itself: the write lands
    * in a sibling generation directory while the old generation's files
    * stay live, the catalog repoint happens only after the write
    * succeeds, and the retired directory survives with one-generation
    * grace — a crash at any point leaves the pre-rewrite table fully
    * intact. This is the mutation primitive for metadata-scale tables
    * whose content must CHANGE atomically on append
    * ([[EmbedStore]]'s cell radii); [[compactPlain]] is the identity
    * instance of it.
    */
  def rewritePlain(spark: SparkSession, table: String, df: DataFrame,
      sortCols: Seq[String]): Unit = withWriterLease(spark, table) {
    swapGeneration(spark, table) { (newPath, tmpTable) =>
      df.repartition(1)
        .sortWithinPartitions(
          sortCols.map(org.apache.spark.sql.functions.col): _*)
        .write.mode("overwrite").format("parquet")
        .option("path", newPath).saveAsTable(tmpTable)
    }
  }

  /** Lease-guarded, generation-swapped REWRITE of a BUCKETED table
    * with new content — the bucketed analog of [[rewritePlain]], for
    * the declared store-maintenance ops whose contract is the opposite
    * of compaction's row preservation (re-capping a band store's hot
    * buckets, retiring a rebuild's elder key generation). `df` MAY
    * read from the table itself: the new generation lands in a sibling
    * directory under the catalog's OWN bucket spec (so the rewrite can
    * never diverge from the layout every probe relies on) while the
    * old generation's files stay live; the catalog repoint is the
    * commit and the retired directory keeps one-generation grace — a
    * crash at any point leaves the pre-rewrite table fully intact.
    * The write runs under the same conf-locked bucketed-scan guard as
    * [[compactBucketed]] (r15 ADVICE): every declared rewrite consumer
    * (rebuildCleanup, the MinHash/SimHash rebuilds) derives `df` FROM
    * the table being rewritten, which is exactly the shape where the
    * planner elides the repartition against the scan's claimed bucket
    * partitioning, auto-disables the bucketed scan, and fragments the
    * output into tasks × buckets mixed-bucket files — silently NOT
    * restoring the one-sorted-file-per-bucket layout the rewrite
    * exists to land.
    */
  def rewriteBucketed(spark: SparkSession, table: String,
      df: DataFrame): Unit = withWriterLease(spark, table) {
    val spec = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.getOrElse(throw new IllegalArgumentException(
        s"$table is not bucketed — rewriteBucketed would drop the " +
          "layout contract"))
    swapGeneration(spark, table) { (newPath, tmpTable) =>
      bucketPureWrite(spark, df, spec, newPath, tmpTable)
    }
  }

  /** The conf-locked bucket-pure CTAS both bucketed rewrite paths
    * share. One-file-per-bucket needs each write task to own exactly
    * one bucket. A repartition on the bucket columns LOOKS right but
    * is unreliable when `df` scans the table being rewritten: the
    * planner elides the exchange against the scan's claimed bucket
    * partitioning, then auto-DISABLES the bucketed scan (nothing left
    * requires the distribution) and reads by file splits — measured:
    * mixed-bucket tasks re-fragmenting the output. Forcing the
    * bucketed scan ON instead makes the scan itself bucket-pure (one
    * partition per bucket, however many files each holds), so the
    * writer emits exactly one file per bucket with NO exchange at all.
    * The repartition stays as a correctness net for frames that do not
    * read the target (fresh content, other tables); it elides when
    * redundant. The conf save/set/restore is SESSION-global while the
    * leases are per table, so two threads rewriting different tables
    * of one session would race it (one restores "true" mid-CTAS of
    * the other → fragmented output, then the other "restores" the
    * first's "false" permanently) — serialized process-wide; rewrites
    * are maintenance, the serialization is free.
    */
  private def bucketPureWrite(spark: SparkSession, df: DataFrame,
      spec: BucketSpec, newPath: String, tmpTable: String): Unit = {
    val autoScanKey =
      "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    compactConfLock.synchronized {
      val prevAuto = spark.conf.get(autoScanKey)
      spark.conf.set(autoScanKey, "false")
      try {
        val cols = spec.bucketColumnNames
          .map(org.apache.spark.sql.functions.col)
        withSpec(df.repartition(spec.numBuckets, cols: _*)
          .write.mode("overwrite").format("parquet")
          .option("path", newPath), spec)
          .saveAsTable(tmpTable)
      } finally spark.conf.set(autoScanKey, prevAuto)
    }
  }

  /** Rewrite an appended-to bucketed table back to one sorted file per
    * bucket. Appends amortize ingest but amplify reads: every appended
    * batch adds a file per touched bucket, and past one file per bucket
    * Spark stops trusting the sort order (a local sort re-appears below
    * every sort-merge probe). Compaction writes the full table fresh to
    * a SIBLING directory (reading and overwriting the same path is
    * illegal), atomically points the catalog table at it, and retires
    * the old directory with ONE-generation grace: the dir retired NOW
    * stays on disk until the NEXT compaction (only generations older
    * than it are deleted), so a plan resolved before this compaction —
    * a lazy verdict frame, or a probe through another session whose
    * relation cache was not refreshed — still reads the files its scan
    * captured. The reader contract is therefore: re-resolve (or
    * materialize) any frame older than the PREVIOUS compaction.
    * Single-writer, like the appends it cleans up after — both enforced
    * by [[withWriterLease]], so an append racing a compaction (or
    * another append) refuses loudly instead of corrupting. All paths go
    * through the table location's own Hadoop filesystem — an hdfs:// or
    * s3a:// store compacts the same way a local one does.
    */
  def compactBucketed(spark: SparkSession,
      table: String): Unit = withWriterLease(spark, table) {
    val spec = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.getOrElse(throw new IllegalArgumentException(
        s"$table is not bucketed"))
    // the identity instance of the bucket-pure rewrite: same rows,
    // fresh one-sorted-file-per-bucket layout (see bucketPureWrite on
    // why the scan-forcing guard is load-bearing here)
    swapGeneration(spark, table) { (newPath, tmpTable) =>
      bucketPureWrite(spark, spark.table(table), spec, newPath, tmpTable)
    }
  }

  private val compactConfLock = new Object
}
