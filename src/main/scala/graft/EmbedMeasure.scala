package graft

import graft.sources.EmbedStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Repeatable EmbedStore measurement harness (r15 — the r14 verdict's
  * task 6): the r14 inline/slim write-wall A/B ran both layouts ONCE in
  * one session, inline first, so the inline number carried the JVM/JIT
  * and shuffle-service warm-up for both (SCALING.md flagged it; only
  * the storage and probe rows were quotable). This main makes the
  * write wall quotable:
  *
  *  - layouts ALTERNATE (`is` = inline,slim,inline,… / `si` starts
  *    slim), `reps` rounds per layout, every rep on a FRESH store base
  *    so no rep reads a prior rep's files;
  *  - rep 1 of each layout absorbs the warm-up; quote the medians of
  *    reps ≥ 2, and run the harness twice with opposite orders
  *    (`is` then `si`) — agreement across orders is the deconfounding
  *    signal;
  *  - the growth/rebuild phase (G append generations, bucket stats,
  *    the staged rebuild wall) re-measures the r15 generation-atomic
  *    rebuild, whose serve-through costs one extra `_bands` write over
  *    the r14 tear-down rebuild it replaced.
  *
  * Corpus: deterministic hash-direction vectors (the spec fixture
  * formula) — HIST/BATCH 10k × 64-dim across 20 equal labels, the r14
  * shape. Usage:
  *   runMain graft.EmbedMeasure [is|si] [reps] [n]
  *   runMain graft.EmbedMeasure probe [n]     (fresh-session re-probe
  *     of a kept growth store — resolves emeas_growth via the
  *     persistent catalog, no path operand)
  * Output: the r14 artifact's line format (WALL/BYTES/BUCKETS/...),
  * one WALL line per rep, so docs/SCALING.md rows diff directly.
  */
object EmbedMeasure {

  private def wall[T](body: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Deterministic 64-dim unit directions, `labels` equal blocks. */
  private def vecs(spark: SparkSession, n: Long, idOff: Long,
      seedOff: Long, labels: Int): DataFrame = {
    import org.apache.spark.sql.types.FloatType
    val dim = 64
    // xxhash64-mixed bytes, normalized — deterministic random-ish
    // directions without ANSI long-multiply overflow
    val comps = (0 until dim).map { j =>
      (shiftrightunsigned(
        xxhash64(lit(seedOff) + col("id"), lit(j)), 40)
        .bitwiseAND(lit(255L))).cast("double") - lit(127.5)
    }
    spark.range(n)
      .withColumn("v0", array(comps: _*))
      .withColumn("nrm", sqrt(aggregate(col("v0"), lit(0.0),
        (acc, x) => acc + x * x)))
      .select((col("id") + lit(idOff)).as("vec_id"),
        (col("id") % lit(labels.toLong)).cast("int").as("label"),
        transform(col("v0"), x => (x / col("nrm")).cast(FloatType))
          .as("embedding"))
  }

  private def duBytes(path: String): Long = {
    val p = new java.io.File(path)
    if (!p.exists()) 0L
    else if (p.isFile) p.length()
    else Option(p.listFiles()).getOrElse(Array.empty)
      .map(f => duBytes(f.getPath)).sum
  }

  def main(args: Array[String]): Unit = {
    val order = args.headOption.getOrElse("is")
    // measurement-path operands parse AFTER the mode dispatch: probe
    // mode's operand (an optional [n]) is NOT a reps count, and the
    // old unconditional args(1).toInt threw before the probe branch
    // could run (r15 ADVICE)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.expressions.GraftFunctions.register(spark)
    if (order == "probe") {
      // fresh-session probe of a kept growth store (attribution mode);
      // the store resolves via the persistent catalog — the only
      // operand is the corpus size the growth run used
      val n = args.lift(1).map(_.toLong).getOrElse(10000L)
      val batch0 = vecs(spark, n, 1000000L, 9000L, 20)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      batch0.count()
      def p0(): Long = EmbedStore
        .bandedDedupAgainst(spark, "emeas_growth", batch0)
        .filter(col("n_hist_matches") > 0).count()
      val (_, c) = wall(p0()); val (_, s1) = wall(p0())
      val (_, s2) = wall(p0())
      println(f"WALL fresh-session rebuilt-store probe cold $c%.2f s steady $s1%.2f / $s2%.2f s")
      println("MEASURE DONE")
      spark.stop()
      return
    }
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val n = args.lift(2).map(_.toLong).getOrElse(10000L)
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-embed-measure").toString
    val hist = vecs(spark, n, 0L, 1000L, 20)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val batch = vecs(spark, n, 1000000L, 9000L, 20)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"HIST n=${hist.count()} BATCH n=${batch.count()} order=$order reps=$reps")

    def cleanup(base: String): Unit =
      Seq("cells", "lists", "bands", "bbits", "bvecs").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS ${base}_$s"))

    val layouts = (1 to reps).flatMap(_ =>
      if (order == "si") Seq("slim", "inline") else Seq("inline", "slim"))
    var lastBase = Map.empty[String, String]
    layouts.zipWithIndex.foreach { case (layout, i) =>
      val base = s"emeas_${layout}_$i"
      spark.conf.set(GraftConf.BandStoreLayoutKey, layout)
      val (_, w) = wall(EmbedStore.write(hist, base, s"$tmp/$base"))
      println(f"WALL write $layout rep${i / 2 + 1} $w%.2f s")
      lastBase.get(layout).foreach(cleanup) // keep only the newest
      lastBase += layout -> base
    }
    spark.conf.unset(GraftConf.BandStoreLayoutKey)
    // storage + probe on the LAST store of each layout
    val ib = lastBase("inline"); val sb = lastBase("slim")
    println("BYTES lists=" + duBytes(s"$tmp/$ib/lists") +
      " inline_bands=" + duBytes(s"$tmp/$ib/bands") +
      " slim_bands=" + duBytes(s"$tmp/$sb/bands") +
      " slim_bvecs=" + duBytes(s"$tmp/$sb/bvecs"))
    def probe(base: String): Long =
      EmbedStore.bandedDedupAgainst(spark, base, batch)
        .filter(col("n_hist_matches") > 0).count()
    val (mi, pic) = wall(probe(ib))
    val (_, pis) = wall(probe(ib))
    val (ms, psc) = wall(probe(sb))
    val (_, pss) = wall(probe(sb))
    println(f"WALL probe inline cold $pic%.2f s steady $pis%.2f s")
    println(f"WALL probe slim cold $psc%.2f s steady $pss%.2f s")
    println(s"VERDICTS equal=${mi == ms} matched=$mi")

    // growth + the r15 generation-atomic rebuild. The slim conf stays
    // SET through the rebuild: rebuildBandedLeg under a conf whose
    // layout differs from the store's is a DECLARED LAYOUT MIGRATION
    // (tear-down path, re-lands the other layout) — the first version
    // of this harness unset it here and silently measured that
    // migration instead of the atomic same-layout rebuild (found when
    // the "rebuilt" store probed 1.9× slower: it had become INLINE)
    val gb = "emeas_growth"
    spark.conf.set(GraftConf.BandStoreLayoutKey, "slim")
    val (_, gw) = wall(EmbedStore.write(hist, gb, s"$tmp/$gb"))
    println(f"WALL write growth hist $gw%.2f s")
    def buckets(tag: String): Unit = {
      val r = spark.table(s"${gb}_bands").groupBy("bkey")
        .agg(count(lit(1)).as("c"))
        .agg(max(col("c")), expr("percentile_approx(c, 0.99)"),
          sum(col("c"))).collect()(0)
      println(s"BUCKETS $tag max=${r.getLong(0)} p99=${r.get(1)} " +
        s"rows=${r.getLong(2)}")
    }
    buckets("G=0")
    (1 to 4).foreach { g =>
      val app = vecs(spark, n / 5, 2000000L + g * 100000L,
        777L * g, 20)
      val (_, aw) = wall(EmbedStore.append(spark, gb, app))
      println(f"WALL append G=$g $aw%.2f s")
      buckets(s"G=$g")
    }
    val (_, prePW) = wall(probe(gb))
    val (_, prePW2) = wall(probe(gb))
    println(f"WALL growth probe pre-rebuild cold $prePW%.2f s steady $prePW2%.2f s")
    val (_, rw) = wall(EmbedStore.rebuildBandedLeg(spark, gb))
    println(f"WALL rebuildBandedLeg (r15 atomic serve-through) $rw%.2f s")
    println(s"LAYOUT post-rebuild slim=" + !spark.table(s"${gb}_bands")
      .columns.contains("hv"))
    buckets("rebuilt")
    val (_, postPW) = wall(probe(gb))
    val (_, postPW2) = wall(probe(gb))
    println(f"WALL growth probe post-rebuild cold $postPW%.2f s steady $postPW2%.2f s")
    // fresh-JVM attribution probe (r15): the in-session post-rebuild
    // probe reads slower than pre while index-shape accounting predicts
    // the opposite; re-probing the SAME rebuilt store from a fresh
    // session separates session aging from index shape. Keep the store
    // (a second invocation finds it through the persistent catalog):
    //   runMain graft.EmbedMeasure probe
    println(s"GROWTH STORE kept at $tmp/$gb (tables ${gb}_*)")
    spark.conf.unset(GraftConf.BandStoreLayoutKey)
    // in-session CONTROL: re-probe the untouched slim A/B store after
    // all the rebuild activity — if its steady wall inflated by the
    // same factor, the post-rebuild delta above is session aging, not
    // index shape
    val (_, ctl1) = wall(probe(sb))
    val (_, ctl2) = wall(probe(sb))
    println(f"WALL control re-probe untouched slim store cold $ctl1%.2f s steady $ctl2%.2f s (earlier steady $pss%.2f s)")
    // second control: FRESH WRITE of the grown 18k history (same bits
    // rung the rebuild derived, zero rebuild machinery) — separates
    // "the bits-8 index probes slower at this corpus" from "the
    // rebuild produced a slow table"
    val grownHist = hist.unionByName((1 to 4).map(g =>
      vecs(spark, n / 5, 2000000L + g * 100000L, 777L * g, 20))
      .reduce(_ unionByName _))
    spark.conf.set(GraftConf.BandStoreLayoutKey, "slim")
    EmbedStore.write(grownHist, "emeas_fresh18k", s"$tmp/fresh18k")
    spark.conf.unset(GraftConf.BandStoreLayoutKey)
    val (_, f1) = wall(probe("emeas_fresh18k"))
    val (_, f2) = wall(probe("emeas_fresh18k"))
    println(f"WALL fresh-write 18k-history probe cold $f1%.2f s steady $f2%.2f s")
    // physical diff: table inventories + executed plans of the two
    def inv(base: String): Unit = Seq("bands", "bvecs").foreach { t =>
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(s"${base}_$t"))
      val loc = new java.io.File(new java.net.URI(meta.location.toString))
      val files = Option(loc.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith(".parquet"))
      println(s"INV ${base}_$t rows=${spark.table(s"${base}_$t").count()} " +
        s"files=${files.length} bytes=${files.map(_.length).sum} " +
        s"loc=${loc.getName}")
    }
    inv(gb); inv("emeas_fresh18k")
    def planOf(base: String): String = EmbedStore
      .bandedDedupAgainst(spark, base, batch)
      .queryExecution.executedPlan.toString
    val pg = planOf(gb); val pf = planOf("emeas_fresh18k")
    println("PLAN growth-store:\n" + pg)
    println("PLAN fresh-store:\n" + pf)
    println("MEASURE DONE")
    spark.stop()
  }
}
