package graft

import graft.functions.Portable
import org.apache.spark.sql.functions._
class TextPackSpec extends GraftSpec {

  test("words/normText canonicalize whitespace and case") {
    import spark.implicits._
    val df = Seq("  The  QUICK  fox ", "a b", "").toDF("text")
      .select(Portable.normText(col("text")).as("n"))
    assert(df.as[String].collect().toSeq ==
      Seq("the quick fox", "a b", ""))
  }

  test("shingles3 emits distinct consecutive word triples") {
    import spark.implicits._
    val df = Seq("a b c d a b c d").toDF("text")
      .select(Portable.shingles3(Portable.words(col("text"))).as("s"))
    val got = df.as[Seq[String]].head()
    assert(got.toSet == Set("a b c", "b c d", "c d a", "d a b"))
    assert(got.size == 4) // distinct: "a b c"/"b c d" appear twice in input
  }

  test("hash60 matches a reference md5-prefix computation") {
    import spark.implicits._
    val got = Seq("abc").toDF("s")
      .select(Portable.hash60(col("s"))).as[Long].head()
    // first 15 hex chars of md5("abc") = 900150983cd24fb
    assert(got == java.lang.Long.parseLong("900150983cd24fb", 16))
  }

  test("lang_id scores sum sensibly and pred_lang is stable") {
    val df = SparkEntry.queries("lang_id")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length > 0)
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("pred_lang"))))
    val s = rows.head.getDouble(rows.head.fieldIndex("score_en"))
    assert(s >= 0.0 && s <= 1.0)
  }

  test("text_quality ratios are in [0,1] and exact-integer derived") {
    val df = SparkEntry.queries("text_quality")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val q = r.getDouble(r.fieldIndex("quality_score"))
      assert(q >= 0.0 && q <= 1.0)
      val ppm = r.getDouble(r.fieldIndex("uniq_word_ratio")) * 1e6
      // the ratio is ppm/1e6 for an integer ppm (the *1e6 round-trip here
      // reintroduces one ulp of dust, hence the tolerance)
      assert(math.abs(ppm - math.rint(ppm)) < 1e-6)
    }
  }

  test("token_count: regex tokens >= whitespace tokens") {
    val df = SparkEntry.queries("token_count")(spark, sfDir)
    val bad = df.filter(col("re_tokens") < col("ws_tokens")).count()
    assert(bad == 0)
  }

  test("pii_scrub masks every injected pattern; clean docs pass untouched") {
    val out = SparkEntry.queries("pii_scrub")(spark, sfDir).collect()
    val (clean, dirty) = out.partition(_.getLong(0) % 5 == 0)
    assert(clean.nonEmpty && dirty.nonEmpty)
    // injection plants exactly 2 emails, 1 IP, 1 phone per dirty doc
    dirty.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_emails")) == 2L)
      assert(r.getLong(r.fieldIndex("n_ips")) == 1L)
      assert(r.getLong(r.fieldIndex("n_phones")) == 1L)
    }
    // the zero-match path: untouched text, fingerprint = md5(original)
    val originals = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    clean.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_emails")) == 0L &&
        r.getLong(r.fieldIndex("n_ips")) == 0L &&
        r.getLong(r.fieldIndex("n_phones")) == 0L)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(originals(r.getLong(0)).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(r.getString(r.fieldIndex("clean_fp")) == md)
    }
  }

  test("fingerprint: md5 and poly hash agree with a JVM-side recompute") {
    val df = SparkEntry.queries("fingerprint")(spark, sfDir).limit(5)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    df.collect().foreach { r =>
      val norm = docs(r.getLong(0)).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty).mkString(" ")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(norm.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(r.fieldIndex("fp_md5")) == md)
      val poly = norm.foldLeft(0L)((h, c) => (h * 31 + c.toInt) % Portable.P)
      assert(r.getLong(r.fieldIndex("fp_poly")) == poly)
    }
  }

  test("bpe_pairs counts adjacent pairs exactly on a planted corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b c"),   // pairs: (a b)x2, (b a), (b c)
      (2L, "a b"),          // (a b)
      (3L, "solo")          // < 2 words -> contributes nothing
    ).toDF("doc_id", "text")
    val got = graft.operators.TextPack.bpePairsOver(docs, topK = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    // ordered by (cnt DESC, pair ASC): the total order is deterministic
    assert(got == Seq("a b" -> 3L, "b a" -> 1L, "b c" -> 1L))
  }

  test("bpe merge fold: greedy left-to-right, overlap-safe on a==b") {
    import spark.implicits._
    val docs = Seq((1L, "x x x"), (2L, "x x x x"), (3L, "y x x z"))
      .toDF("doc_id", "text")
    val d0 = graft.operators.TextPack.bpeTokens(docs)
    val top = graft.operators.TextPack.bpeTopPair(d0)
    assert(top.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      == Seq(("x", "x", 6L)), "pair (x,x) occurs 2+3+1 times")
    val merged = graft.operators.TextPack.bpeMerge(d0, top).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    // greedy: "x x x" -> [x+x, x]; "x x x x" -> [x+x, x+x]
    assert(merged(1L) == List("x+x", "x"))
    assert(merged(2L) == List("x+x", "x+x"))
    assert(merged(3L) == List("y", "x+x", "z"))
  }

  test("bpe_train: two rounds match a JVM-side BPE recompute at sf0.001") {
    def toks(t: String) =
      t.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).toList
    def pairCount(ds: Seq[List[String]]) = {
      val m = scala.collection.mutable.Map.empty[(String, String), Long]
      ds.foreach(w => w.sliding(2).filter(_.size == 2).foreach { p =>
        val k = (p(0), p(1)); m(k) = m.getOrElse(k, 0L) + 1
      })
      m.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head
    }
    def merge(w: List[String], a: String, b: String): List[String] =
      w.foldLeft(List.empty[String]) { (acc, t) =>
        if (acc.nonEmpty && acc.last == a && t == b)
          acc.init :+ (a + "+" + b)
        else acc :+ t
      }
    var ds = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect().map(r => toks(r.getString(0)))
      .filter(_.nonEmpty).toSeq
    val expected = (1 to 2).map { r =>
      val ((a, b), cnt) = pairCount(ds)
      ds = ds.map(w => merge(w, a, b))
      (r.toLong, s"$a $b", cnt, ds.map(_.size.toLong).sum)
    }
    val got = SparkEntry.queries("bpe_train")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
  }

  test("bpe_pairs at sf0.001 matches a JVM-side pair count") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).toLowerCase.trim.split("\\s+").filter(_.nonEmpty))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.filter(_.length >= 2).foreach { w =>
      w.sliding(2).foreach { p =>
        val k = p.mkString(" "); counts(k) = counts.getOrElse(k, 0L) + 1
      }
    }
    val expected = counts.toSeq
      .sortBy { case (p, c) => (-c, p) }.take(100)
    val got = SparkEntry.queries("bpe_pairs")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == expected)
  }

  test("BpeStore: frozen merges encode a later batch exactly as the " +
      "in-query rounds; a pairless corpus trains an empty table") {
    import spark.implicits._
    val ref = Seq(
      (1L, "lo rem ip sum lo rem do lor"),
      (2L, "lo rem sit am et lo rem"),
      (3L, "con sec te tur lo rem")).toDF("doc_id", "text")
    val base = s"graft_bpe_spec_${System.nanoTime()}"
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpe_spec").toString
    try {
      graft.sources.BpeStore.write(ref, base, dir)
      // the stored merges are the two greedily-learned rounds:
      // "lo rem" dominates round 1; round 2 merges the next best pair
      val merges = spark.table(s"${base}_merges")
        .orderBy("round").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(merges.length == 2)
      assert((merges(0)._2, merges(0)._3) == ("lo", "rem"))
      // a LATER batch (never seen in training) encodes through the
      // frozen merges — the serving contract: "lo rem" fuses, novel
      // tokens pass through untouched
      val batch = Seq((10L, "lo rem novel to ken lo rem")).toDF(
        "doc_id", "text")
      val enc = graft.sources.BpeStore.encode(spark, base, batch)
        .collect().head
      assert(enc.getAs[Long]("n_tokens_in") == 7L)
      // two "lo rem" fusions: 7 tokens -> 5 (round 2's pair may or may
      // not occur in this batch; it cannot fuse more than one more)
      assert(enc.getAs[Long]("n_tokens_out") <= 5L &&
        enc.getAs[Long]("n_tokens_out") >= 4L)
      // and the encoding is a pure function: re-encoding matches
      val again = graft.sources.BpeStore.encode(spark, base, batch)
        .collect().head
      assert(enc.toString == again.toString)
      // degenerate reference: single-token docs have no pairs — the
      // store trains an EMPTY merge table and encoding is identity
      val base2 = s"${base}b"
      graft.sources.BpeStore.write(
        Seq((1L, "solo"), (2L, "alone")).toDF("doc_id", "text"),
        base2, s"$dir/b")
      assert(spark.table(s"${base2}_merges").count() == 0)
      val id = graft.sources.BpeStore.encode(spark, base2, batch)
        .collect().head
      assert(id.getAs[Long]("n_tokens_out") == 7L)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${base}_merges")
      spark.sql(s"DROP TABLE IF EXISTS ${base}b_merges")
      graft.Caches.deleteDir(dir)
    }
  }

  test("bpeTrainMerges: 10 iterated rounds match a JVM-side BPE " +
      "recompute; rounds=2 equals the unrolled spelling; a dry corpus " +
      "stops early") {
    import spark.implicits._
    def pairCount(ds: Seq[List[String]]) = {
      val m = scala.collection.mutable.Map.empty[(String, String), Long]
      ds.foreach(w => w.sliding(2).filter(_.size == 2).foreach { p =>
        val k = (p(0), p(1)); m(k) = m.getOrElse(k, 0L) + 1
      })
      m.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
    }
    def merge(w: List[String], a: String, b: String): List[String] =
      w.foldLeft(List.empty[String]) { (acc, t) =>
        if (acc.nonEmpty && acc.last == a && t == b)
          acc.init :+ (a + "+" + b)
        else acc :+ t
      }
    def jvmTrain(corpus: Seq[List[String]], rounds: Int)
        : Seq[(String, String, Long)] = {
      var ds = corpus
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long)]
      var dry = false
      while (out.length < rounds && !dry) pairCount(ds) match {
        case None => dry = true
        case Some(((a, b), c)) =>
          out += ((a, b, c)); ds = ds.map(w => merge(w, a, b))
      }
      out.toSeq
    }
    // planted corpus with a deep merge cascade: repeated runs force
    // multi-round fusions (x y -> x+y; x+y z -> ...), so 10 rounds
    // exercise merged-token-as-unit behavior, not just 10 disjoint pairs
    val texts = Seq(
      "x y z x y z x y z w",
      "x y z w x y z w q r",
      "q r s q r s x y q r",
      "m n m n m n x y z w",
      "s t u s t u q r s t")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
    val corpus = texts.map(_.split(" ").toList)
    val got10 = operators.TextPack.bpeTrainMerges(docs, 10)
    assert(got10 == jvmTrain(corpus, 10),
      s"iterated trainer diverged from the JVM recompute:\n$got10")
    assert(got10.length == 10, "the cascade corpus supports 10 rounds")
    // rounds=2 is bit-for-bit the unrolled E8 spelling (the contract
    // that keeps BpeStore.write on the 2-round oracle)
    val d0 = operators.TextPack.bpeTokens(docs)
    val t1 = operators.TextPack.bpeTopPair(d0)
    val unrolled1 = t1.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).head
    val t2 = operators.TextPack
      .bpeTopPair(operators.TextPack.bpeMerge(d0, t1))
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2))).head
    assert(operators.TextPack.bpeTrainMerges(docs, 2)
      == Seq(unrolled1, t2))
    // a corpus that runs dry stops early instead of looping
    val tiny = Seq((1L, "a b")).toDF("doc_id", "text")
    val dry = operators.TextPack.bpeTrainMerges(tiny, 10)
    assert(dry == Seq(("a", "b", 1L)),
      "after merging the only pair the trainer must stop")
    // the loop frees every round's localCheckpoint EAGERLY (it cannot
    // rely on ContextCleaner GC slack): no per-round frame survives
    assert(spark.sparkContext.getPersistentRDDs.keySet
        .subsetOf(rddsBefore),
      "bpeTrainMerges leaked per-round checkpointed frames: " +
        (spark.sparkContext.getPersistentRDDs.keySet -- rddsBefore)
          .mkString(", "))
  }

  test("BpeStore: a malformed store with two distinct pairs for one " +
      "round fails loudly naming the round (never silently applies " +
      "either in arbitrary order)") {
    import spark.implicits._
    val ref = Seq(
      (1L, "lo rem ip sum lo rem do lor"),
      (2L, "lo rem sit am et lo rem")).toDF("doc_id", "text")
    val base = s"graft_bpe_mal_${System.nanoTime()}"
    val dir = java.nio.file.Files
      .createTempDirectory("graft_bpe_mal").toString
    try {
      graft.sources.BpeStore.write(ref, base, dir)
      // corrupt the store: a CONFLICTING pair lands under round 2 (a
      // torn overwrite's byte-identical duplicates are fine and
      // absorbed; two different pairs for one round are not)
      Seq((2L, "zz", "yy")).toDF("round", "a", "b")
        .write.mode("append").format("parquet")
        .saveAsTable(s"${base}_merges")
      spark.catalog.refreshTable(s"${base}_merges")
      val batch = Seq((10L, "lo rem zz yy")).toDF("doc_id", "text")
      val e = intercept[IllegalArgumentException] {
        graft.sources.BpeStore.encode(spark, base, batch)
      }
      assert(e.getMessage.contains("malformed BPE store"))
      assert(e.getMessage.contains("2"))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${base}_merges")
      graft.Caches.deleteDir(dir)
    }
  }

  test("tokenizer_stats reconciles with the per-doc encode frame and " +
      "merges only ever compress") {
    import org.apache.spark.sql.functions.col
    val stats = SparkEntry.queries("tokenizer_stats")(spark, sfDir)
      .collect()
    val langOf = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val enc = SparkEntry.queries("bpe_encode")(spark, sfDir).collect()
      .groupBy(r => langOf(r.getAs[Long]("doc_id")))
    stats.foreach { r =>
      val lang = r.getAs[String]("lang")
      val rows = enc(lang)
      assert(r.getAs[Long]("n_docs") == rows.length.toLong)
      assert(r.getAs[Long]("tokens_in")
        == rows.map(_.getAs[Long]("n_tokens_in")).sum)
      assert(r.getAs[Long]("tokens_out")
        == rows.map(_.getAs[Long]("n_tokens_out")).sum)
      // a BPE merge can only shrink a token stream
      assert(r.getAs[Long]("compression_ppm") <= 1000000L)
    }
    assert(stats.map(_.getAs[String]("lang")).toSet == enc.keySet)
    // and the report is not vacuous: the learned merges fired somewhere
    assert(stats.exists(_.getAs[Long]("compression_ppm") < 1000000L))
  }
}
