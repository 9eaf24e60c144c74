package graft

import graft.expressions.Log2FixImpl
import graft.operators.SearchPack
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Block I (search & LM scoring) + G14 Log2FixQ20.
  *
  * The three queries are verified by FULL independent JVM recomputes of
  * the scores at sf0.001 (model training included), on top of the
  * DuckDB hash-match oracles the driver runs — the JVM recompute proves
  * the SPARK side against a third implementation, so a shared
  * misreading of the scoring definition in both SQL dialects would
  * still be caught.
  */
class SearchPackSpec extends GraftSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  // ---- G14: the fixed-point log kernel ----

  test("log2q20 is exact on powers of two") {
    for (k <- 0 to 62) {
      assert(Log2FixImpl.log2q20(1L << k) == k.toLong << 20, s"2^$k")
    }
  }

  test("log2q20 tracks true log2 within the truncation bias") {
    val p = Prop.forAll(Gen.chooseNum(1L, Long.MaxValue)) { x =>
      val got = Log2FixImpl.log2q20(x) / 1048576.0
      val want = math.log(x.toDouble) / math.log(2.0)
      // digit recurrence truncates, so the result sits just below the
      // true log (up to ~20 half-ulp truncations + the e>30 normalize)
      got <= want + 1e-9 && got >= want - 1e-4
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  test("log2q20 rejects non-positive input loudly") {
    intercept[IllegalArgumentException](Log2FixImpl.log2q20(0L))
    intercept[IllegalArgumentException](Log2FixImpl.log2q20(-5L))
  }

  test("log2q20's int64 recurrence equals the arbitrary-precision " +
      "digit recurrence over the fuzz distribution (tools/log2_fuzz.py " +
      "promoted in-suite)") {
    // Line-for-line BigInt mirror of the recurrence: if any int64
    // intermediate could overflow or shift wrong, THIS is where it
    // diverges — BigInt never wraps. (The DuckDB CTE half of the fuzz
    // stays in tools/; the engine gate already exercises it on every
    // oracle run through the I1-I3/I7 rows.)
    def ref(x: Long): Long = {
      require(x > 0)
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      var y = BigInt(x)
      y = if (e <= 30) y << (30 - e) else y >> (e - 30)
      var acc = BigInt(0)
      for (_ <- 0 until 20) {
        val y2 = y * y
        if (y2 >= (BigInt(1) << 61)) { acc = 2 * acc + 1; y = y2 >> 31 }
        else { acc = 2 * acc; y = y2 >> 30 }
      }
      ((BigInt(e) << 20) + acc).toLong
    }
    // the fuzz's edge band: 1..64, all powers of two, MaxValue
    // neighborhood — plus a log-uniform sweep (small and huge
    // magnitudes both appear; uniform-over-int64 would never draw a
    // small value)
    val edge = (1L to 64L) ++ (0 to 62).map(1L << _) ++
      (0 to 7).map(Long.MaxValue - _)
    edge.foreach(x =>
      assert(Log2FixImpl.log2q20(x) == ref(x), s"edge x=$x"))
    val logUniform = for {
      bits <- Gen.chooseNum(1, 63)
      x <- Gen.chooseNum(
        if (bits == 1) 1L else 1L << (bits - 1),
        if (bits == 63) Long.MaxValue else (1L << bits) - 1)
    } yield x
    val p = Prop.forAll(logUniform) { x =>
      Log2FixImpl.log2q20(x) == ref(x)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), p)
    assert(res.passed, res.status.toString)
  }

  test("log2q20 native expression matches the JVM impl through codegen") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val xs = Seq(1L, 2L, 3L, 7L, 1000000L, (1L << 40) + 12345L,
      Long.MaxValue)
    val got = xs.toDF("x")
      .select(col("x"), graft.functions.Portable.log2q20(col("x")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach(x => assert(got(x) == Log2FixImpl.log2q20(x)))
  }

  // ---- shared JVM-side corpus model ----

  private lazy val corpus: Seq[(Long, Array[String])] = {
    import org.apache.spark.sql.functions.col
    sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
      .toSeq.sortBy(_._1)
  }
  private lazy val scorable = corpus.filter(_._2.nonEmpty)
  private lazy val nDocs = scorable.size.toLong
  private lazy val totTokens = scorable.map(_._2.length.toLong).sum
  private def lg(x: Long) = Log2FixImpl.log2q20(x)

  // ---- I1: lm_score ----

  test("lm_score equals a full JVM bigram-LM recompute") {
    val uni = scorable.flatMap(_._2).groupBy(identity)
      .map { case (w, o) => w -> o.size.toLong }
    val v = uni.size.toLong
    val bigDocs = scorable.filter(_._2.length >= 2)
    val c12 = bigDocs.flatMap { case (_, w) => w.sliding(2) }
      .map(p => (p(0), p(1))).groupBy(identity)
      .map { case (p, o) => p -> o.size.toLong }
    val want = bigDocs.map { case (id, w) =>
      val costs = w.sliding(2).map { p =>
        lg(uni(p(0)) + v) - lg(c12((p(0), p(1))) + 1L)
      }.toSeq
      val xent = costs.sum
      val n = costs.size.toLong
      (id, n, xent, xent * 1000L / (n * 1048576L))
    }
    val got = q("lm_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    // typical corpus text must land in a sane band (mechanism check:
    // ~31-word vocab → at most 5 bits/token, smoothing keeps it > 0)
    assert(want.forall { case (_, _, _, mb) => mb > 0 && mb < 6000 })
  }

  // ---- I2: bm25_search ----

  test("bm25_search equals a full JVM BM25 recompute") {
    val terms = Set("spark", "hash", "merge", "vector", "stream")
    val tf = scorable.flatMap { case (id, w) =>
      w.filter(terms).groupBy(identity)
        .map { case (t, o) => (id, t, o.size.toLong, w.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, o) => t -> o.size.toLong }
    val scored = tf.map { case (id, t, f, dl) =>
      val idf = BigInt(lg(nDocs + 1L) - lg(df(t)))
      val s = idf * (BigInt(22) * f * totTokens) /
        (BigInt(10) * f * totTokens + BigInt(3) * totTokens +
          BigInt(9) * dl * nDocs)
      (id, s.toLong)
    }
    val want = scored.groupBy(_._1)
      .map { case (id, o) => (id, o.size.toLong, o.map(_._2).sum) }
      .toSeq.sortBy { case (id, _, s) => (-s, id) }.take(20)
    val got = q("bm25_search").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.forall(_._3 > 0))
  }

  // ---- I3: keyword_extract ----

  test("keyword_extract equals a JVM tf-idf top-3 recompute") {
    val post = scorable.flatMap { case (id, w) =>
      w.groupBy(identity).map { case (t, o) => (id, t, o.size.toLong) }
    }
    val df = post.groupBy(_._2).map { case (t, o) => t -> o.size.toLong }
    val want = post
      .map { case (id, t, f) =>
        (id, t, f, f * (lg(nDocs + 1L) - lg(df(t)))) }
      .groupBy(_._1).toSeq
      .flatMap { case (_, rows) =>
        rows.sortBy { case (_, t, _, s) => (-s, t) }.take(3) }
      .sortBy { case (id, t, _, s) => (id, -s, t) }
    val got = q("keyword_extract").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    assert(got.groupBy(_._1).values.forall(_.size <= 3))
  }

  test("search postings warm frame is registered") {
    assert(SearchPack.warm.map(_._1).contains("search_postings"))
  }

  // ---- I6: phrase_search ----

  /** JVM stride-1 phrase occurrence count over a token array. */
  private def phraseCount(w: Seq[String], phrase: Seq[String]): Long =
    if (w.length < phrase.length) 0L
    else w.sliding(phrase.length).count(_ == phrase).toLong

  test("phrase_search equals a JVM sliding-window recompute") {
    val want = scorable
      .map { case (id, w) => id -> phraseCount(w, SearchPack.phraseTerms) }
      .filter(_._2 > 0).sortBy(_._1)
    val got = q("phrase_search").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "the registry phrase must actually occur")
  }

  // ---- I7: collocations ----

  test("collocations equals a JVM exact-PMI recompute") {
    val uni = scorable.flatMap(_._2).groupBy(identity)
      .map { case (w, o) => w -> o.size.toLong }
    val t = uni.values.sum
    val big = scorable.filter(_._2.length >= 2)
      .flatMap { case (_, w) => w.sliding(2) }
      .map(p => (p(0), p(1))).groupBy(identity)
      .map { case (p, o) => p -> o.size.toLong }
    val b = big.values.sum
    val want = big.toSeq.filter(_._2 >= 5L)
      .map { case ((w1, w2), c12) =>
        (w1, w2, c12,
          lg(c12) - lg(b) + 2L * lg(t) - lg(uni(w1)) - lg(uni(w2)))
      }
      .sortBy { case (w1, w2, _, pmi) => (-pmi, w1, w2) }
      .take(50)
    val got = q("collocations").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("phrase_search counts overlapping occurrences and longer chains") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),               // "a a" overlaps: 3 occurrences
      (2L, "x table value y table value"),
      (3L, "value table"),           // reversed order: no hit
      (4L, "a b a b a"),             // "a b a" at starts 0 and 2
      (5L, "")).toDF("doc_id", "text")
    def m(phrase: Seq[String]) =
      SearchPack.phraseHitsOf(docs, phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(Seq("a", "a")) == Map(1L -> 3L))
    assert(m(Seq("table", "value")) == Map(2L -> 2L))
    assert(m(Seq("a", "b", "a")) == Map(4L -> 2L))
    assert(m(Seq("nope")) == Map.empty)
  }

  // ---- I8: doc_similarity ----

  /** Brute-force τ-join: the same weight/dot/norm arithmetic with NO
    * prefix filter — every pair sharing a term. Equality at several τ
    * proves the prefix filter's candidate generation misses nothing
    * (the cross-engine gate separately re-proves the arithmetic).
    */
  private def bruteSim(p: org.apache.spark.sql.DataFrame, tau: Double) = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    import org.apache.spark.sql.Column
    def recon(s1: Column, s2: Column, s3: Column): Column =
      s1.cast(DoubleType) * lit(1099511627776.0) +
        s2.cast(DoubleType) * lit(1048576.0) + s3.cast(DoubleType)
    val totals = broadcast(
      p.select(col("doc_id")).distinct().agg(count(lit(1)).as("n")))
    val dfTab = p.groupBy(col("word")).agg(count(lit(1)).as("df"))
    val w = p.join(dfTab, Seq("word")).crossJoin(totals)
      .select(col("doc_id"), col("word"),
        (col("tf") * (functions.Portable.log2q20(col("n") + lit(1L)) -
          functions.Portable.log2q20(col("df")))).as("w"))
      .withColumn("hi", shiftrightunsigned(col("w"), 20))
      .withColumn("lo", col("w").bitwiseAND(lit((1L << 20) - 1)))
    val n2 = w.groupBy(col("doc_id"))
      .agg(sum(col("hi") * col("hi")).as("s1"),
        sum(col("hi") * col("lo") + col("lo") * col("hi")).as("s2"),
        sum(col("lo") * col("lo")).as("s3"))
      .select(col("doc_id"),
        recon(col("s1"), col("s2"), col("s3")).as("n2"))
    w.select(col("doc_id").as("doc_a"), col("word"),
        col("hi").as("a_hi"), col("lo").as("a_lo"))
      .join(w.select(col("doc_id").as("doc_b"), col("word"),
        col("hi").as("b_hi"), col("lo").as("b_lo")), Seq("word"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("a_hi") * col("b_hi")).as("s1"),
        sum(col("a_hi") * col("b_lo") + col("a_lo") * col("b_hi"))
          .as("s2"),
        sum(col("a_lo") * col("b_lo")).as("s3"))
      .select(col("doc_a"), col("doc_b"),
        recon(col("s1"), col("s2"), col("s3")).as("dot"))
      .join(n2.select(col("doc_id").as("doc_a"), col("n2").as("na")),
        Seq("doc_a"))
      .join(n2.select(col("doc_id").as("doc_b"), col("n2").as("nb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6)
          .as("cos_sim"))
      .filter(col("cos_sim") >= tau)
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("doc_similarity prefix filter equals brute force at several " +
      "thresholds on sf0.001") {
    import org.apache.spark.sql.functions._
    val p = SearchPack.postingsOf(
        sources.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("word"), col("tf"))
    for (tau <- Seq(0.8, 0.85, 0.9)) {
      val pruned = pairSet(SearchPack.docSimilarityOver(p, tau))
      val brute = pairSet(bruteSim(p, tau))
      assert(pruned == brute, s"tau=$tau: " +
        s"missed=${(brute -- pruned).take(5)} " +
        s"extra=${(pruned -- brute).take(5)}")
      assert(brute.nonEmpty, s"tau=$tau vacuous on sf0.001")
    }
  }

  test("doc_similarity finds a planted exact duplicate at cos 1.0 and " +
      "keeps disjoint docs out") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "spark table scan merge window batch"),
      (2L, "spark table scan merge window batch"), // exact dup of 1
      (3L, "completely different words entirely unrelated here"),
      (4L, "spark table scan merge window group")) // near 1/2
      .toDF("doc_id", "text")
    val p = SearchPack.postingsOf(docs)
      .select(col("doc_id"), col("word"), col("tf"))
    val got = pairSet(SearchPack.docSimilarityOver(p, 0.8))
    assert(got.exists(t => t._1 == 1L && t._2 == 2L && t._3 == 1.0))
    assert(!got.exists(t => t._1 == 3L || t._2 == 3L))
    assert(got == pairSet(bruteSim(p, 0.8)))
  }

  test("ccnet_buckets: value-thresholded terciles cover each language " +
      "at the exact rank bounds; keep drops exactly the tail") {
    val rows = SparkEntry.queries("ccnet_buckets")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      val n = rs.length.toLong
      val byBucket = rs.groupBy(_.getString(3))
        .map { case (b, g) => b -> g.map(_.getLong(2)) }
      assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
      // value thresholds imply strict score ordering between buckets
      for {
        h <- byBucket.get("head"); m <- byBucket.get("middle")
      } assert(h.max < m.min, s"$lang: head/middle overlap")
      for {
        m <- byBucket.get("middle"); t <- byBucket.get("tail")
      } assert(m.max < t.min, s"$lang: middle/tail overlap")
      // the rank convention: cumulative count at t1 reaches rank1,
      // at t2 reaches rank2 — so head >= rank1, head+middle >= rank2
      val rank1 = (n - 1) / 3 + 1
      val rank2 = 2 * (n - 1) / 3 + 1
      val head = byBucket.get("head").map(_.size).getOrElse(0).toLong
      val mid = byBucket.get("middle").map(_.size).getOrElse(0).toLong
      assert(head >= rank1, s"$lang: head $head < rank $rank1")
      assert(head + mid >= rank2,
        s"$lang: head+middle ${head + mid} < rank $rank2")
      // keep is exactly the non-tail predicate
      rs.foreach(r =>
        assert(r.getBoolean(4) == (r.getString(3) != "tail")))
    }
  }
}
