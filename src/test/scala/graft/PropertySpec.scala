package graft

import graft.cloudfront.CloudFrontLogs
import graft.expressions.SimHashImpl
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks (ScalaCheck driven from FunSuite — no
  * scalatestplus bridge in the offline dependency set).
  */
class PropertySpec extends GraftSpec {

  private def check(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("hash60 equals JVM md5-prefix reference for arbitrary strings") {
    import spark.implicits._
    val gen = Gen.listOfN(40, Gen.asciiPrintableStr.suchThat(_.length < 50))
    val strs = gen.sample.getOrElse(Seq("fallback")).distinct
    val got = strs.toDF("s")
      .select(col("s"), graft.functions.Portable.hash60(col("s")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach { s =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      assert(got(s) == java.lang.Long.parseLong(md, 16), s"for '$s'")
    }
  }

  test("polyhash31 equals the interpreted char fold and a JVM reference") {
    import spark.implicits._
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    // unicode-heavy strings: multi-byte code points exercise the raw
    // UTF-8 decode against split("")+ascii() code-point semantics
    val gen = Gen.listOfN(40, Gen.listOf(Gen.frequency(
      8 -> Gen.asciiPrintableChar.map(_.toString),
      1 -> Gen.oneOf("é", "ß", "中", "文", "𝄞"),
      1 -> Gen.const(" "))).map(_.mkString).suchThat(_.length < 60))
    val strs = (gen.sample.getOrElse(Seq("fallback")) ++
      Seq("", " ", "abc", "中 文 𝄞")).distinct
    val P = graft.functions.Portable.P
    val df = strs.toDF("s").select(col("s"),
      column(graft.expressions.PolyHash31(expression(col("s"))))
        .as("native"),
      aggregate(filter(split(col("s"), ""), c => length(c) > 0), lit(0L),
        (h, c) => pmod(h * 31 + ascii(c), lit(P))).as("fold"))
    df.collect().foreach { r =>
      val s = r.getString(0)
      val jvm = s.codePoints().toArray
        .foldLeft(0L)((h, cp) => (31L * h + cp) % P)
      assert(r.getLong(1) == jvm, s"native vs JVM for '$s'")
      assert(r.getLong(2) == jvm, s"fold vs JVM for '$s'")
    }
  }

  test("simhash is word-order invariant and respects hamming triangle") {
    val words = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd dd", "e!",
      "word", "table", "spark"))
    def sig(ws: Seq[String]): Long = SimHashImpl.simhash64(
      ArrayData.toArrayData(ws.map(UTF8String.fromString).toArray))
    check(Prop.forAll(words) { ws =>
      sig(ws) == sig(scala.util.Random.shuffle(ws))
    })
    check(Prop.forAll(words, words, words) { (a, b, c) =>
      val (sa, sb, sc) = (sig(a), sig(b), sig(c))
      java.lang.Long.bitCount(sa ^ sc) <=
        java.lang.Long.bitCount(sa ^ sb) + java.lang.Long.bitCount(sb ^ sc)
    })
  }

  test("ts bin floors to the bucket containing the timestamp") {
    import spark.implicits._
    val epochs = Gen.listOfN(200, Gen.choose(0L, 4102444800L))
      .sample.get.distinct
    val rows = epochs.toDF("e")
      .select(col("e"), unix_seconds(graft.timeseries.TimeSeries.bin(
        timestamp_seconds(col("e")), 3600).cast("timestamp")).as("b"))
      .collect()
    rows.foreach { r =>
      val (e, b) = (r.getLong(0), r.getLong(1))
      assert(b % 3600 == 0 && b <= e && e < b + 3600)
    }
  }

  test("cf parse round-trips randomized typed fields (NULLs included)") {
    import spark.implicits._
    // random per-field values: '-' (absent) or a type-appropriate value
    val fieldGen: Seq[Gen[String]] = CloudFrontLogs.fieldMappings.map {
      case (_, dt) =>
        val real: Gen[String] = dt match {
          case org.apache.spark.sql.types.DoubleType =>
            Gen.choose(0, 1e6.toLong).map(v => s"$v.25")
          case org.apache.spark.sql.types.LongType |
               org.apache.spark.sql.types.IntegerType =>
            Gen.choose(0L, 99999L).map(_.toString)
          case _ => Gen.oneOf("alpha", "b-c", "x/y.z", "Q")
        }
        Gen.frequency(3 -> real, 1 -> Gen.const("-"))
    }
    val lines = (1 to 60).flatMap { _ =>
      val vals = fieldGen.map(_.sample.getOrElse("-"))
      Some((vals.mkString("\t"), vals))
    }
    val parsed = CloudFrontLogs.parse(
      lines.map(_._1).toDF("line"), dropHeaders = false).collect()
    parsed.zip(lines.map(_._2)).foreach { case (row, vals) =>
      CloudFrontLogs.fieldMappings.zipWithIndex.foreach {
        case ((field, dt), i) =>
          val name = CloudFrontLogs.columnName(field)
          if (vals(i) == "-") {
            assert(row.isNullAt(row.fieldIndex(name)), s"$name not null")
          } else dt match {
            case org.apache.spark.sql.types.DoubleType =>
              assert(row.getAs[Double](name) == vals(i).toDouble)
            case org.apache.spark.sql.types.LongType =>
              assert(row.getAs[Long](name) == vals(i).toLong)
            case org.apache.spark.sql.types.IntegerType =>
              assert(row.getAs[Int](name) == vals(i).toInt)
            case _ =>
              assert(row.getAs[String](name) == vals(i))
          }
      }
    }
  }

  test("asofJoin matches brute-force most-recent-prior on random tables") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val keys = Seq("a", "b", "c")
    val left = (1 to 200).map(i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(1000), i.toLong))
      .toDF("k", "lt", "lid")
    val right = (1 to 60).map(i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(1000), i * 10L))
      .toDF("k", "rt", "quota")
    val got = graft.timeseries.TimeSeries.asofJoin(
        left, right, "k", "lt", "rt", Seq("quota"),
        rightTiebreak = col("quota"))
      .select(col("k"), col("lt"), col("lid"), col("asof_quota"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    // brute force: for each left row, the max-(rt, quota) right row with
    // rt <= lt and the same key
    val rs = right.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getLong(2)))
    left.collect().foreach { l =>
      val (k, lt, lid) = (l.getString(0), l.getInt(1), l.getLong(2))
      val want = rs.filter(r => r._1 == k && r._2 <= lt)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
      assert(got((k, lt, lid)) == want, s"key=$k lt=$lt")
    }
  }

  test("asofJoinForward matches brute-force earliest-following on " +
      "random tables") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val keys = Seq("a", "b", "c")
    val left = (1 to 200).map(i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(1000), i.toLong))
      .toDF("k", "lt", "lid")
    val right = (1 to 60).map(i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(1000), i * 10L))
      .toDF("k", "rt", "quota")
    val got = graft.timeseries.TimeSeries.asofJoinForward(
        left, right, "k", "lt", "rt", Seq("quota"),
        rightTiebreak = col("quota"))
      .select(col("k"), col("lt"), col("lid"), col("asof_quota"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) ->
        Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    // brute force: for each left row, the MIN-rt right row with
    // rt >= lt and the same key; quota ties resolve to MAX quota
    // (inherited tiebreak direction — see the scaladoc)
    val rs = right.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getLong(2)))
    left.collect().foreach { l =>
      val (k, lt, lid) = (l.getString(0), l.getInt(1), l.getLong(2))
      val cand = rs.filter(r => r._1 == k && r._2 >= lt)
      val want = if (cand.isEmpty) None
        else Some(cand.sortBy(r => (-r._2, r._3)).last._3)
      assert(got((k, lt, lid)) == want, s"key=$k lt=$lt")
    }
  }

  test("asofJoin time-slicing: same answer at every slice width, plan splits low-card keys") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val keys = Seq("a", "b") // low-cardinality on purpose
    val left = (1 to 300).map(i =>
      (keys(rnd.nextInt(2)), rnd.nextInt(1000), i.toLong))
      .toDF("k", "lt", "lid")
    val right = (1 to 40).map(i =>
      (keys(rnd.nextInt(2)), rnd.nextInt(1000), i * 10L))
      .toDF("k", "rt", "quota")
    def run(sliceSeconds: Long): Map[(String, Int, Long), Option[Long]] =
      graft.timeseries.TimeSeries.asofJoin(
          left, right, "k", "lt", "rt", Seq("quota"),
          rightTiebreak = col("quota"), sliceSeconds = sliceSeconds)
        .select(col("k"), col("lt"), col("lid"), col("asof_quota"))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)) ->
          Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    // one slice spans everything == the single-window formulation;
    // narrow slices (incl. widths leaving right-free gap slices) must
    // decompose to the identical result
    val whole = run(1000000L)
    Seq(400L, 64L, 7L).foreach { w =>
      assert(run(w) == whole, s"sliceSeconds=$w diverged")
    }
    // the heavy window must partition by (key, slice), not key alone
    val sliced = graft.timeseries.TimeSeries.asofJoin(
      left, right, "k", "lt", "rt", Seq("quota"),
      rightTiebreak = col("quota"), sliceSeconds = 64L)
    val windowLines = sliced.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.exists(l =>
      l.contains("__slice") && l.contains("__loc_")),
      "local running-last window is not partitioned by (key, __slice)")
  }

  test("shard_pack plan: no window partition spans a whole language") {
    val q = SparkEntry.queries("shard_pack")(spark, sfDir)
    q.collect()
    val windowLines = q.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    // the running-sum window over document rows must partition by
    // (lang, bkt); the only lang-alone window runs over per-bucket
    // TOTALS (metadata-scale, one row per bucket)
    val rowLevel = windowLines.filter(_.contains("n_tokens#"))
    assert(rowLevel.nonEmpty)
    assert(rowLevel.forall(_.contains("bkt")),
      s"row-level window not bucketed:\n${rowLevel.mkString("\n")}")
  }

  test("knn_join plan: candidate join is a (label, cell) equi-join, never all-pairs") {
    val q = SparkEntry.queries("knn_join")(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), plan)
    // the only nested-loop joins allowed are the broadcast-tiny
    // centroid/bound sides; the pair-generating join must carry the
    // IVF cell key
    assert(plan.contains("c_cell"),
      "candidate join lost the IVF cell key")
  }

  test("metrics_percentiles plan: window input is the histogram, not raw rows") {
    val q = SparkEntry.queries("metrics_percentiles")(spark, sfDir)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val w = plan.indexOf("Window")
    assert(w > 0, plan)
    // in the printed tree children follow parents: an aggregate BELOW
    // the window proves the sort/window runs over distinct-value counts
    assert(plan.indexOf("HashAggregate", w) > 0,
      s"window consumes raw rows:\n$plan")
    assert(!plan.contains("row_number"), "raw-row ranking reappeared")
  }

  test("shard_pack invariants: per-stratum monotone shards at budget boundaries") {
    val rows = SparkEntry.queries("shard_pack")(spark, sfDir).collect()
    val budget = 20000L
    rows.groupBy(_.getAs[String]("lang")).values.foreach { lg =>
      val sorted = lg.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        // shard id is exactly the budget quotient of the start offset
        assert(r.getAs[Long]("shard_id") == cum / budget)
        cum += r.getAs[Int]("n_tokens")
        assert(r.getAs[Long]("cum_tokens") == cum)
      }
    }
  }

  test("bpe merge fold equals JVM greedy merge on random corpora") {
    import spark.implicits._
    // adversarial vocab: single-char tokens force a==b overlap runs and
    // tokens that are suffixes of each other stress the tail check
    val tok = Gen.oneOf("x", "y", "xx", "yx", "a", "ax")
    val docGen = Gen.listOfN(12, tok)
    val rnd = new scala.util.Random(11)
    val docs = (1 to 150).map { i =>
      (i.toLong, docGen.sample.getOrElse(List("x")).mkString(" "))
    }.toDF("doc_id", "text")
    val pairs = Seq(("x", "x"), ("x", "y"), ("yx", "x"), ("a", "ax"),
      (rnd.shuffle(Seq("x", "y", "xx")).head, "x"))
    def jvmMerge(w: List[String], a: String, b: String): List[String] =
      w.foldLeft(List.empty[String]) { (acc, t) =>
        if (acc.nonEmpty && acc.last == a && t == b)
          acc.init :+ (a + "+" + b)
        else acc :+ t
      }
    val base = graft.operators.TextPack.bpeTokens(docs)
    val texts = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).split(" ").filter(_.nonEmpty).toList).toMap
    pairs.foreach { case (a, b) =>
      val top = Seq((a, b, 0L)).toDF("a", "b", "cnt")
      val got = graft.operators.TextPack.bpeMerge(base, top).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      texts.foreach { case (id, w) =>
        assert(got(id) == jvmMerge(w, a, b), s"pair ($a,$b) doc $id: $w")
      }
    }
  }

  test("sample_stratified rates land near targets and are deterministic") {
    val df = SparkEntry.queries("sample_stratified")(spark,
      "/root/testdata/sf0.01")
    val kept = df.collect()
    // every draw respects its stratum's threshold by construction;
    // realized rates should be within a loose binomial band of target
    val byLang = kept.groupBy(_.getAs[String]("lang")).view
      .mapValues(_.length).toMap
    val totals = graft.sources.Tables
      .documents(spark, "/root/testdata/sf0.01")
      .groupBy(org.apache.spark.sql.functions.col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = Map("en" -> 0.5, "de" -> 0.3, "es" -> 0.3,
      "fr" -> 0.3, "zh" -> 0.2)
    for ((lang, t) <- target) {
      val rate = byLang.getOrElse(lang, 0).toDouble / totals(lang)
      assert(math.abs(rate - t) < 0.15, s"$lang: $rate vs $t")
    }
    // determinism: the same call yields the identical kept set
    val again = SparkEntry.queries("sample_stratified")(spark,
      "/root/testdata/sf0.01").collect()
    assert(kept.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("dot_pack_q20 equals a JVM map-based sparse dot on random " +
      "sorted vectors, through codegen") {
    import org.apache.spark.sql.functions._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vocab = ('a' to 'z').map(_.toString)
    val vecGen = for {
      n <- Gen.chooseNum(0, 12)
      ws <- Gen.pick(n, vocab)
      vs <- Gen.listOfN(n, Gen.chooseNum(0L, (1L << 41) - 1))
    } yield ws.sorted.zip(vs).toSeq
    val p = Prop.forAll(vecGen, vecGen) { (a, b) =>
      val am = a.toMap
      val bm = b.toMap
      var s1 = 0L; var s2 = 0L; var s3 = 0L
      for (k <- am.keySet intersect bm.keySet) {
        val (ah, al) = (am(k) >>> 20, am(k) & ((1L << 20) - 1))
        val (bh, bl) = (bm(k) >>> 20, bm(k) & ((1L << 20) - 1))
        s1 += ah * bh; s2 += ah * bl + al * bh; s3 += al * bl
      }
      import spark.implicits._
      val got = Seq((a.map(_._1), a.map(_._2), b.map(_._1), b.map(_._2)))
        .toDF("aw", "av", "bw", "bv")
        .select(functions.Portable.dotPackQ20(col("aw"), col("av"),
          col("bw"), col("bv")).as("s"))
        .collect()(0).getSeq[Long](0)
      got == Seq(s1, s2, s3)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.status.toString)
  }
}
