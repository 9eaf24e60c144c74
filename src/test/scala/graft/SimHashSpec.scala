package graft

import graft.expressions.{GraftExtensions, GraftFunctions, SimHashImpl}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class SimHashSpec extends GraftSpec {

  /** Reference SimHash computed independently of the Expression. */
  private def referenceSimhash(words: Seq[String]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    words.foreach { w =>
      md.reset()
      val hex = md.digest(w.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16)
      val v = java.lang.Long.parseUnsignedLong(hex, 16)
      (0 until 64).foreach { j =>
        if (((v >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
      }
    }
    (0 until 64).foldLeft(0L)((s, j) =>
      if (counts(j) > 0) s | (1L << j) else s)
  }

  test("SimHashImpl matches a hex-string reference implementation") {
    val cases = Seq(Seq("alpha", "beta", "gamma"), Seq("x"),
      Seq("the", "the", "the"), Seq.empty[String])
    cases.foreach { ws =>
      val arr = ArrayData.toArrayData(
        ws.map(UTF8String.fromString).toArray)
      assert(SimHashImpl.simhash64(arr) == referenceSimhash(ws),
        s"mismatch for $ws")
    }
  }

  test("simhash of near-identical docs has small hamming distance") {
    val a = referenceSimhash("a b c d e f g h i j k l m n".split(" "))
    val b = referenceSimhash("a b c d e f g h i j k l m x".split(" "))
    val c = referenceSimhash("z y x w v u t s r q p o n m".split(" "))
    assert(java.lang.Long.bitCount(a ^ b) < java.lang.Long.bitCount(a ^ c))
  }

  test("graft_simhash64 works via SQL after imperative registration") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val got = Seq(Seq("alpha", "beta", "gamma")).toDF("w")
      .selectExpr("graft_simhash64(w) AS sig").as[Long].head()
    assert(got == referenceSimhash(Seq("alpha", "beta", "gamma")))
  }

  test("graft_hamming is popcount of xor, via SQL") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val got = Seq((0xF0L, 0x0FL)).toDF("a", "b")
      .selectExpr("graft_hamming(a, b) AS h").as[Int].head()
    assert(got == 8)
  }

  test("GraftExtensions wires both functions through injectFunction") {
    // applying to a raw SparkSessionExtensions must register cleanly
    // (a full .config("spark.sql.extensions", ...) session is exercised
    // in the Scaladoc example; here we avoid stopping the shared context)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // and the same registry entries work imperatively on a live session:
    val s2 = spark.newSession()
    GraftFunctions.register(s2)
    val h = s2.sql(
      "SELECT graft_hamming(graft_simhash64(array('a','b')), " +
        "graft_simhash64(array('a','b'))) AS h")
      .collect().head.getInt(0)
    assert(h == 0)
  }

  test("dedup_simhash pairs verified against brute-force reference") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val sigs = docs.map { case (id, t) =>
      id -> referenceSimhash(
        t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq)
    }.filter(_._2 != referenceSimhash(Seq.empty) || true).toMap
    val want = (for {
      (a, sa) <- sigs; (b, sb) <- sigs if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 7
    } yield (a, b, h.toLong)).toSet
    val got = SparkEntry.queries("dedup_simhash")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }
}
