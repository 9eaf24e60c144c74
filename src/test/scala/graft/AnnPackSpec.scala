package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._

class AnnPackSpec extends GraftSpec {

  test("dot/norm fold matches a JVM-side sequential fold") {
    import spark.implicits._
    val a = Array(0.5f, -0.25f, 2.0f)
    val b = Array(1.0f, 4.0f, -0.5f)
    val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(Vectors.dot(Vectors.toDouble(col("a")),
        Vectors.toDouble(col("b"))).as("d"),
        Vectors.norm(Vectors.toDouble(col("a"))).as("n"))
      .collect().head
    val dotRef = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
      acc + x.toDouble * y.toDouble }
    val normRef = math.sqrt(a.foldLeft(0.0)((acc, x) =>
      acc + x.toDouble * x.toDouble))
    assert(got.getDouble(0) == dotRef && got.getDouble(1) == normRef)
  }

  test("planeWeights are deterministic and in [-1, 1]") {
    val p1 = Vectors.planeWeights(4, 8)
    val p2 = Vectors.planeWeights(4, 8)
    assert(p1.flatten.toSeq == p2.flatten.toSeq)
    assert(p1.flatten.forall(w => w >= -1.0 && w <= 1.0))
    assert(p1.flatten.distinct.length > 1)
  }

  test("ann_brute: ranks are 1..k, cosine non-increasing per query") {
    val rows = SparkEntry.queries("ann_brute")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1))
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length))
      val cs = byRank.map(r => r.getDouble(r.fieldIndex("cos_sim"))).toSeq
      assert(cs == cs.sorted.reverse)
    }
  }

  test("ann_lsh results are a subset-quality approximation of brute") {
    val brute = SparkEntry.queries("ann_brute")(spark, sfDir)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("cos_sim"))).toMap
    val lsh = SparkEntry.queries("ann_lsh")(spark, sfDir)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("cos_sim"))).toMap
    // LSH top-1 can never beat brute-force top-1
    lsh.foreach { case (q, c) =>
      assert(brute.contains(q) && c <= brute(q) + 1e-9)
    }
  }

  test("knn_join respects label blocking") {
    val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    SparkEntry.queries("knn_join")(spark, sfDir).collect().foreach { r =>
      assert(labels(r.getLong(0)) == labels(r.getLong(r.fieldIndex("nn_id"))))
    }
  }

  test("dedup_embedding returns exactly one row per vector") {
    val df = SparkEntry.queries("dedup_embedding")(spark, sfDir)
    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(df.count() == n)
    assert(df.select("vec_id").distinct().count() == n)
  }

  test("ann_ivf never beats brute top-1 and probes limit the search") {
    val brute = SparkEntry.queries("ann_brute")(spark, sfDir)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("cos_sim"))).toMap
    val ivf = SparkEntry.queries("ann_ivf")(spark, sfDir)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("cos_sim"))).toMap
    ivf.foreach { case (q, c) =>
      assert(brute.contains(q) && c <= brute(q) + 1e-9)
    }
    // each query returns hits from at most nprobe distinct labels
    SparkEntry.queries("ann_ivf")(spark, sfDir).collect()
      .groupBy(_.getLong(0)).values.foreach { rs =>
        assert(rs.map(_.getAs[Int]("label")).distinct.length <= 3)
      }
  }
}
