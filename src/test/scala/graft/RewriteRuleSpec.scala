package graft

import graft.expressions.GraftFunctions
import org.apache.spark.sql.functions._

class RewriteRuleSpec extends GraftSpec {

  test("size(array_intersect) rewrites to IntersectCount and agrees") {
    GraftFunctions.register(spark)
    import graft.functions.Portable
    // parquet-backed (a local Seq would constant-fold to LocalRelation
    // before the plan can be inspected)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        Portable.shingles3(Portable.words(col("text"))).as("a"),
        Portable.shingles3(reverse(Portable.words(col("text")))).as("b"))
    val df = docs.select(col("doc_id"),
      size(array_intersect(col("a"), col("b"))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_intersect_count"),
      s"rewrite did not fire:\n$optimized")
    // agreement with the unrewritten computation via a JVM recompute
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def sh(ws: Seq[String]) =
      ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    df.collect().take(50).foreach { r =>
      val ws = texts(r.getLong(0)).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty).toSeq
      assert(r.getInt(1) == (sh(ws) & sh(ws.reverse)).size)
    }
  }

  test("rewrite does not fire for nullable-element arrays") {
    GraftFunctions.register(spark)
    import spark.implicits._
    // split() output has containsNull=true-ish arrays? build one that
    // definitely allows nulls: array(when(...)) with a null branch
    val df = Seq(("a", "a")).toDF("x", "y")
      .select(size(array_intersect(
        array(when(col("x") === "never", col("x"))),
        array(col("y")))).as("n"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_intersect_count"), optimized)
    df.collect() // still executes correctly via array_intersect
  }
}
