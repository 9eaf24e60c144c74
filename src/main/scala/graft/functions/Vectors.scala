package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector primitives for the embeddings table (SURVEY.md §2 blocks C5/D).
  *
  * Determinism across engines (SURVEY.md §6): every float element is cast
  * to double BEFORE multiplication, and every reduction is a sequential
  * left fold in array-index order — `aggregate(zip_with(...))` here,
  * `list_reduce(list_prepend(0.0, list_transform(...)))` in DuckDB — so
  * dot products and norms are bit-identical IEEE doubles in both engines,
  * and `round(cos, 6)` cannot straddle engines' rounding boundaries.
  *
  * Scale: all primitives are per-row codegen'd expressions (no shuffle).
  * Norms are computed once per side and carried as a column, so a k-NN
  * join does one multiply-add pass per candidate pair, not three.
  */
object Vectors {

  /** Float array column → double array (element-exact widening) via the
    * native array Cast — codegen'd, unlike `transform(v, _.cast(...))`,
    * which is a CodegenFallback higher-order function evaluated per
    * element on the interpreted expression tree (this feeds EVERY
    * similarity query's scan, so the widening must not be the slow
    * part). Same element-wise float→double widening, bit-exact.
    */
  def toDouble(v: Column): Column =
    v.cast(ArrayType(DoubleType))

  /** Sequential left-fold dot product of two double-array columns.
    * Delegates to the native codegen'd [[graft.expressions.DotProduct]]
    * — identical fold order and widening to the
    * `aggregate(zip_with(...))` formulation, ~10x the throughput
    * (higher-order functions are CodegenFallback).
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorExprs.dotCol(a, b)

  /** L2 norm of a double-array column (same fold order as dot). */
  def norm(v: Column): Column =
    graft.expressions.VectorExprs.normCol(v)

  /** round(cosine, 6) given precomputed norms. */
  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    round(dot(a, b) / (normA * normB), 6)

  /** Deterministic random-hyperplane weights for LSH: plane p, dim j →
    * (hash60("p,j") mod 2001 - 1000)/1000.0 ∈ [-1, 1]. Mirrors the
    * DuckDB spelling in [[sqlFragments]] bit-for-bit (integer mod then
    * one IEEE division).
    */
  def planeWeights(numPlanes: Int, dims: Int): Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(numPlanes, dims) { (p, j) =>
      md.reset()
      val hex = md.digest(s"$p,$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
    }
  }

  /** DuckDB spellings of the same primitives. */
  object sql {
    def toDouble(v: String): String =
      s"list_transform($v, x -> CAST(x AS DOUBLE))"
    /** dot of two double-list SQL expressions of equal length. */
    def dot(a: String, b: String): String =
      s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform(range(len($a)), i -> $a[i+1] * $b[i+1])), " +
        "(acc, x) -> acc + x)"
    def norm(v: String): String =
      s"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
        s"list_transform($v, x -> x * x)), (acc, x) -> acc + x))"
    /** plane weights table: (p, pw double[dims]) for p in [0, numPlanes). */
    def planes(numPlanes: Int, dims: Int): String =
      s"SELECT p, list_transform(range($dims), j -> " +
        "(CAST('0x'||substr(md5(p||','||j),1,15) AS BIGINT) % 2001 - 1000)" +
        s" / 1000.0) AS pw FROM (SELECT unnest(range($numPlanes)) AS p)"
  }
}
