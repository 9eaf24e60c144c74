package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine deterministic primitives (SURVEY.md §6).
  *
  * Every hash/normalization here has a bit-identical DuckDB spelling, so
  * oracle SQL can mirror the computation exactly:
  *  - hash60: first 15 hex chars of md5 as a 60-bit non-negative long
  *    (Spark `conv(substring(md5 x),16,10)` == DuckDB
  *    `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`).
  *  - hashP: hash60 mod P, P = 2^31-1, so affine hash-family transforms
  *    `(a*h+b) mod P` stay inside exact int64 arithmetic (a<=255 →
  *    a*h < 2^39... < 2^63) in both engines.
  *  - words/normText/shingles3: one canonical tokenization shared by all
  *    text operators (lower, trim, split on \s+, drop empties).
  *
  * All of these are pure per-row column expressions: no shuffle, fully
  * whole-stage-codegen'd, safe at any scale.
  */
object Portable {

  /** 2^31-1, the modulus of the portable hash family. */
  val P: Long = 2147483647L

  /** 60-bit md5-derived hash of a string column (non-negative). Native
    * codegen'd kernel ([[graft.expressions.Hash60]]) — bit-identical to
    * `conv(substring(md5(c),1,15),16,10)` without the hex-string
    * round-trip (property-tested against the JVM md5 reference).
    */
  def hash60(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(graft.expressions.Hash60(expression(c)))
  }

  /** hash60 reduced mod P — the base hash for affine hash families. */
  def hashP(c: Column): Column = pmod(hash60(c), lit(P))

  /** i-th member of the affine hash family over a base hash mod P. */
  def affine(i: Int, base: Column): Column =
    pmod(lit(2L * i + 1) * base + lit((i.toLong * 40503L + 13L) % P), lit(P))

  /** Canonical word tokenization: lower, trim, split \s+, drop empties. */
  def words(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), w => length(w) > 0)

  /** Canonical single-space normal form of a text column. */
  def normText(text: Column): Column = concat_ws(" ", words(text))

  /** Distinct 3-word shingles of a word array (empty for size < 3).
    * Native codegen'd expression — see [[graft.expressions.Shingles3]].
    */
  def shingles3(ws: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(graft.expressions.Shingles3(expression(ws)))
  }

  /** Distinct word-3-shingles directly as 60-bit hashes mod P — the
    * dedup pipeline's working form (8-byte elements, no intermediate
    * shingle strings). See [[graft.expressions.Shingles3Hashed]].
    */
  def shingles3Hashed(ws: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(graft.expressions.Shingles3Hashed(expression(ws)))
  }

  /** Sparse integer dot product over two word-sorted weight vectors,
    * returned as the exact split sums [s1, s2, s3] — the I8 similarity
    * join's per-pair kernel. See [[graft.expressions.DotPackQ20]].
    */
  def dotPackQ20(aw: Column, av: Column, bw: Column,
      bv: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(graft.expressions.DotPackQ20(expression(aw), expression(av),
      expression(bw), expression(bv)))
  }

  /** Fixed-point Q20 binary log of a positive bigint column — the
    * engine-portable logarithm under BM25 idf and LM cross-entropy
    * (libm log is not correctly rounded; this digit recurrence is pure
    * int64, so the DuckDB recursive-CTE mirror reproduces it
    * bit-for-bit). See [[graft.expressions.Log2FixQ20]].
    */
  def log2q20(c: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    column(graft.expressions.Log2FixQ20(expression(c)))
  }

  /** DuckDB spellings of the same primitives, for oracle SQL mirrors. */
  object sql {
    /** 60-bit md5 hash of SQL expression `e`. */
    def hash60(e: String): String =
      s"CAST('0x'||substr(md5($e),1,15) AS BIGINT)"
    def hashP(e: String): String = s"(${hash60(e)} % $P)"
    val words: String =
      """list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), x -> x <> '')"""
    /** shingles over a word-list column named `w`. */
    val shingles3: String =
      "list_distinct(list_transform(range(len(w)-2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]))"
    /** hashed shingles over `w` (mirror of shingles3Hashed). */
    val shingles3Hashed: String =
      s"list_distinct(list_transform(list_transform(range(len(w)-2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]), s -> ${hashP("s")}))"

    /** Recursive-CTE mirror of [[graft.expressions.Log2FixImpl]]: given
      * an upstream CTE `inCte(val)` of DISTINCT positive bigints, emits
      * two CTEs — the digit recurrence and `outCte(val, log2_q20)` to
      * join results back by value. Same int64 recurrence, bit-for-bit.
      * The WITH clause must carry the RECURSIVE keyword and define
      * `inCte` before this fragment:
      * `WITH RECURSIVE <inCte-def>, ${log2CteSql(...)}, ...`.
      */
    def log2CteSql(inCte: String, stepsCte: String, outCte: String): String =
      s"""$stepsCte(val, i, y, acc) AS (
        SELECT val, 0,
          CASE WHEN length(bin(val)) - 1 <= 30
               THEN val << (30 - (length(bin(val)) - 1))
               ELSE val >> ((length(bin(val)) - 1) - 30) END,
          0::BIGINT
        FROM $inCte
        UNION ALL
        SELECT val, i + 1,
          CASE WHEN y*y >= (1::BIGINT << 61) THEN (y*y) >> 31
               ELSE (y*y) >> 30 END,
          CASE WHEN y*y >= (1::BIGINT << 61) THEN 2*acc + 1
               ELSE 2*acc END
        FROM $stepsCte WHERE i < 20),
      $outCte AS (
        SELECT val,
          ((length(bin(val)) - 1)::BIGINT << 20) + acc AS log2_q20
        FROM $stepsCte WHERE i = 20)"""
  }
}
