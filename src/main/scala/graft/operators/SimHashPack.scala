package graft.operators

import graft.{GraftQuery, QueryPack}
import graft.expressions.GraftFunctions
import graft.functions.Portable._
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2 C3 — SimHash near-dup detection, powered by the native
  * Catalyst expressions (block G).
  *
  * Scale shape: the signature is one codegen'd expression per row (no
  * shuffle); candidate generation uses 8 bands of 8 signature bits — by
  * pigeonhole, any pair with hamming <= 7 agrees on at least one full
  * band, so the banded join has *guaranteed* recall at the threshold
  * while only ever comparing within buckets. The oracle brute-forces
  * all pairs (equivalent by the pigeonhole argument) and recomputes the
  * signatures from scratch in SQL via 32-bit md5 halves.
  */
object SimHashPack extends QueryPack {

  private val maxHamming = 7

  private val dedupSimhash = GraftQuery(
    "dedup_simhash",
    (s, d) => {
      GraftFunctions.register(s)
      val sigs = Tables.parallelized(Tables.documents(s, d))
        .select(col("doc_id"), words(col("text")).as("w"))
        .filter(size(col("w")) > 0)
        .select(col("doc_id"), expr("graft_simhash64(w)").as("sig"))
      val chunks = array((0 until 8).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * 8).bitwiseAND(lit(255L))
            .as("chunk"))): _*)
      val banded = sigs
        .select(col("doc_id"), col("sig"), explode(chunks).as("bc"))
        .select(col("doc_id"), col("sig"),
          col("bc.band").as("band"), col("bc.chunk").as("chunk"))
      val a = banded.select(col("doc_id").as("doc_a"),
        col("sig").as("sig_a"), col("band"), col("chunk"))
      val b = banded.select(col("doc_id").as("doc_b"),
        col("sig").as("sig_b"), col("band").as("band_b"),
        col("chunk").as("chunk_b"))
      a.join(b, col("band") === col("band_b") &&
          col("chunk") === col("chunk_b") && col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
        .distinct()
        .withColumn("hamming",
          expr("graft_hamming(sig_a, sig_b)").cast(LongType))
        .filter(col("hamming") <= maxHamming)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""
      WITH w AS (SELECT doc_id, ${graft.functions.Portable.sql.words} AS w
                 FROM documents),
      tok AS (SELECT doc_id, unnest(w) AS word FROM w WHERE len(w) > 0),
      h AS (SELECT doc_id,
          CAST('0x'||substr(md5(word),1,8) AS BIGINT) AS hi,
          CAST('0x'||substr(md5(word),9,8) AS BIGINT) AS lo
        FROM tok),
      b AS (SELECT doc_id, unnest(range(64)) AS j, hi, lo FROM h),
      c AS (SELECT doc_id, j,
          SUM(CASE WHEN ((CASE WHEN j < 32 THEN lo >> CAST(j AS INTEGER)
                          ELSE hi >> CAST(j - 32 AS INTEGER) END) & 1) = 1
              THEN 1 ELSE -1 END) AS cnt
        FROM b GROUP BY 1, 2),
      sig AS (SELECT doc_id,
          CAST(SUM(CASE WHEN cnt > 0 AND j < 32
            THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER))
            ELSE 0 END) AS BIGINT) AS lo,
          CAST(SUM(CASE WHEN cnt > 0 AND j >= 32
            THEN (CAST(1 AS BIGINT) << CAST(j - 32 AS INTEGER))
            ELSE 0 END) AS BIGINT) AS hi
        FROM c GROUP BY doc_id)
      SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b,
        CAST(bit_count(xor(a.lo, bb.lo)) + bit_count(xor(a.hi, bb.hi))
          AS BIGINT) AS hamming
      FROM sig a JOIN sig bb ON a.doc_id < bb.doc_id
      WHERE bit_count(xor(a.lo, bb.lo)) + bit_count(xor(a.hi, bb.hi))
        <= $maxHamming
      ORDER BY doc_a, doc_b
      """))

  override val queries: Seq[GraftQuery] = Seq(dedupSimhash)
}
