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
  * shuffle). Candidate generation is MULTI-PROBE over 4 blocks of 16
  * signature bits: hamming <= 7 across 4 blocks forces some block to
  * differ by AT MOST ONE bit (pigeonhole, 4×2 > 7), so probing each
  * block's exact 16-bit key plus its 16 single-bit flips has guaranteed
  * recall at the threshold. Versus the plain 8×8-bit banding (256
  * buckets per band — bucket population grows as n/256, quadratic
  * within buckets at corpus scale), the 65536-way keys shrink buckets
  * 256× for a 8.5× key fanout: random-pair collision probability drops
  * from 8/2^8 to ~68/2^16 (≈30×), and the bucket-size scale knob
  * improves by two orders of magnitude. The oracle brute-forces all
  * pairs independently, so the gate re-proves recall = 1.
  */
object SimHashPack extends QueryPack {

  private val maxHamming = 7
  private val numBlocks = 4
  private val blockBits = 16

  private val dedupSimhash = GraftQuery(
    "dedup_simhash",
    (s, d) => {
      GraftFunctions.register(s)
      val sigs = Tables.parallelized(Tables.documents(s, d))
        .select(col("doc_id"), words(col("text")).as("w"))
        .filter(size(col("w")) > 0)
        .select(col("doc_id"), expr("graft_simhash64(w)").as("sig"))
      def blockKey(b: Int) =
        shiftrightunsigned(col("sig"), b * blockBits)
          .bitwiseAND(lit((1L << blockBits) - 1))
      // index side: each block's exact key (numBlocks rows per doc)
      val exactKeys = array((0 until numBlocks).map(b =>
        struct(lit(b).as("blk"), blockKey(b).as("key"))): _*)
      // probe side: exact key + all single-bit flips (17 keys per block)
      val probeKeys = array((0 until numBlocks).flatMap { b =>
        struct(lit(b).as("blk"), blockKey(b).as("key")) +:
          (0 until blockBits).map(i =>
            struct(lit(b).as("blk"),
              blockKey(b).bitwiseXOR(lit(1L << i)).as("key")))
      }: _*)
      val idx = sigs
        .select(col("doc_id").as("doc_b"), col("sig").as("sig_b"),
          explode(exactKeys).as("bc"))
        .select(col("doc_b"), col("sig_b"),
          col("bc.blk").as("blk_b"), col("bc.key").as("key_b"))
      val probe = sigs
        .select(col("doc_id").as("doc_a"), col("sig").as("sig_a"),
          explode(probeKeys).as("bc"))
        .select(col("doc_a"), col("sig_a"),
          col("bc.blk").as("blk"), col("bc.key").as("key"))
      probe.join(idx, col("blk") === col("blk_b") &&
          col("key") === col("key_b") && col("doc_a") < col("doc_b"))
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
