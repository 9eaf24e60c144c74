package graft.operators

import graft.{GraftQuery, QueryPack}
import graft.Caches.CachesSyntax
import graft.media.{Media, MediaFeaturizer}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** SURVEY.md §2 block F — multimodal queries.
  *
  * F2 `media_features` is the oracle-verified surface: byte statistics
  * plus the stubbed decode feature over the synthesized binary corpus.
  * The documents text is ASCII, so the DuckDB oracle reproduces the byte
  * stats from character ordinals (ord == byte value) and the decode stub
  * from the same base-131 polynomial fold.
  */
object MediaPack extends QueryPack {

  private val mediaTypeSql =
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"

  private val mediaFeatures = GraftQuery(
    "media_features",
    (s, d) => {
      MediaFeaturizer.features(Media.synthesize(Tables.documents(s, d)))
        .toDF()
        .orderBy(col("doc_id"))
    },
    Some(s"""
      SELECT doc_id,
        $mediaTypeSql AS media_type,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        CAST(list_sum(list_transform(string_split(text, ''),
          c -> ord(c))) AS BIGINT) AS byte_sum,
        ord(substr(text, 1, 1)) AS first_byte,
        ord(substr(text, length(text), 1)) AS last_byte,
        CAST(list_sum(list_transform(string_split(text, ''), c -> ord(c)))
          AS BIGINT) * 1000000 // CAST(octet_length(encode(text)) AS BIGINT)
          AS mean_byte_ppm,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
          (h, c) -> (h * 131 + c) % ${graft.functions.Portable.P}) AS feat_hash
      FROM documents
      ORDER BY doc_id
      """))

  // F3 — frame sampling surface: one row per sampled frame (1 fps of
  // fake duration, capped at 8; images one frame), frame features from
  // the decode STUB over deterministic payload slices. The oracle
  // rebuilds the slice boundaries with integer arithmetic and the same
  // base-131 fold over character ordinals (ASCII text: ord == byte).
  private val mediaFrames = GraftQuery(
    "media_frames",
    (s, d) => {
      MediaFeaturizer.sampleFrames(Media.synthesize(Tables.documents(s, d)))
        .toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some(s"""
      WITH m AS (
        SELECT doc_id, text,
          $mediaTypeSql AS media_type,
          CASE WHEN doc_id % 3 = 0 THEN 1
               ELSE least(8, greatest(1,
                 ((doc_id % 600) * 1000 + 1000) // 1000)) END AS n_frames,
          CAST(octet_length(encode(text)) AS BIGINT) AS len
        FROM documents),
      f AS (
        SELECT doc_id, media_type, n_frames, len,
          unnest(range(n_frames)) AS frame_idx, text
        FROM m)
      SELECT doc_id, media_type,
        CAST(frame_idx AS INTEGER) AS frame_idx,
        CAST(n_frames AS INTEGER) AS n_frames,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(string_split(substr(text,
              CAST((len * frame_idx) // n_frames AS BIGINT) + 1,
              CAST((len * (frame_idx + 1)) // n_frames
                - (len * frame_idx) // n_frames AS BIGINT)), ''),
            c -> CAST(ord(c) AS BIGINT))),
          (h, c) -> (h * 131 + c) % ${graft.functions.Portable.P})
          AS frame_hash
      FROM f
      ORDER BY doc_id, frame_idx
      """))

  // F4 — binary-payload exact dedup: duplicate media by (byte length,
  // content fingerprint) — the multimodal counterpart of C1, computed
  // from the featurizer's deterministic byte fold so the whole payload
  // never leaves the executor (dedup of 100 TB of media moves 16 bytes
  // per object, not the object).
  private val mediaDedup = GraftQuery(
    "media_dedup",
    (s, d) => {
      // group stats via agg + join-back, not a window over the
      // fingerprint pair: a viral media object (one asset duplicated
      // across the corpus) combines map-side and its join partition can
      // skew-split, whereas a window partition cannot (same rule as
      // DedupPack.withDupFlag).
      val base = MediaFeaturizer
        .features(Media.synthesize(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("feat_hash"))
        .persistTracked
      val groups = base.groupBy(col("n_bytes"), col("feat_hash"))
        .agg(count(lit(1)).as("group_size"),
          min(col("doc_id")).as("canonical_id"))
      base.join(groups, Seq("n_bytes", "feat_hash"))
        .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("feat_hash"), col("group_size"), col("canonical_id"),
          col("is_dup"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH f AS (
        SELECT doc_id, $mediaTypeSql AS media_type,
          CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(string_split(text, ''),
              c -> CAST(ord(c) AS BIGINT))),
            (h, c) -> (h * 131 + c) % ${graft.functions.Portable.P})
            AS feat_hash
        FROM documents)
      SELECT doc_id, media_type, n_bytes, feat_hash,
        COUNT(*) OVER (PARTITION BY n_bytes, feat_hash) AS group_size,
        MIN(doc_id) OVER (PARTITION BY n_bytes, feat_hash)
          AS canonical_id,
        doc_id <> MIN(doc_id) OVER (PARTITION BY n_bytes, feat_hash)
          AS is_dup
      FROM f ORDER BY doc_id
      """))

  override val queries: Seq[GraftQuery] =
    Seq(mediaFeatures, mediaFrames, mediaDedup)
}
