package graft.operators

import graft.{GraftQuery, QueryPack}
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

  override val queries: Seq[GraftQuery] = Seq(mediaFeatures)
}
