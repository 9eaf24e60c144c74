package graft.media

import graft.functions.Portable
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2 block F — multimodal columns: media as opaque `binary`
  * plus a typed metadata struct, with per-partition feature extraction.
  *
  * The container has no image/audio codecs, so `decode` is STUBBED with
  * a deterministic fake (a polynomial byte hash standing in for "decoded
  * feature vector"); everything around it — the schema, the case-class
  * Encoders, the mapPartitions batch shape, the partition-local reuse of
  * scratch state — is the real plumbing a codec-backed implementation
  * would keep unchanged (swap [[MediaFeaturizer.decodeStub]] for a real
  * decoder).
  *
  * Scale: synthesis and featurization are per-row / per-partition maps —
  * no shuffle. Binary payloads never pass through a wide transform, so
  * Tungsten keeps them off-heap; metadata-only queries prune the
  * `content` column away entirely at the parquet scan.
  */
final case class MediaMeta(
    media_type: String, // image | audio | video
    format: String, // png | wav | mp4 (fake but typed)
    width: Int, // image/video pixels, 0 for audio
    height: Int,
    duration_ms: Long) // audio/video, 0 for image

final case class MediaRecord(
    doc_id: Long,
    content: Array[Byte],
    meta: MediaMeta)

final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    byte_sum: Long,
    first_byte: Int,
    last_byte: Int,
    mean_byte_ppm: Long,
    feat_hash: Long) // decodeStub output (deterministic fake)

object Media {

  /** Deterministically synthesize a media corpus from `documents`:
    * content = UTF-8 text bytes (an opaque payload as far as every
    * consumer is concerned); media_type/format/dims derived from doc_id.
    */
  def synthesize(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("content"),
        struct(
          element_at(array(lit("image"), lit("audio"), lit("video")),
            pmod(col("doc_id"), lit(3)).cast(IntegerType) + 1)
            .as("media_type"),
          element_at(array(lit("png"), lit("wav"), lit("mp4")),
            pmod(col("doc_id"), lit(3)).cast(IntegerType) + 1).as("format"),
          when(pmod(col("doc_id"), lit(3)) === 1, 0)
            .otherwise((pmod(col("doc_id"), lit(16)) * 64 + 64)
              .cast(IntegerType)).as("width"),
          when(pmod(col("doc_id"), lit(3)) === 1, 0)
            .otherwise((pmod(col("doc_id"), lit(9)) * 64 + 64)
              .cast(IntegerType)).as("height"),
          when(pmod(col("doc_id"), lit(3)) === 0, 0L)
            .otherwise(pmod(col("doc_id"), lit(600)) * 1000 + 1000)
            .as("duration_ms")).as("meta"))
      .as[MediaRecord]
  }
}

object MediaFeaturizer {

  /** STUB for the real media decoder: a deterministic polynomial hash of
    * the payload bytes (mod Portable.P, base 131). A codec-backed
    * implementation would return e.g. pixel stats here; the signature
    * (bytes in, long feature out, pure, partition-reusable) is the
    * contract the pipeline relies on.
    */
  def decodeStub(content: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < content.length) {
      h = (h * 131 + (content(i) & 0xff)) % Portable.P
      i += 1
    }
    h
  }

  /** STUB for frame decoding: deterministic per-frame "features" from
    * slices of the payload (a real implementation would seek/decode
    * actual frames; slice boundaries and the one-row-per-frame batch
    * shape are the real contract).
    */
  def frameStub(content: Array[Byte], frameIdx: Int, nFrames: Int): Long = {
    if (content.isEmpty) return 0L
    val start = (content.length.toLong * frameIdx / nFrames).toInt
    val end = (content.length.toLong * (frameIdx + 1) / nFrames).toInt
    var h = 0L
    var i = start
    while (i < end) { h = (h * 131 + (content(i) & 0xff)) % Portable.P; i += 1 }
    h
  }

  /** Frame sampling for video/audio records: one output row per sampled
    * frame (1 frame/second of fake duration, capped). Image records
    * yield a single frame. flatMap inside mapPartitions — the row
    * explosion happens executor-side, never on the driver.
    */
  final case class FrameFeature(doc_id: Long, media_type: String,
                                frame_idx: Int, n_frames: Int,
                                frame_hash: Long)

  def sampleFrames(media: Dataset[MediaRecord],
                   maxFrames: Int = 8): Dataset[FrameFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { r =>
        val n = r.meta.media_type match {
          case "image" => 1
          case _ => math.min(maxFrames,
            math.max(1, (r.meta.duration_ms / 1000).toInt))
        }
        (0 until n).iterator.map(i =>
          FrameFeature(r.doc_id, r.meta.media_type, i, n,
            frameStub(r.content, i, n)))
      }
    }
  }

  /** STUB for the real media embedder (CLIP-style encoder): a fixed-dim
    * feature VECTOR from a deterministic per-slice decode — dim j is the
    * [[frameStub]] polynomial fold of payload slice j of `dims`, mapped
    * to [-1, 1] by the same integer-mod trick the LSH plane weights use
    * ((h % 2001 − 1000)/1000 — one IEEE division of small exact ints,
    * reproducible in DuckDB). This is the pHash block-grid shape: a real
    * encoder would emit per-region features here; the signature (bytes
    * in, fixed-dim double vector out, pure, partition-reusable) is the
    * contract the D-block similarity path relies on. A k-byte edit
    * disturbs only the slices it touches, so near-identical payloads
    * yield high-cosine vectors while unrelated payloads' dims are
    * independent draws (cos concentrates near 0, std ≈ 1/√dims).
    */
  def embedStub(content: Array[Byte], dims: Int = 16): Array[Double] =
    Array.tabulate(dims)(j =>
      ((frameStub(content, j, dims) % 2001L) - 1000L) / 1000.0)

  final case class MediaEmbedding(doc_id: Long, media_type: String,
                                  embedding: Array[Double])

  /** Per-partition media embedding: one imperative pass per record, no
    * shuffle — the F2 featurizer contract with a vector output. Payloads
    * under `dims` bytes carry no meaningful slice grid and are dropped
    * (the F5 short-payload discipline).
    */
  def embed(media: Dataset[MediaRecord],
            dims: Int = 16): Dataset[MediaEmbedding] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.content.length >= dims).mapPartitions { it =>
      it.map(r => MediaEmbedding(r.doc_id, r.meta.media_type,
        embedStub(r.content, dims)))
    }
  }

  /** STUB for resize: deterministic fake of a resize-to-(w,h) decode —
    * emits the target dims plus a content checksum the way a real
    * implementation would emit resized pixel buffers. Keeps the
    * (bytes, dims) → (bytes', dims') signature a codec would have.
    */
  def resizeStub(r: MediaRecord, w: Int, h: Int): MediaRecord =
    r.copy(meta = r.meta.copy(width = w, height = h),
      content = r.content.take(math.max(1, math.min(r.content.length,
        w * h / 64))))

  /** Per-partition featurization: one imperative pass per record, no
    * shuffle, scratch state amortized across the partition's batch.
    */
  def features(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val bytes = r.content
        var sum = 0L
        var i = 0
        while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
        val n = bytes.length.toLong
        MediaFeatures(
          doc_id = r.doc_id,
          media_type = r.meta.media_type,
          n_bytes = n,
          byte_sum = sum,
          first_byte = if (n > 0) bytes(0) & 0xff else -1,
          last_byte = if (n > 0) bytes(bytes.length - 1) & 0xff else -1,
          mean_byte_ppm = if (n > 0) sum * 1000000L / n else 0L,
          feat_hash = decodeStub(bytes))
      }
    }
  }
}
