package graft

import graft.media.{Media, MediaFeaturizer, MediaRecord}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class MediaSpec extends GraftSpec {

  test("media_schema: typed binary + metadata model (F1)") {
    val ds = Media.synthesize(Tables.documents(spark, sfDir))
    val schema = ds.schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val rows = ds.collect()
    assert(rows.nonEmpty)
    rows.foreach { r: MediaRecord =>
      assert(Set("image", "audio", "video")(r.meta.media_type))
      r.meta.media_type match {
        case "image" => assert(r.meta.width > 0 && r.meta.duration_ms == 0)
        case "audio" => assert(r.meta.width == 0 && r.meta.duration_ms > 0)
        case "video" => assert(r.meta.width > 0 && r.meta.duration_ms > 0)
      }
      assert(r.content.nonEmpty)
    }
    // determinism: synthesizing twice yields identical metadata
    val again = Media.synthesize(Tables.documents(spark, sfDir)).collect()
    assert(rows.map(r => (r.doc_id, r.meta)).toSet ==
      again.map(r => (r.doc_id, r.meta)).toSet)
  }

  test("media_features: byte stats match a JVM recompute (F2)") {
    val docs = Tables.documents(spark, sfDir)
    val feats = MediaFeaturizer.features(Media.synthesize(docs))
      .collect().map(f => f.doc_id -> f).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    texts.take(20).foreach { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val f = feats(id)
      assert(f.n_bytes == bytes.length)
      assert(f.byte_sum == bytes.map(_ & 0xff).map(_.toLong).sum)
      assert(f.first_byte == (bytes.head & 0xff))
      assert(f.last_byte == (bytes.last & 0xff))
      assert(f.feat_hash == MediaFeaturizer.decodeStub(bytes))
    }
  }

  test("metadata-only query prunes the binary content column") {
    val ds = Media.synthesize(Tables.documents(spark, sfDir))
    val plan = ds.select(col("meta.media_type")).groupBy("media_type")
      .count().queryExecution.optimizedPlan.toString
    assert(!plan.contains("content") || plan.contains("media_type"))
  }

  test("sampleFrames yields one row per sampled frame, image = 1 frame") {
    val ds = Media.synthesize(Tables.documents(spark, sfDir))
    val frames = MediaFeaturizer.sampleFrames(ds).collect()
    val byDoc = frames.groupBy(_.doc_id)
    val metas = ds.collect().map(r => r.doc_id -> r.meta).toMap
    byDoc.foreach { case (id, fs) =>
      val m = metas(id)
      if (m.media_type == "image") assert(fs.length == 1)
      else assert(fs.length ==
        math.min(8, math.max(1, (m.duration_ms / 1000).toInt)))
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length))
      // frame hashes recompute deterministically
      fs.foreach(f => assert(f.frame_hash >= 0))
    }
  }

  test("media_near_dedup: edited/inserted payload copies pair up, " +
      "bucketed probe, no all-pairs join (F5)") {
    import spark.implicits._
    // 40 distinct base payloads (~200 opaque bytes each); payload 0
    // additionally appears as a 1-byte EDIT (doc 100) and a 4-byte
    // INSERTION (doc 101) — the re-encode/watermark shapes F4's exact
    // fingerprint cannot group.
    def payload(seed: Long): Array[Byte] = {
      var x = seed * 6364136223846793005L + 1442695040888963407L
      Array.fill(200) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (((x >>> 40) % 64) + 32).toByte
      }
    }
    val base = (0L until 40L).map(i => (i, payload(i)))
    val edited = {
      val b = payload(0); b(100) = (b(100) ^ 1).toByte; (100L, b)
    }
    val inserted = (101L,
      payload(0).take(50) ++ "WMRK".getBytes ++ payload(0).drop(50))
    val media = (base :+ edited :+ inserted).toDF("doc_id", "content")
    val res = operators.MediaPack.nearDupPairsOver(media)
    // candidate generation must stay a bucketed equi-join — a
    // regression to all-pairs shows up as a nested-loop/cartesian
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"media_near_dedup candidate generation went all-pairs:\n$plan")
    val pairs = res.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // both planted copies pair with their original; nothing pairs
    // across distinct base payloads (the two copies differ from EACH
    // OTHER by edit + insertion — double the distance — so that pair
    // may legitimately sit beyond the hamming gate)
    assert(pairs.contains((0L, 100L)) && pairs.contains((0L, 101L)),
      s"planted near-dups not found: $pairs")
    assert(pairs.subsetOf(Set((0L, 100L), (0L, 101L), (100L, 101L))),
      s"false positives across distinct payloads: $pairs")
  }

  test("media_semantic_dedup: a slice-edit copy pairs with its " +
      "original WITHIN its type only; bucketed probe, no all-pairs " +
      "join (F7)") {
    import spark.implicits._
    import graft.media.{MediaMeta, MediaRecord}
    def payload(seed: Long): Array[Byte] = {
      var x = seed * 6364136223846793005L + 1442695040888963407L
      Array.fill(200) {
        x = x * 6364136223846793005L + 1442695040888963407L
        (((x >>> 40) % 64) + 32).toByte
      }
    }
    def rec(id: Long, content: Array[Byte], mt: String) =
      MediaRecord(id, content, MediaMeta(mt, "png", 64, 64, 0L))
    // 30 distinct image payloads; payload 0 additionally appears as a
    // 1-byte edit (doc 100, same type — disturbs exactly ONE of the 16
    // feature slices, the re-encode shape) and BYTE-IDENTICAL under a
    // different media_type (doc 200 — the within-type contract probe)
    val base = (0L until 30L).map(i => rec(i, payload(i), "image"))
    val edited = {
      val b = payload(0); b(100) = (b(100) ^ 1).toByte
      rec(100L, b, "image")
    }
    val crossType = rec(200L, payload(0), "audio")
    val media = (base :+ edited :+ crossType).toDS().toDF()
    val res = operators.MediaPack.semanticDedupOver(media)
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"media_semantic_dedup candidate generation went all-pairs:\n$plan")
    val rows = res.collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    // the slice-edit copy pairs with its original at high cosine
    assert(pairs.contains((0L, 100L)), s"planted near-copy missed: $pairs")
    val cos = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 100L)
      .get.getAs[Double]("cos_sim")
    assert(cos >= 0.9, s"1-slice edit should leave 15/16 dims intact: $cos")
    // the byte-identical payload under ANOTHER type never pairs —
    // semantic dedup is within-type by contract
    assert(!pairs.exists(p => p._1 == 200L || p._2 == 200L),
      s"cross-type pair leaked: $pairs")
    // and nothing pairs across distinct base payloads
    assert(pairs.subsetOf(Set((0L, 100L))),
      s"false positives across distinct payloads: $pairs")
  }

  test("media_embed: vectors match a JVM recompute of the slice grid; " +
      "short payloads are dropped") {
    import spark.implicits._
    import graft.media.{MediaFeaturizer, MediaMeta, MediaRecord}
    val long = ("A" * 20 + "B" * 13).getBytes("UTF-8") // 33 bytes
    val short = "tiny".getBytes("UTF-8") // < 16: no slice grid
    val media = Seq(
      MediaRecord(1L, long, MediaMeta("image", "png", 64, 64, 0L)),
      MediaRecord(2L, short, MediaMeta("audio", "wav", 0, 0, 1000L)))
      .toDS()
    val got = MediaFeaturizer.embed(media).collect()
    assert(got.map(_.doc_id).toSeq == Seq(1L))
    assert(got.head.embedding.toSeq ==
      MediaFeaturizer.embedStub(long).toSeq)
    assert(got.head.embedding.length == 16)
    assert(got.head.embedding.forall(v => v >= -1.0 && v <= 1.0))
  }

  test("resizeStub keeps the record contract: dims set, content bounded") {
    val ds = Media.synthesize(Tables.documents(spark, sfDir)).limit(5)
    ds.collect().foreach { r =>
      val out = MediaFeaturizer.resizeStub(r, 128, 64)
      assert(out.meta.width == 128 && out.meta.height == 64)
      assert(out.content.length <= r.content.length && out.content.nonEmpty)
      assert(out.doc_id == r.doc_id)
    }
  }
}
