package graft

import org.apache.spark.sql.functions._

import graft.ops.MultimodalOps

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = MultimodalOps.synthesizeFromText(
    Seq((1L, "hello world"), (2L, "a longer document body with more bytes"),
      (3L, "third"))
      .toDF("doc_id", "text"), "doc_id", "text")

  test("synthesized media table matches the canonical schema") {
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    val kinds = media.select("media_id", "kind").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds == Map(1L -> "audio", 2L -> "video", 3L -> "image"))
  }

  test("feature extraction is deterministic and byte-faithful") {
    val f = MultimodalOps.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(1L).byte_len == "hello world".getBytes("UTF-8").length)
    assert(f(2L).kind == "video" && f(2L).n_frames >= 1)
    assert(f(3L).n_frames == 1) // image
    // stub decode is pure: same payload → same dims on recompute
    val again = MultimodalOps.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(1L).width == again(1L).width && f(1L).content_hash == again(1L).content_hash)
  }

  test("frame explode emits bounded, deterministic per-frame rows for videos only") {
    val big = MultimodalOps.synthesizeFromText(
      Seq((2L, "v " * 6000), (3L, "image text"), (5L, "short video"))
        .toDF("doc_id", "text"), "doc_id", "text") // ids 2,5 → video; 3 → image
    val frames = MultimodalOps.explodeFrames(big, frameBytes = 1000, maxFrames = 5)
      .collect()
    val byId = frames.groupBy(_.media_id)
    assert(!byId.contains(3L)) // image not frame-sampled
    assert(byId(2L).length == 5) // 12000 bytes / 1000 capped at maxFrames
    assert(byId(5L).length == 1) // short payload → 1 frame
    assert(byId(2L).map(_.frame_idx).sorted.toSeq == (0 until 5))
    // deterministic: same payload → same frame hashes
    val again = MultimodalOps.explodeFrames(big, frameBytes = 1000, maxFrames = 5)
      .collect().groupBy(_.media_id)
    assert(byId(2L).map(_.frame_hash).toSeq == again(2L).map(_.frame_hash).toSeq)
  }

  test("resize stub shrinks payloads and stamps metadata, keeps schema") {
    val resized = MultimodalOps.resizeStub(media, maxBytes = 5)
    val r = resized.filter($"media_id" === 2L).head()
    assert(r.getAs[Array[Byte]]("payload").length == 5)
    assert(r.getAs[org.apache.spark.sql.Row]("meta")
      .getAs[String]("declared_format") == "raw-resized")
    // downstream feature extraction still runs on the derived table
    assert(MultimodalOps.extractFeatures(resized).count() == 3)
  }
}
