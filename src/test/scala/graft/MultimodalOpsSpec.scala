package graft

import graft.ops.MultimodalOps

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  // ids cycle kind by id % 5: 0 png, 1 jpeg, 2 gif, 3 wav, 4 video
  lazy val media = MultimodalOps.synthesizeFromText(
    Seq((0L, "png doc"), (1L, "jpeg doc"), (2L, "gif doc"),
      (3L, "wav doc"), (4L, "a video document body with more bytes"))
      .toDF("doc_id", "text"), "doc_id", "text")

  test("synthesized media table matches the canonical schema") {
    assert(media.schema("payload").dataType.typeName == "binary")
    assert(media.schema("meta").dataType.typeName == "struct")
    val kinds = media.select("media_id", "kind").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kinds == Map(0L -> "image", 1L -> "image", 2L -> "image",
      3L -> "audio", 4L -> "video"))
  }

  test("header decode parses real PNG/JPEG/GIF/BMP/WAV containers") {
    Seq("png", "jpeg", "gif", "bmp").foreach { fmt =>
      val bytes = MultimodalOps.encodeImage(17, 23, rgbSeed = 9L, fmt)
      assert(MultimodalOps.decodeHeader(bytes) == ((17, 23, fmt)),
        s"wrong header decode for $fmt")
    }
    val wav = MultimodalOps.encodeWav(16000, 64)
    assert(MultimodalOps.decodeHeader(wav) == ((0, 0, "wav")))
    assert(MultimodalOps.wavSampleRate(wav) == 16000)
    // garbage never throws
    assert(MultimodalOps.decodeHeader("not media".getBytes) == ((0, 0, "unknown")))
    assert(MultimodalOps.decodeHeader(Array.emptyByteArray) == ((0, 0, "unknown")))
  }

  test("feature extraction decodes real dimensions per format") {
    val f = MultimodalOps.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    // dims are 8 + id%24 by 8 + (id*7)%24, from the REAL container header
    assert(f(0L).format == "png" && f(0L).width == 8 && f(0L).height == 8)
    assert(f(1L).format == "jpeg" && f(1L).width == 9 && f(1L).height == 15)
    assert(f(2L).format == "gif" && f(2L).width == 10 && f(2L).height == 22)
    assert(f(3L).format == "wav" && f(3L).kind == "audio")
    assert(f(4L).format == "unknown" && f(4L).kind == "video" && f(4L).n_frames >= 1)
    // decode is pure: same payload → same dims and hash on recompute
    val again = MultimodalOps.extractFeatures(media).collect()
      .map(x => x.media_id -> x).toMap
    assert(f(0L).width == again(0L).width && f(0L).content_hash == again(0L).content_hash)
  }

  test("frame explode emits bounded, deterministic per-frame rows for videos only") {
    val big = MultimodalOps.synthesizeFromText(
      Seq((4L, "v " * 6000), (0L, "image text"), (9L, "short video"))
        .toDF("doc_id", "text"), "doc_id", "text") // ids 4,9 → video; 0 → image
    val frames = MultimodalOps.explodeFrames(big, frameBytes = 1000, maxFrames = 5)
      .collect()
    val byId = frames.groupBy(_.media_id)
    assert(!byId.contains(0L)) // image not frame-sampled
    assert(byId(4L).length == 5) // 12000 bytes / 1000 capped at maxFrames
    assert(byId(9L).length == 1) // short payload → 1 frame
    assert(byId(4L).map(_.frame_idx).sorted.toSeq == (0 until 5))
    // deterministic: same payload → same frame hashes
    val again = MultimodalOps.explodeFrames(big, frameBytes = 1000, maxFrames = 5)
      .collect().groupBy(_.media_id)
    assert(byId(4L).map(_.frame_hash).toSeq == again(4L).map(_.frame_hash).toSeq)
  }

  test("real resize shrinks oversized images preserving aspect and container") {
    val wide = Seq((100L, "w")).toDF("media_id", "text")
    val df = wide.select($"media_id", org.apache.spark.sql.functions.lit("image").as("kind"),
      org.apache.spark.sql.functions.typedLit(
        MultimodalOps.encodeImage(64, 32, 1L, "png")).as("payload"))
    val resized = MultimodalOps.resizeImages(df, maxDim = 16)
    val out = resized.head().getAs[Array[Byte]]("payload")
    assert(MultimodalOps.decodeHeader(out) == ((16, 8, "png")))
    // small payloads pass through byte-identical
    val small = df.withColumn("payload",
      org.apache.spark.sql.functions.typedLit(MultimodalOps.encodeImage(8, 8, 1L, "png")))
    val untouched = MultimodalOps.resizeImages(small, maxDim = 16)
      .head().getAs[Array[Byte]]("payload")
    assert(untouched.toSeq == MultimodalOps.encodeImage(8, 8, 1L, "png").toSeq)
  }

  test("binaryFile ingestion round-trips real media files with glob pruning") {
    val dir = tmpDir("binmedia")
    // drop real container files on disk, as an object store would hold them
    Seq(("a.png", MultimodalOps.encodeImage(12, 9, 3L, "png")),
      ("b.jpeg", MultimodalOps.encodeImage(20, 15, 4L, "jpeg")),
      ("c.wav", MultimodalOps.encodeWav(16000, 64)),
      ("skip.txt", "not media".getBytes("UTF-8"))).foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
    }
    val all = MultimodalOps.readBinaryDir(spark, dir)
    assert(all.count() == 4)
    // glob pushdown: filtered-out files never load their payloads
    val images = MultimodalOps.readBinaryDir(spark, dir, glob = "*.{png,jpeg}")
      .collect().map(r => (new java.io.File(r.getString(0)).getName,
        r.getAs[Array[Byte]]("payload"))).toMap
    assert(images.keySet == Set("a.png", "b.jpeg"))
    assert(MultimodalOps.decodeHeader(images("a.png")) == ((12, 9, "png")))
    assert(MultimodalOps.decodeHeader(images("b.jpeg")) == ((20, 15, "jpeg")))
  }

  test("aHash is content-addressed: identical pixels through png/gif/bmp") {
    (1L to 5L).foreach { seed =>
      val hashes = Seq("png", "gif", "bmp").map(f =>
        MultimodalOps.imageAHash(
          MultimodalOps.encodePatternImage(19, 23, seed, f)))
      assert(hashes.distinct.size == 1, s"seed $seed: $hashes")
      assert(hashes.head != 0L)
    }
  }

  test("inverting k blocks moves the aHash by exactly hamming k") {
    (0L to 9L).foreach { seed =>
      val base = MultimodalOps.imageAHash(
        MultimodalOps.encodePatternImage(30, 17, seed, "png"))
      (1 to 4).foreach { k =>
        val tweaked = MultimodalOps.imageAHash(
          MultimodalOps.encodePatternImage(30, 17, seed, "png", invertBlocks = k))
        assert(java.lang.Long.bitCount(base ^ tweaked) == k,
          s"seed $seed k $k")
      }
    }
  }

  test("imageNearDups finds exactly the planted copies at their distances") {
    val rows = (0L until 40L).flatMap { id =>
      val fmt = if (id % 2 == 0) "png" else "gif"
      val w = 8 + (id % 24).toInt; val h = 8 + ((id * 7) % 24).toInt
      val base = (id, MultimodalOps.encodePatternImage(w, h, id, fmt))
      if (id < 10)
        Seq(base, (id + 1000L, MultimodalOps.encodePatternImage(
          w, h, id, fmt, invertBlocks = 1 + (id % 3).toInt)))
      else Seq(base)
    }
    val media = rows.toDF("media_id", "payload")
    val got = MultimodalOps.imageNearDups(media, maxHamming = 3)
      .orderBy($"id1", $"id2")
      .as[(Long, Long, Long)].collect().toSeq
    val want = (0L until 10L).map(id => (id, id + 1000L, 1L + id % 3))
    assert(got == want)
  }
}
