package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * Decode is REAL for the formats a JVM can handle without external
  * libraries: PNG / JPEG / GIF / BMP dimensions are parsed straight from
  * the container headers (magic bytes + the public header layouts), WAV
  * from the RIFF header, and image resize decodes/re-encodes through JDK
  * ImageIO. Video remains a clearly-marked deterministic STUB (no video
  * codec ships with the JDK): frame count/explode derive from byte
  * windows, with the real plumbing (schema, bounded fan-out, partition
  * batching) in place so a codec drop-in changes one function.
  *
  * At 100 TB: binary payloads stay columnar in parquet (no base64 bloat),
  * `mapPartitions` amortizes codec init per partition (the same batching
  * rationale as Python's `mapInPandas`), and feature extraction emits
  * fixed-width rows so downstream shuffles never carry the media bytes —
  * select the features, drop the payload, THEN shuffle.
  */
object MultimodalOps {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("kind", StringType), // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("source", StringType),
      StructField("declared_format", StringType))))))

  final case class MediaFeatures(
      media_id: Long, kind: String, byte_len: Long, content_hash: Long,
      width: Int, height: Int, n_frames: Int, format: String)

  // ------------------------------------------------------------- decode

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    b.length >= i + s.length && s.indices.forall(j => b(i + j) == s.charAt(j).toByte)

  /** REAL header decode: (width, height, format) from container magic
    * bytes. PNG IHDR (big-endian dims at offset 16/20), JPEG SOFn segment
    * scan, GIF logical screen descriptor (little-endian at 6/8), BMP
    * BITMAPINFOHEADER (little-endian at 18/22), WAV RIFF/WAVE (no dims).
    * Unknown containers → (0, 0, "unknown") — never throws on garbage. */
  def decodeHeader(bytes: Array[Byte]): (Int, Int, String) = {
    if (bytes == null || bytes.length < 12) return (0, 0, "unknown")
    // PNG: 89 50 4E 47 0D 0A 1A 0A, IHDR is always the first chunk
    if ((bytes(0) & 0xff) == 0x89 && ascii(bytes, 1, "PNG") && bytes.length >= 24)
      return (be32(bytes, 16), be32(bytes, 20), "png")
    // JPEG: FF D8, walk segments to the first SOFn (C0-CF minus C4/C8/CC)
    if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) {
      var pos = 2
      while (pos + 9 < bytes.length && (bytes(pos) & 0xff) == 0xff) {
        val m = bytes(pos + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return (be16(bytes, pos + 7), be16(bytes, pos + 5), "jpeg")
        pos += 2 + (if (m == 0xd8 || (m >= 0xd0 && m <= 0xd9)) 0 else be16(bytes, pos + 2))
      }
      return (0, 0, "jpeg")
    }
    if (ascii(bytes, 0, "GIF8"))
      return (le16(bytes, 6), le16(bytes, 8), "gif")
    if (ascii(bytes, 0, "BM") && bytes.length >= 26)
      return (le32(bytes, 18), le32(bytes, 22), "bmp")
    if (ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "WAVE"))
      return (0, 0, "wav")
    (0, 0, "unknown")
  }

  /** WAV sample rate from the RIFF fmt chunk (0 if not a WAV). */
  def wavSampleRate(bytes: Array[Byte]): Int =
    if (bytes != null && bytes.length >= 28 &&
      ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "WAVE") && ascii(bytes, 12, "fmt "))
      le32(bytes, 24)
    else 0

  /** STUB frame sampler for video payloads (no JDK video codec):
    * deterministic frame count from byte length. */
  def frameSampleStub(bytes: Array[Byte], everyN: Int): Int =
    math.max(1, (bytes.length / math.max(1, everyN)) % 512)

  private def contentHash(bytes: Array[Byte]): Long =
    bytes.foldLeft(-7046029254386353131L)((acc, b) => (acc ^ b) * 1099511628211L)

  // ------------------------------------------------------------- encode

  /** Per-thread ImageIO writer cache: `ImageIO.write` re-walks the
    * service registry and instantiates a fresh writer per call, which
    * dominates encode time for the small images these fixtures use.
    * Same writer class, same default params → byte-identical output.
    * Writers are not thread-safe, hence ThreadLocal (executor task
    * threads each get their own). */
  private val writerCache =
    ThreadLocal.withInitial[scala.collection.mutable.HashMap[
      String, javax.imageio.ImageWriter]](() =>
      scala.collection.mutable.HashMap())

  private def encodeVia(img: java.awt.image.BufferedImage,
                        format: String): Array[Byte] = {
    val writer = writerCache.get().getOrElseUpdate(format,
      javax.imageio.ImageIO.getImageWritersByFormatName(format).next())
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try { writer.setOutput(ios); writer.write(img) } finally ios.close()
    out.toByteArray
  }

  /** Deterministic single-color image encoded through JDK ImageIO
    * (real PNG/JPEG/GIF/BMP containers). */
  def encodeImage(width: Int, height: Int, rgbSeed: Long, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (rgbSeed * 2654435761L & 0xffffffL).toInt
    // one optimized raster fill — same pixels (and therefore identical
    // encoded bytes) as the per-pixel setRGB loop, without w·h JNI-ish
    // color-model conversions per image
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(rgb))
    g.fillRect(0, 0, width, height)
    g.dispose()
    encodeVia(img, format)
  }

  /** Canonical 44-byte-header PCM16 mono WAV of `nSamples` silence. */
  def encodeWav(sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    buf.array()
  }

  // ------------------------------------------------------------ extract

  /** Partition-batched feature extraction — the `mapInPandas` shape in
    * Scala: one iterator per partition, codec state initialized once per
    * partition, fixed-width typed output. Dimensions/format come from the
    * REAL header parse; only video frame counts are stubbed. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init happens here (header parse needs none)
        it.map { case (id, kind, payload) =>
          val (w, h, fmt) = decodeHeader(payload)
          val frames = if (kind == "video") frameSampleStub(payload, 1024) else 1
          MediaFeatures(id, kind, payload.length.toLong, contentHash(payload),
            w, h, frames, fmt)
        }
      }
  }

  final case class Frame(media_id: Long, frame_idx: Int, frame_payload: Array[Byte],
                         frame_hash: Long)

  /** Explode video payloads into per-frame rows (STUB decode: fixed-size
    * byte windows stand in for decoded frames) — the fan-out that feeds
    * per-frame feature extraction. Plumbing notes that matter at scale:
    * emitted frames are bounded per doc (`maxFrames`), the explode happens
    * partition-batched (codec init amortized), and downstream should
    * project features then DROP frame_payload before any shuffle. */
  def explodeFrames(media: DataFrame, frameBytes: Int = 4096,
                    maxFrames: Int = 64): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video")
      .select("media_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val n = math.min(maxFrames,
            math.max(1, payload.length / math.max(1, frameBytes)))
          (0 until n).iterator.map { i =>
            val frame = payload.slice(i * frameBytes,
              math.min(payload.length, (i + 1) * frameBytes))
            Frame(id, i, frame,
              frame.foldLeft(-3750763034362895579L)((a, b) => (a ^ b) * 1099511628211L))
          }
        }
      }
  }

  /** REAL image resize: decode (ImageIO), scale so max(w,h) <= maxDim
    * preserving aspect, re-encode in the same container. Non-image or
    * already-small payloads pass through untouched. Partition-batched —
    * the per-partition loop is where a hardware-accelerated codec would
    * initialize. */
  def resizeImages(media: DataFrame, maxDim: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val resized = media
      .select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, payload) =>
          val (w, h, fmt) = decodeHeader(payload)
          val isImage = fmt == "png" || fmt == "jpeg" || fmt == "gif" || fmt == "bmp"
          if (kind != "image" || !isImage || math.max(w, h) <= maxDim) (id, payload)
          else {
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload))
            val scale = maxDim.toDouble / math.max(w, h)
            val nw = math.max(1, math.round(w * scale).toInt)
            val nh = math.max(1, math.round(h * scale).toInt)
            val dst = new java.awt.image.BufferedImage(
              nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.drawImage(img, 0, 0, nw, nh, null)
            g.dispose()
            val out = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, fmt, out)
            (id, out.toByteArray)
          }
        }
      }.toDF("media_id", "payload_resized")
    media.join(resized, Seq("media_id"))
      .withColumn("payload", col("payload_resized")).drop("payload_resized")
  }

  /** Real object-store media ingestion: Spark's `binaryFile` source over
    * a directory of image/audio files — path, size, mtime, and the raw
    * bytes as a binary column, ready for [[extractFeatures]]. The source
    * pushes path-glob and length/mtime predicates into the listing (no
    * payload is read for filtered-out files), and payloads stay columnar
    * binary exactly like the synthesized tables — one ingestion contract
    * for both test media and a production `s3a://bucket/images/`. */
  def readBinaryDir(spark: SparkSession, dir: String,
                    glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("length"),
        col("modificationTime").as("modified_at"),
        col("content").as("payload"))

  /** Build a synthetic-but-REAL media table from any text corpus:
    * payloads are genuine PNG/JPEG/GIF/WAV containers (dims and sample
    * rate are deterministic functions of the id, so an oracle can verify
    * the decoded metadata), plus a stub `video` payload (raw text bytes)
    * for the frame-explode path. kind cycles by id % 5:
    * png / jpeg / gif image, wav audio, video. */
  def synthesizeFromText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast(LongType), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        // per-partition codec init (ImageIO writers) happens here
        it.map { case (id, text) =>
          val kind5 = (id % 5).toInt
          val (kind, fmt) = kind5 match {
            case 0 => ("image", "png")
            case 1 => ("image", "jpeg")
            case 2 => ("image", "gif")
            case 3 => ("audio", "wav")
            case _ => ("video", "raw")
          }
          val payload = kind5 match {
            case 0 | 1 | 2 =>
              encodeImage(8 + (id % 24).toInt, 8 + ((id * 7) % 24).toInt, id, fmt)
            case 3 => encodeWav(8000 + (id % 4).toInt * 4000, 64)
            case _ => text.getBytes("UTF-8")
          }
          (id, kind, payload, "synthetic", fmt)
        }
      }
      .toDF("media_id", "kind", "payload", "source", "declared_format")
      .select(col("media_id"), col("kind"), col("payload"),
        struct(col("source"), col("declared_format")).as("meta"))
  }

  // ----------------------------------------------- perceptual near-dup

  /** Deterministic 8×8-block-patterned image (real ImageIO containers):
    * each block is light (0xE0E0E0) or dark (0x202020) by a seed-mixed
    * hash bit, and the first `invertBlocks` blocks (row-major) are
    * color-inverted. Because block luminances sit at the extremes, one
    * inverted block flips EXACTLY one [[imageAHash]] bit (the ≲2 %
    * mean drift can never cross the ~48 % luminance gap), so planted
    * hamming distances are exact by construction — the property the
    * near-dup recall gates rely on. */
  def encodePatternImage(width: Int, height: Int, seed: Long, format: String,
                         invertBlocks: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val bx = x * 8 / width; val by = y * 8 / height
        var h = seed * 0x9E3779B97F4A7C15L + (by * 8 + bx) * 0xBF58476D1CE4E5B9L
        h ^= (h >>> 31); h *= 0xD6E8FEB86659FD93L; h ^= (h >>> 27)
        val base = if ((h & 1L) == 1L) 0xE0E0E0 else 0x202020
        val rgb = if (by * 8 + bx < invertBlocks) ~base & 0xFFFFFF else base
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    encodeVia(img, format)
  }

  /** 64-bit perceptual average-hash of a decoded image: exact-integer
    * area-average luminance (BT.601 integer weights, the same `x*8/w`
    * block partition as [[encodePatternImage]]) over an 8×8 grid, one
    * bit per cell (above the 64-cell mean). Content-addressed, not
    * container-addressed: the same pixels hash identically through PNG,
    * GIF, or BMP (lossless codecs), which is what lets near-dup detection
    * collapse re-encoded copies. All-integer arithmetic → bit-for-bit
    * reproducible across JVMs/architectures. Returns 0 for undecodable
    * payloads (they then only ever pair with each other, and real
    * pipelines filter `ahash != 0` first). */
  def imageAHash(payload: Array[Byte]): Long = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null || img.getWidth < 1 || img.getHeight < 1) return 0L
    val w = img.getWidth; val h = img.getHeight
    val sums = new Array[Long](64); val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = ((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114
        val c = cy * 8 + x * 8 / w
        sums(c) += lum; counts(c) += 1
        x += 1
      }
      y += 1
    }
    var mean = 0L; var i = 0
    val cells = new Array[Long](64)
    while (i < 64) {
      cells(i) = if (counts(i) == 0) 0L else sums(i) / counts(i)
      mean += cells(i); i += 1
    }
    mean /= 64
    var bits = 0L; i = 0
    while (i < 64) { if (cells(i) > mean) bits |= 1L << i; i += 1 }
    bits
  }

  /** Per-image aHash table: partition-batched decode (codec init once per
    * partition, payloads dropped before any shuffle — only the 8-byte
    * hash travels). */
  def imageAHashes(media: DataFrame, idCol: String = "media_id"): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast(LongType), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.map { case (id, p) => (id, imageAHash(p)) })
      .toDF(idCol, "ahash")
  }

  /** Image near-dup pairs at hamming ≤ `maxHamming` over the perceptual
    * aHash — re-encoded, slightly-edited, or watermark-tweaked copies of
    * the same picture. Reuses the SimHash pigeonhole band join
    * ([[DedupOps.simhashNearDups]]): recall 1.0 by construction, equi-
    * join-only (no cartesian), so the plan is the text near-dup plan over
    * 8-byte keys. At 100 TB the decode pass dominates and scales linearly
    * with executors; everything after it handles 8 bytes per image. */
  def imageNearDups(media: DataFrame, idCol: String = "media_id",
                    maxHamming: Int = 3): DataFrame =
    DedupOps.simhashNearDups(
      imageAHashes(media, idCol).withColumnRenamed("ahash", "simhash"),
      idCol, maxDist = maxHamming, sigBits = 64)
}
