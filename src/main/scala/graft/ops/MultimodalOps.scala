package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side machinery here is REAL and tested — schema, partition
  * batching, feature extraction signatures, the executor-side processing
  * loop. The codec layer (`decodeImageStub`) is a clearly-marked
  * deterministic FAKE: this container has no image/audio libraries, so the
  * stub derives plausible metadata purely from the bytes. Swapping in a
  * real decoder changes exactly one function and zero plumbing.
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

  /** STUB — stands in for a real image/audio decode (???-equivalent).
    * Deterministic in the payload bytes so tests and oracles are stable. */
  def decodeImageStub(bytes: Array[Byte]): (Int, Int, String) = {
    val h = bytes.foldLeft(1125899906842597L)((acc, b) => acc * 31 + b)
    val width = 64 + math.floorMod(h, 1024).toInt
    val height = 64 + math.floorMod(h >> 16, 1024).toInt
    val fmt = Seq("png", "jpeg", "webp")(math.floorMod(h >> 32, 3).toInt)
    (width, height, fmt)
  }

  /** STUB frame sampler for video payloads: deterministic frame count. */
  def frameSampleStub(bytes: Array[Byte], everyN: Int): Int =
    math.max(1, (bytes.length / math.max(1, everyN)) % 512)

  private def contentHash(bytes: Array[Byte]): Long =
    bytes.foldLeft(-7046029254386353131L)((acc, b) => (acc ^ b) * 1099511628211L)

  /** Partition-batched feature extraction — the `mapInPandas` shape in
    * Scala: one iterator per partition, codec state initialized once per
    * partition, fixed-width typed output. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "payload").as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec" init happens here (stub: nothing to init)
        it.map { case (id, kind, payload) =>
          val (w, h, fmt) = decodeImageStub(payload)
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

  /** STUB resize: emits a deterministic derived payload (here: truncated
    * bytes) with updated metadata — the write-back plumbing for a real
    * resize. */
  def resizeStub(media: DataFrame, maxBytes: Int): DataFrame = {
    val truncate = udf((b: Array[Byte]) => b.take(maxBytes))
    media.withColumn("payload", truncate(col("payload")))
      .withColumn("meta", struct(
        col("meta.source"),
        concat(col("meta.declared_format"), lit(s"-resized")).as("declared_format")))
  }

  /** Build a synthetic media table from any text corpus — deterministic
    * payloads so the multimodal path is exercisable without binary
    * testdata. kind cycles image/audio/video by id. */
  def synthesizeFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast(IntegerType)).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(lit("synthetic").as("source"),
        lit("raw").as("declared_format")).as("meta"))
}
