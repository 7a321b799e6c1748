package graft

import java.sql.Timestamp

import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.CorpusStream

/** Streaming-native dedup: state-store fingerprint suppression inside the
  * watermark horizon, across micro-batches. */
object WatermarkDedupSpec {
  // top-level so Spark can derive an Encoder (inner classes cannot)
  case class Doc(doc_id: Long, text: String, ts: Timestamp)
}

class WatermarkDedupSpec extends SparkSpec {
  import spark.implicits._
  import WatermarkDedupSpec.Doc

  private def d(id: Long, text: String, minute: Long) =
    Doc(id, text, new Timestamp(1700000000000L + minute * 60000L))

  private def stageFile(docs: Seq[Doc], inDir: String, name: String): Unit = {
    val tmp = tmpDir(s"stage_$name")
    docs.toDF().repartition(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$inDir/$name.parquet"))
  }

  test("duplicate fingerprints are suppressed across micro-batches within the horizon") {
    val in = tmpDir("wmdedup_in")
    val stream = spark.readStream.schema(Seq.empty[Doc].toDF().schema).parquet(in)
    val q = CorpusStream.dedupWithinWatermark(stream, "text", "ts", "30 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("wmdedup").start()
    try {
      // batch 1: in-batch duplicate (alpha twice) collapses to the first
      stageFile(Seq(d(1, "alpha", 0), d(2, "alpha", 1), d(3, "beta", 2)),
        in, "b1")
      q.processAllAvailable()
      assert(spark.table("wmdedup").select($"doc_id").as[Long].collect().toSet
        == Set(1L, 3L))
      // batch 2: alpha again (minute 5, within 30-min horizon) → suppressed
      // by STATE from batch 1; novel gamma admitted
      stageFile(Seq(d(4, "alpha", 5), d(5, "gamma", 6)), in, "b2")
      q.processAllAvailable()
      assert(spark.table("wmdedup").select($"doc_id").as[Long].collect().toSet
        == Set(1L, 3L, 5L))
    } finally q.stop()
  }
}
