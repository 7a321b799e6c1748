package graft

import java.nio.file.{Files, Paths}

import graft.sinks.{AppendOnlyStore, SnapshotTable}
import graft.streaming.CorpusStream

class CorpusStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming ingestion dedups across micro-batches and runs") {
    val root = tmpDir("corpstream")
    val docsDir = s"$root/drop"
    Files.createDirectories(Paths.get(docsDir))
    val corpus = new SnapshotTable(spark, s"$root/corpus")
    val fps = new AppendOnlyStore(spark, s"$root/fps")
    val schema = Seq((1L, "x")).toDF("doc_id", "text").schema

    Seq((1L, "first document body"), (2L, "second document body"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$docsDir/b1")
    CorpusStream.ingestDedupedAvailableNow(spark, s"$docsDir/*", schema,
      corpus, fps, s"$root/ckpt")
    assert(corpus.read().count() == 2)

    // second drop: one replayed text (different id), one novel
    Seq((3L, "FIRST  document body"), (4L, "a genuinely new document"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$docsDir/b2")
    CorpusStream.ingestDedupedAvailableNow(spark, s"$docsDir/*", schema,
      corpus, fps, s"$root/ckpt")
    val ids = corpus.read().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L), s"got $ids") // 3 deduped (case/ws variant of 1)
    assert(fps.read().count() == 3)

    // third run, nothing new: checkpoint skips everything, state unchanged
    val v = corpus.latestVersion.get
    CorpusStream.ingestDedupedAvailableNow(spark, s"$docsDir/*", schema,
      corpus, fps, s"$root/ckpt")
    assert(corpus.latestVersion.get == v)
  }
}
