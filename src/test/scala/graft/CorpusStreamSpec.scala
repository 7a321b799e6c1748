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

  test("near-dup streaming ingestion rejects cross-batch near-duplicates") {
    val root = tmpDir("corpstream-near")
    val docsDir = s"$root/drop"
    Files.createDirectories(Paths.get(docsDir))
    val corpus = new SnapshotTable(spark, s"$root/corpus")
    val buckets = new AppendOnlyStore(spark, s"$root/buckets",
      prefixCol = "bucket_key")
    val schema = Seq((1L, "x")).toDF("doc_id", "text").schema
    val base = "the quick brown fox jumps over the lazy dog near the old " +
      "stone bridge while the miller grinds wheat into flour all day"

    Seq((1L, base), (2L, "an unrelated text on catalyst plan rules and " +
      "broadcast joins in adaptive query execution at petabyte scale"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$docsDir/b1")
    CorpusStream.ingestNearDedupedAvailableNow(spark, s"$docsDir/*", schema,
      corpus, buckets, s"$root/ckpt")
    assert(corpus.read().count() == 2)

    Seq((3L, base + " long"), (4L, "a genuinely novel document describing " +
      "embedded derby integration tests for jdbc connector round trips"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$docsDir/b2")
    CorpusStream.ingestNearDedupedAvailableNow(spark, s"$docsDir/*", schema,
      corpus, buckets, s"$root/ckpt")
    val ids = corpus.read().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L), s"got $ids") // 3 = near-dup of stored 1
  }
}
