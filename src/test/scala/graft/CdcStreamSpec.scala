package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures
import graft.sinks.SnapshotTable
import graft.streaming.CdcStream

class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow stream drains backlog, merges latest-per-key, " +
      "and a second run only processes new files") {
    val root = tmpDir("stream")
    val topicDir = s"$root/topic"
    Files.createDirectories(Paths.get(topicDir))
    val ps = Fixtures.providerCdcJsonl(s"$topicDir/batch1.jsonl", n = 20)
    val table = new SnapshotTable(spark, s"$root/raw_provider")

    CdcStream.ingestAvailableNow(spark, topicDir, table, "provider_id",
      s"$root/ckpt")
    assert(table.read().count() == 20)
    val v1 = table.latestVersion.get

    // second file: late update for provider 1 with newer ts
    val newer = Fixtures.envelope(
      Some("""{"provider_id": 1, "provider_name": "Streamed Rename",
        | "npi": "0000000000", "specialty": "Cardiology",
        | "care_site": "City Hospital", "provider_source_value": "x",
        | "specialty_source_value": "y",
        | "provider_id_source_value": "z"}""".stripMargin.replace("\n", "")),
      "u", 1757700099999L)
    Files.write(Paths.get(s"$topicDir/batch2.jsonl"), newer.getBytes("UTF-8"))

    CdcStream.ingestAvailableNow(spark, topicDir, table, "provider_id",
      s"$root/ckpt")
    assert(table.read().count() == 20) // still one row per key
    val name1 = graft.sources.Debezium.shred(
      table.read().filter($"provider_id" === "1"),
      graft.ops.ProviderModels.providerSchema)
      .head().getAs[String]("provider_name")
    assert(name1 == "Streamed Rename")
    // checkpoint advanced: merges happened, version moved past v1
    assert(table.latestVersion.get > v1)
    // third run with no new files: no-op (checkpoint skips all files)
    val vBefore = table.latestVersion.get
    CdcStream.ingestAvailableNow(spark, topicDir, table, "provider_id",
      s"$root/ckpt")
    assert(table.latestVersion.get == vBefore)

    // a garbage line in a later file quarantines; merges stay clean
    Files.write(Paths.get(s"$topicDir/batch3.jsonl"),
      "THIS IS NOT AN ENVELOPE".getBytes("UTF-8"))
    val quarantine = new SnapshotTable(spark, s"$root/quarantine")
    CdcStream.ingestAvailableNow(spark, topicDir, table, "provider_id",
      s"$root/ckpt", quarantine = Some(quarantine))
    assert(table.read().count() == 20)
    assert(quarantine.read().count() == 1)
    assert(quarantine.read().head().getString(0).startsWith("THIS IS NOT"))
  }

  // ---- Kafka-contract twins: semantics pinned before a broker exists ----

  private def provEnv(id: Int, name: String, ts: Long): String =
    Fixtures.envelope(Some(
      s"""{"provider_id": $id, "provider_name": "$name", """ +
        s""""npi": "000000$id", "specialty": "Cardiology", """ +
        s""""care_site": "City Hospital", "provider_source_value": "x", """ +
        s""""specialty_source_value": "y", "provider_id_source_value": "z"}"""),
      "u", ts)

  private def nameOf(table: SnapshotTable, id: Int): String =
    graft.sources.Debezium.shred(
        table.read().filter($"provider_id" === id.toString),
        graft.ops.ProviderModels.providerSchema)
      .head().getAs[String]("provider_name")

  test("multi-partition topic dirs: final state follows ts_ms, not partition arrival order") {
    // Kafka guarantees order WITHIN a partition only; a key's updates can
    // land on different partitions in any interleaving. The engine's
    // contract: latest-per-key is decided by the envelope's ts_ms, so the
    // final state must be invariant to which partition is read first.
    def writeTopic(root: String, flip: Boolean): String = {
      val dir = s"$root/topic"
      Seq(0, 1).foreach(p =>
        Files.createDirectories(Paths.get(s"$dir/partition=$p")))
      val p0 = if (flip) 1 else 0
      val p1 = 1 - p0
      // key 1: the NEWER update (ts 3000) sits on one partition, an older
      // one (ts 2000) on the other; key 2 mirrors with partitions swapped
      Files.write(Paths.get(s"$dir/partition=$p0/a.jsonl"), Seq(
        provEnv(1, "one-v1", 1000L), provEnv(1, "one-NEWEST", 3000L),
        provEnv(2, "two-v1", 1000L)).mkString("\n").getBytes("UTF-8"))
      Files.write(Paths.get(s"$dir/partition=$p1/b.jsonl"), Seq(
        provEnv(1, "one-stale", 2000L),
        provEnv(2, "two-NEWEST", 9000L), provEnv(2, "two-stale", 5000L))
        .mkString("\n").getBytes("UTF-8"))
      dir
    }
    val finals = Seq(false, true).map { flip =>
      val root = tmpDir(s"kpart$flip")
      val table = new SnapshotTable(spark, s"$root/raw")
      CdcStream.ingestAvailableNow(spark, writeTopic(root, flip), table,
        "provider_id", s"$root/ckpt")
      assert(table.read().count() == 2)
      (nameOf(table, 1), nameOf(table, 2))
    }
    assert(finals.forall(_ == ("one-NEWEST", "two-NEWEST")),
      s"ts_ms must decide, arrival must not: $finals")
  }

  test("maxFilesPerTrigger (maxOffsetsPerTrigger twin) bounds batches without changing results") {
    // one topic, 4 files; bounded run must split the SAME backlog into
    // multiple micro-batches and still converge to the identical table —
    // the batching-invariance a broker's maxOffsetsPerTrigger relies on
    def writeTopic(root: String): String = {
      val dir = s"$root/topic"
      Files.createDirectories(Paths.get(dir))
      (1 to 4).foreach { f =>
        Files.write(Paths.get(s"$dir/f$f.jsonl"),
          (1 to 5).map(id =>
            provEnv(id, s"p$id-f$f", f * 1000L + id)).mkString("\n")
            .getBytes("UTF-8"))
      }
      dir
    }
    val rootB = tmpDir("kbounded")
    val bounded = new SnapshotTable(spark, s"$rootB/raw")
    val nBatches = CdcStream.ingestAvailableNow(spark, writeTopic(rootB),
      bounded, "provider_id", s"$rootB/ckpt", maxFilesPerTrigger = Some(1))
    assert(nBatches >= 4, s"expected >=4 bounded micro-batches, got $nBatches")

    val rootU = tmpDir("kunbounded")
    val unbounded = new SnapshotTable(spark, s"$rootU/raw")
    val oneBatch = CdcStream.ingestAvailableNow(spark, writeTopic(rootU),
      unbounded, "provider_id", s"$rootU/ckpt")
    assert(oneBatch == 1L, s"unbounded AvailableNow should drain in 1, got $oneBatch")

    def shredded(t: SnapshotTable) = graft.sources.Debezium.shred(
        t.read(), graft.ops.ProviderModels.providerSchema)
      .select($"provider_id", $"provider_name").orderBy($"provider_id")
      .collect().toSeq
    assert(shredded(bounded) == shredded(unbounded))
    assert(shredded(bounded).forall(_.getString(1).endsWith("-f4")),
      "every key must end at its last file's value")
  }

  test("typed single-parse streaming path produces the same raw contract") {
    val root = tmpDir("stream_typed")
    val topicDir = s"$root/topic"
    Files.createDirectories(Paths.get(topicDir))
    Fixtures.providerCdcJsonl(s"$topicDir/batch1.jsonl", n = 20)

    val untypedT = new SnapshotTable(spark, s"$root/raw_untyped")
    CdcStream.ingestAvailableNow(spark, topicDir, untypedT, "provider_id",
      s"$root/ckpt_u")
    val typedT = new SnapshotTable(spark, s"$root/raw_typed")
    CdcStream.ingestAvailableNow(spark, topicDir, typedT, "provider_id",
      s"$root/ckpt_t",
      rowSchema = Some(graft.ops.ProviderModels.providerSchema))

    assert(typedT.read().columns.sorted.toSeq ==
      untypedT.read().columns.sorted.toSeq)
    assert(typedT.read().count() == 20)
    // both paths shred to identical typed values
    def shredded(t: SnapshotTable) = graft.sources.Debezium.shred(
        t.read(), graft.ops.ProviderModels.providerSchema)
      .select($"provider_id", $"provider_name", $"npi", $"care_site")
      .orderBy($"provider_id")
    assert(shredded(typedT).collect().toSeq ==
      shredded(untypedT).collect().toSeq)
  }
}
