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
