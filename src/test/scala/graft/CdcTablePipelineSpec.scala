package graft

import org.apache.spark.sql.types._

import graft.fixtures.Fixtures
import graft.pipeline.CdcTablePipeline
import graft.pipeline.CdcTablePipeline.TableSpec

class CdcTablePipelineSpec extends SparkSpec {
  import spark.implicits._

  test("spec-driven pipeline ingests a fleet of CDC tables in one run") {
    val root = tmpDir("fleet")
    // table A: providers (reuse the standard fixture)
    Fixtures.providerCdcJsonl(s"$root/topics/provider.jsonl", n = 15)
    // table B: an ad-hoc inventory table, including a tombstone
    val invLines = (1 to 6).map { i =>
      Fixtures.envelope(Some(
        s"""{"item_id": $i, "sku": "SKU-$i", "qty": ${i * 10}}"""),
        "c", 1757700000000L + i, table = "inventory")
    } ++ Seq(
      Fixtures.envelope(None, "d", 1757700009999L, table = "inventory"),
      """{"truncated": "garbage not a debezium envel""") // malformed line
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$root/topics/inventory.jsonl"),
      invLines.mkString("\n").getBytes("UTF-8"))

    val specs = Seq(
      TableSpec("provider", s"$root/topics/provider.jsonl", "provider_id",
        graft.ops.ProviderModels.providerSchema),
      TableSpec("inventory", s"$root/topics/inventory.jsonl", "item_id",
        StructType(Seq(
          StructField("item_id", IntegerType),
          StructField("sku", StringType),
          StructField("qty", IntegerType)))))
    val result = CdcTablePipeline.build(spark, specs, s"$root/lake")
      .runParallel(spark, 4, _ => ())
    assert(result.ok, result.stages.map(s => s"${s.name}:${s.error}").mkString(";"))
    assert(result.stages.map(_.name).toSet == Set(
      "raw_provider", "shredded_provider", "raw_inventory", "shredded_inventory"))

    val inv = spark.read.parquet(s"$root/lake/shredded/inventory/snapshot=1")
    assert(inv.count() == 6) // tombstone dropped, 6 typed rows
    // the garbage line quarantined, not silently conflated with tombstones
    val q = new graft.sinks.SnapshotTable(
      spark, s"$root/lake/quarantine/inventory_cdc")
    assert(q.exists && q.read().count() == 1)
    assert(q.read().head().getString(0).contains("garbage"))
    assert(inv.schema("qty").dataType == IntegerType)
    assert(inv.filter($"sku" === "SKU-3").head().getAs[Int]("qty") == 30)
    val prov = spark.read.parquet(s"$root/lake/shredded/provider/snapshot=1")
    assert(prov.count() == 15)
    assert(prov.columns.contains("ingestion_cdc_date")) // partition col carried
  }
}
