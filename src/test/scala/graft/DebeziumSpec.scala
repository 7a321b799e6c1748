package graft

import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures
import graft.ops.ProviderModels
import graft.sources.Debezium

class DebeziumSpec extends SparkSpec {

  lazy val cdcPath: String = {
    val p = tmpDir("cdc") + "/provider.jsonl"
    Fixtures.providerCdcJsonl(p, n = 50)
    p
  }

  test("tombstones (after=null) are dropped — deletes never reach the lake") {
    val cdc = Debezium.readJsonl(spark, cdcPath)
    val raw = ProviderModels.rawProvider(cdc)
    // fixture: ids % 7 == 0 got a delete event; the create/update rows for
    // those ids must STILL be present (delete drops the tombstone row only)
    assert(raw.filter(col("nested_data").isNull).count() == 0)
    val opsSeen = cdc.select(get_json_object(col("value"), "$.payload.op").as("op"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(opsSeen == Set("c", "u", "d"))
    assert(raw.count() == 50 + 2 * 10) // 50 creates + 2 updates for ids%5==0
  }

  test("snapshot-read ops ('r') flow through as upserts like creates") {
    val p = tmpDir("rop") + "/t.jsonl"
    java.nio.file.Files.write(java.nio.file.Paths.get(p), Seq(
      Fixtures.envelope(Some("""{"care_site_id": 1, "care_site_name": "A", "care_site_source_value": "a"}"""),
        "r", 1757700000001L, table = "care_site"),
      Fixtures.envelope(Some("""{"care_site_id": 1, "care_site_name": "B", "care_site_source_value": "b"}"""),
        "u", 1757700000002L, table = "care_site")
    ).mkString("\n").getBytes("UTF-8"))
    val raw = Debezium.rawModel(Debezium.readJsonl(spark, p), "care_site_id")
    assert(raw.count() == 2) // 'r' kept, not treated as tombstone
    val latest = Debezium.latestPerKey(raw, Seq("care_site_id"),
      Seq(col("cdc_ts_ms")))
    val name = Debezium.shred(latest, graft.ops.ProviderModels.careSiteSchema)
      .head().getAs[String]("care_site_name")
    assert(name == "B") // update beats the snapshot read
  }

  test("typed single-parse raw model agrees with the schema-free path") {
    val cdc = Debezium.readJsonl(spark, cdcPath)
    val free = ProviderModels.rawProvider(cdc)
    val typed = Debezium.rawModelTyped(cdc, "provider_id",
      ProviderModels.providerSchema).drop("after")
    assert(typed.count() == free.count())
    def shredded(df: org.apache.spark.sql.DataFrame) =
      Debezium.shred(df.select("nested_data", "cdc_ts_ms"),
          ProviderModels.providerSchema)
        .select("provider_id", "provider_name", "npi", "cdc_ts_ms")
        .collect().map(_.toSeq).toSet
    assert(shredded(typed) == shredded(free))
  }

  test("shred round-trips the after-image into typed columns") {
    val raw = ProviderModels.rawProvider(Debezium.readJsonl(spark, cdcPath))
    val shredded = Debezium.shred(raw, ProviderModels.providerSchema)
    assert(shredded.schema("provider_id").dataType.typeName == "integer")
    val r = shredded.filter(col("provider_id") === 1)
      .select("provider_name", "npi").collect()
    assert(r.length == 1 && r(0).getString(1).length == 10)
  }

  test("latest-per-key picks newest by ts_ms; stale out-of-order update loses") {
    val raw = ProviderModels.rawProvider(Debezium.readJsonl(spark, cdcPath))
    val latest = Debezium.latestPerKey(raw, Seq("provider_id"), Seq(col("cdc_ts_ms")))
    assert(latest.count() == 50)
    val shredded = Debezium.shred(latest, ProviderModels.providerSchema)
    val names = shredded.select("provider_id", "provider_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val ps = Fixtures.providers(50)
    ps.foreach { p =>
      assert(names(p.id) == Fixtures.expectedName(p),
        s"id=${p.id}: got ${names(p.id)}")
      if (p.id % 5 == 0) assert(!names(p.id).startsWith("Stale"))
    }
  }

  test("signedDeltas: c→+after, u→−before+after, d→−before; nets to final state") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val row = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType)))
    def env(op: String, before: String, after: String) =
      s"""{"payload": {"before": $before, "after": $after, "op": "$op", "ts_ms": 1}}"""
    val cdc = Seq(
      env("c", "null", """{"id": 1, "v": "a"}"""),
      env("c", "null", """{"id": 2, "v": "b"}"""),
      env("r", "null", """{"id": 3, "v": "c"}"""),
      env("u", """{"id": 1, "v": "a"}""", """{"id": 1, "v": "a2"}"""),
      env("d", """{"id": 2, "v": "b"}""", "null")
    ).toDF("value")
    val signed = Debezium.signedDeltas(cdc, row)
    assert(signed.columns.toSeq == Seq("id", "v", "__delta"))
    val got = signed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(got == Map(
      (1L, "a", 1L) -> 1, (2L, "b", 1L) -> 1, (3L, "c", 1L) -> 1,
      (1L, "a", -1L) -> 1, (1L, "a2", 1L) -> 1, (2L, "b", -1L) -> 1))
    // net state = (1,a2), (3,c) — exactly what a signed store would hold
    val net = signed.groupBy($"id", $"v").agg(sum($"__delta").as("m"))
      .filter($"m" =!= 0).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(net == Set((1L, "a2", 1L), (3L, "c", 1L)))
  }

  test("signedDeltas REFUSES a delete lacking its before-image (never drops it)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val row = StructType(Seq(StructField("id", LongType)))
    val cdc = Seq(
      """{"payload": {"before": null, "after": null, "op": "d", "ts_ms": 1}}"""
    ).toDF("value")
    val e = intercept[Exception] {
      Debezium.signedDeltas(cdc, row).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("refusing to drop deletes")),
      s"unexpected error: $e")
  }

  test("signedDeltas REFUSES non-c/r/u/d ops with a dedicated error") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val row = StructType(Seq(StructField("id", LongType)))
    // a Debezium 't' (truncate) envelope: no multiset-delta reading —
    // counting it as an insert (the old fallthrough) would corrupt
    // every maintained view; it must raise the DEDICATED message, not
    // the misleading replica-identity one
    val cdc = Seq(
      """{"payload": {"before": null, "after": {"id": 7}, "op": "t", "ts_ms": 1}}"""
    ).toDF("value")
    val e = intercept[Exception] {
      Debezium.signedDeltas(cdc, row).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("unsupported CDC op 't'")),
      s"unexpected error: $e")
  }
}
