package graft

import org.apache.spark.sql.functions._

import graft.checks.Checks.{NotNull, Unique}
import graft.fixtures.Fixtures
import graft.pipeline._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def noop = (s: org.apache.spark.sql.SparkSession,
                      _: Map[String, org.apache.spark.sql.DataFrame]) => {
    import s.implicits._
    Seq(1).toDF("x")
  }

  test("topological order respects deps; cycles rejected") {
    val p = new Pipeline(Seq(
      Stage("c", deps = Seq("b"), build = noop),
      Stage("a", build = noop),
      Stage("b", deps = Seq("a"), build = noop)))
    assert(p.ordered.map(_.name) == Seq("a", "b", "c"))
    intercept[IllegalArgumentException] {
      new Pipeline(Seq(
        Stage("x", deps = Seq("y"), build = noop),
        Stage("y", deps = Seq("x"), build = noop))).ordered
    }
  }

  test("tag:raw+ selection excludes tagged nodes and descendants") {
    val p = new Pipeline(Seq(
      Stage("r1", tags = Set("raw"), build = noop),
      Stage("c1", deps = Seq("r1"), build = noop),
      Stage("other", build = noop)))
    assert(p.exclude("tag:raw+").stages.map(_.name) == Seq("other"))
    assert(p.select("tag:raw+").stages.map(_.name).toSet == Set("r1", "c1"))
    assert(p.select("r1+").stages.map(_.name).toSet == Set("r1", "c1"))
  }

  test("fail-fast: downstream stages don't run after a failed check") {
    var ran = List.empty[String]
    val p = new Pipeline(Seq(
      Stage("bad", build = (s, _) => {
        ran ::= "bad"; import s.implicits._
        Seq(1, 1).toDF("id") // duplicate → unique fails
      }, checks = Seq(Unique(Seq("id")))),
      Stage("after", deps = Seq("bad"), build = (s, _) => { ran ::= "after"; noop(s, Map()) })))
    val r = p.run(spark, _ => ())
    assert(!r.ok && r.stages.map(_.name) == Seq("bad"))
    assert(ran == List("bad"))
  }

  test("row-level quarantine diverts bad rows; clean rows publish") {
    val root = tmpDir("pipe-quarantine")
    val target = new graft.sinks.SnapshotTable(spark, s"$root/curated")
    val rejects = new graft.sinks.SnapshotTable(spark, s"$root/quarantine")
    val p = new Pipeline(Seq(
      Stage("docs",
        build = (s, _) => {
          import s.implicits._
          Seq((1L, "ok"), (2L, null), (3L, "ok"), (4L, null))
            .toDF("id", "text")
        },
        quarantine = Some(Quarantine(rejects,
          Seq(graft.checks.Checks.NotNull("text")))),
        // the hard invariant still gates publication — on CLEAN rows only
        checks = Seq(NotNull("text")),
        sink = Some(Overwrite(target)))))
    val r = p.run(spark, _ => ())
    assert(r.ok, "clean rows must publish after the split")
    assert(r.stages.head.quarantined == 2L)
    assert(r.toJson.contains("\"quarantined\":2"))
    assert(target.read().count() == 2)
    val q = rejects.read()
    assert(q.count() == 2)
    assert(q.columns.contains("__violations") && q.columns.contains("__stage"))
    assert(q.select(concat_ws(";", $"__violations")).as[String].collect()
      .forall(_ == "not_null:text"))
  }

  test("end-to-end provider pipeline: CDC → raw → curated → harmonized") {
    val root = tmpDir("lake")
    val provPath = s"$root/topics/provider.jsonl"
    val sitePath = s"$root/topics/care_site.jsonl"
    val csvPath = s"$root/dropzone/providers.csv"
    val ps = Fixtures.providerCdcJsonl(provPath, n = 40)
    // care_site topic: plain creates of the 8 sites
    val siteLines = Fixtures.careSites.map { case (i, n, v) =>
      Fixtures.envelope(Some(
        s"""{"care_site_id": $i, "care_site_name": "$n", "care_site_source_value": "$v"}"""),
        "c", 1757700000000L + i, table = "care_site")
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(sitePath),
      siteLines.mkString("\n").getBytes("UTF-8"))
    Fixtures.writeSampleCsv(csvPath)

    val cfg = ProviderPipeline.Config(provPath, sitePath, csvPath, s"$root/lake")
    val result = ProviderPipeline.build(spark, cfg).run(spark, _ => ())
    assert(result.ok, result.stages.map(s => s"${s.name}:${s.error}").mkString(";"))
    assert(result.stages.map(_.name) == Seq(
      "raw_provider_postgres", "raw_care_site_postgres", "curated_provider",
      "csv_providers_clean", "curated_provider_harmonized"))

    // curated output: one row per provider, post-merge names, enriched sites
    val curated = spark.read.parquet(
      s"$root/lake/curated/provider/snapshot=1")
    assert(curated.count() == 40)
    val names = curated.select("provider_id", "provider_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    ps.foreach(p => assert(names(p.id) == Fixtures.expectedName(p)))
    // every provider's care_site matched a canonical site → no null ids
    assert(curated.filter($"care_site_id".isNull).count() == 0)

    // csv cleaning: 15 rows → 13 entities (3 dup ProviderID-001 variants → 1)
    val harmonized = spark.read.parquet(
      s"$root/lake/curated/provider_harmonized/snapshot=1")
    assert(harmonized.count() == 13)
    // canonical-name rule kept the longest variant of provider 001
    val p1 = harmonized.filter($"csv_provider_id" === "001").collect()
    assert(p1.length == 1 && p1(0).getAs[String]("csv_provider_name") == "Dr. John Doe")
    // literal "NULL" NPI became real null
    assert(harmonized.filter($"csv_provider_id" === "004")
      .head().getAs[String]("npi") == null)
  }

  test("malformed CSV rows land in the quarantine table, pipeline still passes") {
    val root = tmpDir("lakeq")
    val provPath = s"$root/topics/provider.jsonl"
    val sitePath = s"$root/topics/care_site.jsonl"
    val csvPath = s"$root/dropzone/providers.csv"
    Fixtures.providerCdcJsonl(provPath, n = 5)
    java.nio.file.Files.write(java.nio.file.Paths.get(sitePath),
      Fixtures.careSites.map { case (i, n, v) =>
        Fixtures.envelope(Some(
          s"""{"care_site_id": $i, "care_site_name": "$n", "care_site_source_value": "$v"}"""),
          "c", 1757700000000L + i, table = "care_site")
      }.mkString("\n").getBytes("UTF-8"))
    // sample.csv plus one row with broken quoting
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(csvPath).getParent)
    java.nio.file.Files.write(java.nio.file.Paths.get(csvPath),
      (Fixtures.sampleCsv + "\nBroken \"Row,099,123,Peds,Nowhere,x,y").getBytes("UTF-8"))
    val cfg = ProviderPipeline.Config(provPath, sitePath, csvPath, s"$root/lake")
    val result = ProviderPipeline.build(spark, cfg).run(spark, _ => ())
    assert(result.ok)
    val q = new graft.sinks.SnapshotTable(spark, s"$root/lake/quarantine/csv_providers")
    assert(q.exists && q.read().count() == 1)
    assert(q.read().head().getString(0).contains("Broken"))
  }

  test("re-running the pipeline is idempotent for the merge stage") {
    val root = tmpDir("lake2")
    val provPath = s"$root/topics/provider.jsonl"
    val sitePath = s"$root/topics/care_site.jsonl"
    val csvPath = s"$root/dropzone/providers.csv"
    Fixtures.providerCdcJsonl(provPath, n = 10)
    java.nio.file.Files.write(java.nio.file.Paths.get(sitePath),
      Fixtures.careSites.map { case (i, n, v) =>
        Fixtures.envelope(Some(
          s"""{"care_site_id": $i, "care_site_name": "$n", "care_site_source_value": "$v"}"""),
          "c", 1757700000000L + i, table = "care_site")
      }.mkString("\n").getBytes("UTF-8"))
    Fixtures.writeSampleCsv(csvPath)
    val cfg = ProviderPipeline.Config(provPath, sitePath, csvPath, s"$root/lake")
    val p = ProviderPipeline.build(spark, cfg)
    assert(p.run(spark, _ => ()).ok)
    val first = spark.read.parquet(s"$root/lake/raw/provider_postgres/snapshot=1")
      .drop("ingestion_timestamp").orderBy("provider_id").collect().toSeq
    assert(ProviderPipeline.build(spark, cfg).run(spark, _ => ()).ok)
    val second = new graft.sinks.SnapshotTable(spark, s"$root/lake/raw/provider_postgres")
      .read().drop("ingestion_timestamp").orderBy("provider_id").collect().toSeq
    assert(first == second)
  }
}
