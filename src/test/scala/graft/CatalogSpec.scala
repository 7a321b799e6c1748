package graft

import graft.catalog.GraftCatalog
import graft.sources.{Connectors, ObjectStore}

class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("catalog discovers published tables from lake layout and registers views") {
    val root = tmpDir("cat")
    val cat = new GraftCatalog(spark, root)
    assert(cat.listTables().isEmpty)
    cat.table("raw", "t1").overwrite(Seq((1, "a")).toDF("id", "v"))
    cat.table("curated", "t2").overwrite(Seq((2, "b")).toDF("id", "v"))
    // staged-but-unpublished tables are invisible
    cat.table("raw", "ghost").stage(Seq((9, "x")).toDF("id", "v"))
    assert(cat.listTables().toSet == Set(("raw", "t1"), ("curated", "t2")))
    val views = cat.registerAll()
    assert(views.toSet == Set("raw__t1", "curated__t2"))
    assert(cat.sql("SELECT v FROM raw__t1 WHERE id = 1").head().getString(0) == "a")
    assert(cat.sql(
      "SELECT count(*) FROM raw__t1 JOIN curated__t2 USING (v)").head().getLong(0) == 0)
  }

  test("jdbc/kafka option builders produce the full connector config") {
    val j = Connectors.jdbcOptions(
      Connectors.JdbcConfig("jdbc:postgresql://db:5432/x", "u", "p",
        partitionColumn = Some("id"), lowerBound = Some(0L),
        upperBound = Some(1000000L), numPartitions = Some(32)),
      "public.provider")
    assert(j("dbtable") == "public.provider" && j("numPartitions") == "32" &&
      j("partitionColumn") == "id" && j("fetchsize") == "10000")
    val k = Connectors.kafkaOptions(
      Connectors.KafkaConfig("broker:9092"), Seq("cdc.public.provider", "cdc.public.care_site"))
    assert(k("subscribe") == "cdc.public.provider,cdc.public.care_site")
    assert(k("startingOffsets") == "earliest" && k("endingOffsets") == "latest")
  }

  test("object store: upload/download/list/exists/delete round-trip") {
    val store = new ObjectStore(spark, tmpDir("store"))
    store.mkdirs("healthcare")
    store.upload("healthcare/raw/providers.csv", "a,b\n1,2".getBytes("UTF-8"))
    assert(store.exists("healthcare/raw/providers.csv"))
    assert(new String(store.download("healthcare/raw/providers.csv"), "UTF-8")
      == "a,b\n1,2")
    assert(store.list("healthcare/raw") == Seq("providers.csv"))
    assert(store.delete("healthcare", recursive = true))
    assert(!store.exists("healthcare/raw/providers.csv"))
  }

  test("pipeline run report is valid JSON with per-stage check detail") {
    import graft.pipeline._
    import graft.checks.Checks.NotNull
    val p = new Pipeline(Seq(Stage("s1",
      build = (s, _) => { import s.implicits._; Seq(Some(1), None).toDF("x") },
      checks = Seq(NotNull("x")))))
    val r = p.run(spark, _ => ())
    val path = tmpDir("report") + "/run_report.json"
    r.writeReport(path)
    val json = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    assert(json.contains("\"ok\":false"))
    assert(json.contains("\"check\":\"not_null\"") && json.contains("\"violations\":1"))
    // HTML twin (the Elementary report-artifact parity check,
    // reference test_dbt.py:172-177): artifact exists, carries the
    // verdict, stage names, and check outcomes
    val htmlPath = tmpDir("report") + "/run_report.html"
    r.writeReportHtml(htmlPath)
    val html = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(htmlPath)), "UTF-8")
    assert(html.startsWith("<!DOCTYPE html>"))
    assert(html.contains("FAILED") && html.contains("s1"))
    assert(html.contains("not_null(x)") && html.contains("&times;1"))
  }
}
