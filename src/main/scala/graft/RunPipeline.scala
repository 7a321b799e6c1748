package graft

import graft.fixtures.Fixtures
import graft.pipeline.ProviderPipeline

/** CLI entry: seed deterministic CDC/CSV fixtures and run the full
  * provider pipeline end-to-end (raw merge → curated WAP → harmonized).
  *
  * Usage: `runMain graft.RunPipeline [workDir] [nProviders] [--parallel]`
  * Prints per-stage results and the curated/harmonized row counts.
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val pos = args.filterNot(_.startsWith("--"))
    val work = pos.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-pipeline").toString)
    val n = pos.lift(1).map(_.toInt).getOrElse(1000)
    val spark = GraftSession.getOrCreate("graft-pipeline")

    val provPath = s"$work/topics/provider.jsonl"
    val sitePath = s"$work/topics/care_site.jsonl"
    val csvPath = s"$work/dropzone/providers.csv"
    Fixtures.providerCdcJsonl(provPath, n)
    java.nio.file.Files.write(java.nio.file.Paths.get(sitePath),
      Fixtures.careSites.map { case (i, nm, v) =>
        Fixtures.envelope(Some(
          s"""{"care_site_id": $i, "care_site_name": "$nm", "care_site_source_value": "$v"}"""),
          "c", 1757700000000L + i, table = "care_site")
      }.mkString("\n").getBytes("UTF-8"))
    Fixtures.writeSampleCsv(csvPath)

    val cfg = ProviderPipeline.Config(provPath, sitePath, csvPath, s"$work/lake")
    val pipeline = ProviderPipeline.build(spark, cfg)
    val result =
      if (flags.contains("--parallel")) pipeline.runParallel(spark)
      else pipeline.run(spark)

    result.stages.foreach { st =>
      println(f"[stage] ${st.name}%-28s ok=${st.ok} version=${st.publishedVersion.getOrElse(-1L)} ${st.durationMs}ms" +
        st.error.map(e => s" error=$e").getOrElse(""))
    }
    if (result.ok) {
      val curated = new graft.sinks.SnapshotTable(spark, s"$work/lake/curated/provider").read()
      val harmonized = new graft.sinks.SnapshotTable(
        spark, s"$work/lake/curated/provider_harmonized").read()
      println(s"[done] curated=${curated.count()} rows, harmonized=${harmonized.count()} rows, lake=$work/lake")
      // SQL surface over the published lake (the engine's Trino-equivalent
      // interface): discover + register every table, run analytics SQL
      val cat = new graft.catalog.GraftCatalog(spark, s"$work/lake")
      cat.registerAll()
      val top = cat.sql(
        """SELECT care_site_name, count(*) AS n_providers
          |FROM curated__provider
          |WHERE care_site_name IS NOT NULL
          |GROUP BY care_site_name ORDER BY n_providers DESC, care_site_name
          |LIMIT 3""".stripMargin).collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ")
      println(s"[sql] top care sites by provider count: $top")
    } else {
      println("[done] PIPELINE FAILED")
      sys.exit(1)
    }
    spark.stop()
  }
}
