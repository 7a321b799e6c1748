package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checks.Checks._
import graft.ops.ProviderModels
import graft.sinks.SnapshotTable
import graft.sources.Debezium

/** The reference's full pipeline (SURVEY.md §3.1 / §7.2 slice) wired as a
  * graft [[Pipeline]]: CDC topic dumps → raw (merge-by-key, date
  * partitioned) → curated (shred + enrich, WAP-audited with the dbt schema
  * tests from `schema.yaml:10-37`) → CSV cleaning → harmonization.
  *
  * `lakeRoot` is any Hadoop-visible URI (local dir in tests, `s3a://` in
  * production — same code path).
  */
object ProviderPipeline {

  final case class Config(
      providerCdcPath: String,
      careSiteCdcPath: String,
      csvPath: String,
      lakeRoot: String)

  def build(spark: SparkSession, cfg: Config): Pipeline = {
    val rawProviderTable = new SnapshotTable(spark, s"${cfg.lakeRoot}/raw/provider_postgres")
    val rawCareSiteTable = new SnapshotTable(spark, s"${cfg.lakeRoot}/raw/care_site_postgres")
    val curatedTable = new SnapshotTable(spark, s"${cfg.lakeRoot}/curated/provider")
    val harmonizedTable = new SnapshotTable(spark, s"${cfg.lakeRoot}/curated/provider_harmonized")

    val stages = Seq(
      Stage(
        name = "raw_provider_postgres",
        tags = Set("raw", "cdc"),
        build = (s, _) => ProviderModels.rawProvider(
          Debezium.readJsonl(s, cfg.providerCdcPath)),
        checks = Seq(NotNull("provider_id"), Unique(Seq("provider_id"))),
        sink = Some(Merge(rawProviderTable, Seq("provider_id"),
          Seq(col("cdc_ts_ms")), partitionBy = Seq("ingestion_cdc_date")))),
      Stage(
        name = "raw_care_site_postgres",
        tags = Set("raw", "cdc"),
        build = (s, _) => {
          val raw = ProviderModels.rawCareSite(
            Debezium.readJsonl(s, cfg.careSiteCdcPath))
          Debezium.shred(raw, ProviderModels.careSiteSchema)
            .select("care_site_id", "care_site_name", "care_site_source_value")
        },
        checks = Seq(NotNull("care_site_id"), Unique(Seq("care_site_id"))),
        sink = Some(Overwrite(rawCareSiteTable))),
      Stage(
        name = "curated_provider",
        deps = Seq("raw_provider_postgres", "raw_care_site_postgres"),
        tags = Set("curated"),
        build = (_, ctx) => ProviderModels.curatedProvider(
          ctx("raw_provider_postgres"), ctx("raw_care_site_postgres")),
        // schema.yaml:10-37 — unique+not_null provider_id, not_null
        // provider_name, relationships care_site_id → raw_care_site
        checks = Seq(
          Unique(Seq("provider_id")), NotNull("provider_id"), NotNull("provider_name")),
        sink = Some(Overwrite(curatedTable))),
      Stage(
        name = "csv_providers_clean",
        tags = Set("csv"),
        build = (s, _) => {
          val load = graft.sources.CsvSource.readWithQuarantine(
            s, cfg.csvPath, ProviderModels.csvProviderSchema)
          // unparseable upload rows land in an auditable lake table, not
          // in a log line
          if (!load.quarantine.isEmpty)
            new SnapshotTable(s, s"${cfg.lakeRoot}/quarantine/csv_providers")
              .overwrite(load.quarantine)
          ProviderModels.cleanCsvProviders(load.clean)
        },
        checks = Seq(Unique(Seq("ProviderID", "NPI")))),
      Stage(
        name = "curated_provider_harmonized",
        deps = Seq("csv_providers_clean", "curated_provider"),
        tags = Set("curated"),
        build = (_, ctx) => ProviderModels.harmonizeCsvWithPostgres(
          ctx("csv_providers_clean"),
          ctx("curated_provider")
            .select(col("provider_id"), col("npi"),
              col("provider_name"))),
        sink = Some(Overwrite(harmonizedTable))))

    new Pipeline(stages)
  }
}
