package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Debezium

/** The reference's business models re-expressed Spark-first:
  * `raw_provider_postgres` / `raw_care_site_postgres` / `curated_provider`
  * (reference `dbt/promptly/models/`), plus the CSV-provider cleaning and
  * the harmonization join the challenge declares but the reference never
  * implemented (SURVEY.md §2.4, §7.4.5; FIXTURES.md §2).
  */
object ProviderModels {

  /** `provider` row schema — FIXTURES.md §1.1 (`datagen.py:70-81`). */
  val providerSchema: StructType = StructType(Seq(
    StructField("provider_id", IntegerType),
    StructField("provider_name", StringType),
    StructField("npi", StringType),
    StructField("specialty", StringType),
    StructField("care_site", StringType),
    StructField("provider_source_value", StringType),
    StructField("specialty_source_value", StringType),
    StructField("provider_id_source_value", StringType)))

  /** `care_site` row schema — FIXTURES.md §1.2 (`datagen.py:37-43`). */
  val careSiteSchema: StructType = StructType(Seq(
    StructField("care_site_id", IntegerType),
    StructField("care_site_name", StringType),
    StructField("care_site_source_value", StringType)))

  /** CSV schema — all VARCHAR staging, cast downstream (`setup.py:111-128`). */
  val csvProviderSchema: StructType = StructType(
    Seq("ProviderName", "ProviderID", "NPI", "Specialty",
      "SiteName", "SourceID", "SpecSource", "IDSource")
      .map(StructField(_, StringType)))

  /** raw_provider model (reference `raw_provider_postgres.sql:14-30`):
    * tombstone-filtered CDC with un-shredded after-image + audit columns.
    * The reference's `limit 10` sampling quirk is NOT reproduced (SURVEY
    * §7.4.3) — it was an author shortcut, not a semantic. */
  def rawProvider(cdc: DataFrame): DataFrame =
    Debezium.rawModel(cdc, "provider_id")

  def rawCareSite(cdc: DataFrame): DataFrame =
    Debezium.rawModel(cdc, "care_site_id")

  /** curated_provider (reference `curated_provider.sql:12-68`): shred the
    * after-image, cast to the OMOP-CDM contract, enrich with care_site via
    * LEFT join on name. care_site is ≤8 rows — broadcast, so the join adds
    * zero shuffle at any scale. */
  def curatedProvider(rawProviderDf: DataFrame, careSiteDf: DataFrame): DataFrame = {
    val shredded = Debezium.shred(
      rawProviderDf.select("nested_data"), providerSchema)
      .filter(col("provider_id").isNotNull) // curated_provider.sql:53
    curatedFromShredded(shredded, careSiteDf)
  }

  /** Fast path from a TYPED raw frame (rawModelTyped's `after` struct):
    * skips the serialize→reparse round-trip of the string contract —
    * same output, one less JSON pass over every row. */
  def curatedProviderTyped(typedRawDf: DataFrame, careSiteDf: DataFrame): DataFrame =
    curatedFromShredded(
      typedRawDf.select(col("after.*")).filter(col("provider_id").isNotNull),
      careSiteDf)

  private def curatedFromShredded(shredded: DataFrame, careSiteDf: DataFrame): DataFrame = {
    shredded
      .join(broadcast(careSiteDf), shredded("care_site") === careSiteDf("care_site_name"), "left")
      .select(
        shredded("provider_id").cast(IntegerType).as("provider_id"),
        shredded("provider_name"),
        shredded("npi"),
        shredded("specialty").as("specialty_concept_id"),
        careSiteDf("care_site_id").cast(IntegerType).as("care_site_id"),
        careSiteDf("care_site_name"),
        careSiteDf("care_site_source_value"),
        shredded("provider_source_value"),
        shredded("provider_id_source_value"))
  }

  // ------------------------------------------------------- CSV harmonization

  /** Specialty normalization map for the deliberate abbreviation variants in
    * sample.csv (FIXTURES.md §2): Peds→Pediatrics etc. */
  val specialtyAliases: Map[String, String] = Map(
    "Peds" -> "Pediatrics", "Neuro" -> "Neurology", "Ortho" -> "Orthopedics",
    "Derma" -> "Dermatology", "Int Med" -> "Internal Medicine",
    "Cardio" -> "Cardiology", "Onc" -> "Oncology", "GP" -> "General Practice")

  /** Site-name aliases (abbreviated CSV names → canonical Postgres names). */
  val siteAliases: Map[String, String] = Map(
    "Metro Med" -> "Metro Medical Center",
    "North Health Inst" -> "North Health Institute",
    "Westside Family" -> "Westside Family Practice")

  private def aliasExpr(c: String, aliases: Map[String, String]) =
    aliases.foldLeft(col(c)) { case (acc, (from, to)) =>
      when(col(c) === from, lit(to)).otherwise(acc)
    }

  /** Fuzzy site-name matching — the alias-map-free fallback tier for the
    * harmonization join (FIXTURES.md §2: "site-name fuzzy/alias match").
    * Matches each candidate name to its closest canonical site if the
    * edit distance is within `maxDist` or the candidate is a strict prefix
    * abbreviation. Canonical set is tiny (8 rows) → broadcast cross join;
    * with a large canonical set, add a blocking key (first token) first. */
  def fuzzySiteMatch(names: DataFrame, nameCol: String, canonical: DataFrame,
                     canonicalCol: String, maxDist: Int = 6): DataFrame = {
    val cand = canonical.select(col(canonicalCol).as("__canonical"))
    val scored = names.crossJoin(broadcast(cand))
      .withColumn("__dist",
        when(expr(s"startswith(__canonical, $nameCol)"),
          lit(0)) // prefix abbreviation = exact-tier match
          .otherwise(levenshtein(col(nameCol), col("__canonical"))))
      .filter(col("__dist") <= maxDist)
    // keep the single best (lowest-distance, then alphabetical) candidate
    graft.sources.Debezium.latestPerKey(
      scored.withColumn("__neg", -col("__dist")),
      names.columns.toSeq,
      Seq(col("__neg"), col("__canonical")))
      .drop("__neg")
      .withColumnRenamed("__canonical", "matched_site")
      .withColumnRenamed("__dist", "match_dist")
  }

  /** Clean the client-dropped CSV (FIXTURES.md §2 bad-data rules):
    *   - literal string "NULL" → SQL NULL (every column);
    *   - specialty abbreviations normalized (SpecSource holds the expansion
    *     when present, alias map otherwise);
    *   - site-name abbreviations mapped to canonical names;
    *   - dedup on (ProviderID, NPI) keeping the longest name variant
    *     (canonical-name rule: "Dr. John Doe" beats "John Doe"). */
  def cleanCsvProviders(csv: DataFrame): DataFrame = {
    val nulled = csvProviderSchema.fieldNames.foldLeft(csv) { (df, c) =>
      df.withColumn(c, when(col(c) === "NULL", lit(null)).otherwise(col(c)))
    }
    val normalized = nulled
      .withColumn("Specialty",
        coalesce(
          when(col("SpecSource").isNotNull && col("SpecSource") =!= col("Specialty"),
            col("SpecSource")),
          aliasExpr("Specialty", specialtyAliases)))
      .withColumn("SiteName", aliasExpr("SiteName", siteAliases))
    // keep longest name per (ProviderID, NPI): deterministic canonical pick
    Debezium.latestPerKey(
      normalized.withColumn("__name_len", length(coalesce(col("ProviderName"), lit("")))),
      Seq("ProviderID", "NPI"),
      Seq(col("__name_len"), col("ProviderName"))).drop("__name_len")
  }

  /** The declared-but-unimplemented harmonization join (CHALLENGE.md:36):
    * match CSV providers to Postgres providers on NPI, falling back to the
    * zero-padded ProviderID ↔ provider_id for rows with no usable NPI.
    * Emits one row per CSV provider with the matched postgres provider_id
    * (NULL if unmatched).
    *
    * Deliberately TWO equi-joins unioned, not one OR-condition join: an OR
    * join predicate can't hash-partition and Catalyst would fall back to
    * broadcast-nested-loop — a non-starter against a 2M-row/day provider
    * table. Each pass here is a plain hash join on its key. */
  def harmonizeCsvWithPostgres(csvClean: DataFrame, pgProviders: DataFrame): DataFrame = {
    val pg = pgProviders.select(
      col("provider_id").as("pg_provider_id"),
      col("npi").as("pg_npi"),
      col("provider_name").as("pg_provider_name"))
    val base = csvClean.withColumn("pid_int", col("ProviderID").cast(IntegerType))
    val out = (df: DataFrame) => df.select(
      col("ProviderID").as("csv_provider_id"),
      col("ProviderName").as("csv_provider_name"),
      col("NPI").as("npi"),
      col("Specialty").as("specialty"),
      col("SiteName").as("care_site_name"),
      col("pg_provider_id"),
      col("pg_provider_name"))
    val withNpi = base.filter(col("NPI").isNotNull)
      .join(pg, col("NPI") === col("pg_npi"), "left")
    val withoutNpi = base.filter(col("NPI").isNull)
      .join(pg.withColumnRenamed("pg_provider_id", "__pgid"),
        col("pid_int") === col("__pgid"), "left")
      .withColumn("pg_provider_id", col("__pgid"))
    out(withNpi).unionByName(out(withoutNpi))
  }
}
