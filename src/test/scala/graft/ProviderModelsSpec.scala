package graft

import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures
import graft.ops.ProviderModels

class ProviderModelsSpec extends SparkSpec {
  import spark.implicits._

  lazy val csvClean = {
    val path = tmpDir("csv") + "/providers.csv"
    Fixtures.writeSampleCsv(path)
    ProviderModels.cleanCsvProviders(
      spark.read.schema(ProviderModels.csvProviderSchema)
        .option("header", true).csv(path))
  }

  test("literal NULL strings become SQL NULLs") {
    assert(csvClean.filter($"ProviderID" === "004").head().getAs[String]("NPI") == null)
    assert(csvClean.filter($"ProviderID" === "006")
      .head().getAs[String]("ProviderName") == null)
  }

  test("specialty abbreviations normalize to canonical values") {
    val specs = csvClean.select("ProviderID", "Specialty").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(specs("002") == "Pediatrics")   // Peds
    assert(specs("003") == "Neurology")    // Neuro
    assert(specs("005") == "Orthopedics")  // Ortho
    assert(specs("007") == "Internal Medicine") // Int Med
  }

  test("site-name abbreviations map to canonical Postgres names") {
    val sites = csvClean.select("ProviderID", "SiteName").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sites("003") == "Metro Medical Center") // Metro Med
    assert(sites("005") == "North Health Institute") // North Health Inst
  }

  test("duplicate (ProviderID, NPI) rows dedup to the longest name variant") {
    assert(csvClean.count() == 13) // 15 rows, 001 appears 3×
    val p1 = csvClean.filter($"ProviderID" === "001").collect()
    assert(p1.length == 1 && p1(0).getAs[String]("ProviderName") == "Dr. John Doe")
  }

  test("zero-padded IDs preserved as source values") {
    assert(csvClean.filter($"ProviderID" === "001").count() == 1)
    assert(csvClean.select("ProviderID").collect()
      .forall(_.getString(0).length == 3))
  }

  test("fuzzy site match resolves abbreviations and typos to canonical names") {
    val canonical = graft.fixtures.Fixtures.careSiteDf(spark)
      .select($"care_site_name")
    val names = Seq("Metro Med", "North Health Inst", "Cty Hospital", "Westside Family")
      .toDF("site")
    val got = graft.ops.ProviderModels.fuzzySiteMatch(
      names, "site", canonical, "care_site_name")
      .collect().map(r => r.getAs[String]("site") -> r.getAs[String]("matched_site")).toMap
    assert(got("Metro Med") == "Metro Medical Center")       // prefix tier
    assert(got("North Health Inst") == "North Health Institute")
    assert(got("Cty Hospital") == "City Hospital")           // levenshtein tier
    assert(got("Westside Family") == "Westside Family Practice")
  }

  test("harmonization matches on NPI, falls back to ProviderID when NPI null") {
    val pg = Seq(
      (1, "1234567890", "John Doe"),
      (4, "9999999999", "Jane Smith")) // id 4 matches csv 004 (null NPI) by id
      .toDF("provider_id", "npi", "provider_name")
    val h = ProviderModels.harmonizeCsvWithPostgres(csvClean, pg)
    val byId = h.select("csv_provider_id", "pg_provider_id").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(byId("001") == Some(1)) // via NPI
    assert(byId("004") == Some(4)) // via ProviderID fallback (NPI was "NULL")
    assert(byId("009") == None)    // no match anywhere
  }
}
