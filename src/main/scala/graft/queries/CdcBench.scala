package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.fixtures.Fixtures
import graft.ops.ProviderModels
import graft.sources.Debezium

/** The reference-scale CDC benchmark: 2,000,000 provider change events
  * (the "2 million new records daily" sizing from the reference README)
  * generated DISTRIBUTIVELY via `spark.range` — no driver-side loop, no
  * disk fixture — then pushed through the full transform path:
  * envelope parse → tombstone filter → latest-per-key merge → shred →
  * curated join. This is the workload `setup.py:16` seeds and the dbt
  * models process, minus container I/O.
  */
object CdcBench {

  /** Build n synthetic Debezium envelopes as a DataFrame: ~10% of keys get
    * a second (newer) update event, ~5% a tombstone. Deterministic. */
  def envelopes(spark: SparkSession, n: Long): DataFrame = {
    import spark.implicits._
    val base = spark.range(n).select(
      $"id",
      (($"id" % 1000000007L) * 2654435761L % 9999999999L).as("npi_num"),
      ($"id" % 8 + 1).cast("int").as("site_idx"))
    val sites = array(Fixtures.careSites.map(s => lit(s._2)): _*)
    // `after` must be a NESTED STRUCT inside the envelope's to_json — a
    // pre-serialized string would be escaped into a JSON string value and
    // every downstream path would see after as a scalar (keys null, typed
    // parse empty). The one to_json call serializes the whole envelope.
    val after = struct(
      $"id".cast("int").as("provider_id"),
      concat(lit("Provider "), $"id").as("provider_name"),
      lpad($"npi_num".cast("string"), 10, "0").as("npi"),
      element_at(lit(Array("Cardiology", "Pediatrics", "Neurology", "Oncology",
        "Dermatology", "Orthopedics", "Internal Medicine", "General Practice")),
        ($"id" % 8 + 1).cast("int")).as("specialty"),
      element_at(sites, $"site_idx").as("care_site"),
      concat(lit("P"), $"id").as("provider_source_value"),
      lit("spec").as("specialty_source_value"),
      concat(lit("S-"), $"id").as("provider_id_source_value"))
    // when(false, s) = NULL of s's struct type (to_json then omits it,
    // exactly a Debezium tombstone)
    val nullAfter = when(lit(false), after)
    val creates = base.select(
      to_json(struct(struct(
        after.as("after"), lit("c").as("op"),
        (lit(1757700000000L) + $"id").as("ts_ms")).as("payload"))).as("value"),
      timestamp_millis(lit(1757700000000L) + $"id").as("timestamp"))
    val updates = base.filter($"id" % 10 === 0).select(
      to_json(struct(struct(
        after.as("after"), lit("u").as("op"),
        (lit(1757800000000L) + $"id").as("ts_ms")).as("payload"))).as("value"),
      timestamp_millis(lit(1757800000000L) + $"id").as("timestamp"))
    val deletes = base.filter($"id" % 20 === 3).select(
      to_json(struct(struct(
        nullAfter.as("after"), lit("d").as("op"),
        (lit(1757900000000L) + $"id").as("ts_ms")).as("payload"))).as("value"),
      timestamp_millis(lit(1757900000000L) + $"id").as("timestamp"))
    creates.unionByName(updates).unionByName(deletes)
  }

  /** Full transform: raw model → latest-per-key → shred → curated join.
    * Returns the curated DataFrame (caller materializes to time it). */
  def curatedFromCdc(spark: SparkSession, n: Long): DataFrame =
    curatedFrom(Debezium.rawModel(envelopes(spark, n), "provider_id"))

  /** Same transform from a pre-materialized envelope DataFrame: typed
    * single-parse raw model, merge carrying the `after` struct, curated
    * built from the struct directly — zero re-serialization. */
  def curatedFromEnvelopes(cdc: org.apache.spark.sql.DataFrame): DataFrame = {
    val typed = Debezium.rawModelTyped(cdc, "provider_id",
      ProviderModels.providerSchema).drop("nested_data")
    val latest = Debezium.latestPerKey(typed, Seq("provider_id"), Seq(col("cdc_ts_ms")))
    ProviderModels.curatedProviderTyped(latest, Fixtures.careSiteDf(cdc.sparkSession))
  }

  private def curatedFrom(raw: DataFrame): DataFrame = {
    val latest = Debezium.latestPerKey(raw, Seq("provider_id"), Seq(col("cdc_ts_ms")))
    ProviderModels.curatedProvider(
      latest, Fixtures.careSiteDf(raw.sparkSession))
  }
}
