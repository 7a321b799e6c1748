package graft

import org.apache.spark.sql.functions._

import graft.queries.CdcBench

/** Guards the benchmark's data generator: a malformed envelope (e.g. a
  * double-serialized after-image) silently degenerates the whole pipeline
  * — the transform "succeeds" with 1 or 0 rows and the timing measures
  * nothing. Caught live by a 10M stress probe; pinned here. */
class CdcBenchSpec extends SparkSpec {
  import spark.implicits._

  test("generated envelopes drive the full pipeline to one curated row per key") {
    val curated = CdcBench.curatedFromCdc(spark, 1000L)
    assert(curated.count() == 1000)
    val row = curated.filter($"provider_id" === 10).head()
    // id 10 got an update event with a newer ts — same name either way,
    // but the row must be fully populated and site-joined
    assert(row.getAs[String]("provider_name") == "Provider 10")
    assert(row.getAs[Int]("care_site_id") >= 1)
    assert(row.getAs[String]("npi").length == 10)
  }

  test("typed and schema-free bench paths agree") {
    val env = CdcBench.envelopes(spark, 500L)
    val typed = CdcBench.curatedFromEnvelopes(env)
    assert(typed.count() == 500)
    // tombstones present in the stream but never in curated output
    val ops = env.select(get_json_object($"value", "$.payload.op").as("op"))
      .groupBy("op").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops("d") > 0 && ops("c") == 500)
  }
}
