package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{Debezium, Tables}

/** Driver-visible CDC coverage: constructs Debezium envelopes from the
  * orders table, runs them through the SAME raw-model path the pipeline
  * uses (tombstone filter → after-image extraction → shred), and returns
  * typed columns that must equal a plain projection of the source — an
  * oracle-checked round-trip of SURVEY.md §2.9 ST1/ST2 semantics.
  */
object CdcQueries {

  type Q = (SparkSession, String) => DataFrame

  private val orderRow = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  /** Envelope → raw model → shred round-trip. Orders with orderkey ≡ 0
    * (mod 97) become tombstones (after=null) and must vanish — the ST2
    * "deletes never reach the lake" rule, checked by the oracle's
    * complementary WHERE. */
  def q21CdcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.load(s, dir, "orders")
    val after = struct($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
    val envelope = ord.select(
      to_json(struct(
        struct(
          when($"o_orderkey" % 97 === 0, lit(null).cast(orderRow)).otherwise(after)
            .as("after"),
          when($"o_orderkey" % 97 === 0, lit("d")).otherwise(lit("c")).as("op"),
          // o_orderdate is TIMESTAMP_NTZ in the parquet; UTC session makes
          // the cast to instant-typed TIMESTAMP an identity
          unix_millis($"o_orderdate".cast(TimestampType)).as("ts_ms")
        ).as("payload"))).as("value"),
      $"o_orderdate".as("timestamp"))
    val raw = Debezium.rawModel(envelope, "o_orderkey")
    Debezium.shred(raw.select("nested_data"), orderRow)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        floor($"o_totalprice" * 100.0 + 0.5).as("price_cents"))
      .orderBy($"o_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "q21_cdc_roundtrip" -> (q21CdcRoundtrip _)
  )

  val oracles: Map[String, String] = Map(
    "q21_cdc_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
        | CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_cents
        |FROM orders
        |WHERE o_orderkey % 97 <> 0
        |ORDER BY o_orderkey""".stripMargin
  )
}
