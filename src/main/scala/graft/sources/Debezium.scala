package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium CDC envelope handling (SURVEY.md §2.9, FIXTURES.md §3).
  *
  * Envelope shape (schemas disabled, plain JSON — reference
  * `docker-compose.yaml:154-155`, `infra/trino/etc/kafka-table-descriptions/
  * provider.json:13-25`):
  * {{{
  *   {"payload": {"before": ..., "after": ..., "op": "c|u|r|d",
  *                "ts_ms": 123, "source": {"db","schema","table"}}}
  * }}}
  *
  * Design choice (SURVEY §2.7-F1): one `from_json` into the full envelope
  * `StructType` instead of N `json_query` calls — single parse, codegen'd,
  * and sidesteps Trino's quoted-scalar quirk entirely. A `get_json_object`
  * compat path is kept for the raw layer, which stores the un-shredded
  * after-image JSON string (`nested_data`) for schema-on-read.
  *
  * At 100 TB: parsing happens in the scan's project, fully parallel; the
  * envelope columns prune into the parse (Spark's JsonExpressionOptimization
  * rewrites `from_json(x).field` to a pruned parse).
  */
object Debezium {

  /** Envelope schema parameterized by the source table's row schema. */
  def envelopeSchema(row: StructType): StructType = StructType(Seq(
    StructField("payload", StructType(Seq(
      StructField("before", row),
      StructField("after", row),
      StructField("op", StringType),
      StructField("ts_ms", LongType),
      StructField("source", StructType(Seq(
        StructField("db", StringType),
        StructField("schema", StringType),
        StructField("table", StringType)))))))))

  /** Read a JSONL topic dump — the file stand-in for a Kafka topic, with
    * the same column contract Spark's Kafka source yields: `value` (the
    * message) and `timestamp` (broker arrival; here derived from the
    * envelope's ts_ms so tests are deterministic). Swapping in real Kafka
    * is `spark.read.format("kafka")... .select(col("value").cast("string"),
    * col("timestamp"))` — downstream code is identical. */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .withColumnRenamed("value", "raw")
      .select(
        col("raw").as("value"),
        timestamp_millis(get_json_object(col("raw"), "$.payload.ts_ms").cast(LongType))
          .as("timestamp"))

  /** Split a CDC frame into (valid, malformed): a message whose entire
    * `payload` fails to parse is garbage (truncated write, non-Debezium
    * producer on the topic) and must NOT be silently conflated with a
    * tombstone (valid payload, null after). Malformed rows carry the
    * verbatim message for quarantine. */
  def splitMalformed(cdc: DataFrame): (DataFrame, DataFrame) = {
    val payload = get_json_object(col("value"), "$.payload")
    (cdc.filter(payload.isNotNull),
      cdc.filter(payload.isNull).select(col("value").as("raw_message")))
  }

  /** The raw-layer model (reference `raw_provider_postgres.sql:14-32`):
    * drop tombstones (payload.after IS NULL — deletes do NOT propagate,
    * ST2), keep the key + un-shredded after-image + audit columns.
    * `keyField` is the source PK name inside the after image. */
  def rawModel(cdc: DataFrame, keyField: String): DataFrame =
    cdc
      // json_tuple parses each JSON string ONCE and emits several fields —
      // the naive formulation (one get_json_object per field + one in the
      // tombstone filter) re-parses the full envelope 4×. Two-level
      // extraction: envelope → payload text, payload → (after, ts_ms),
      // then only the (small) after-image is parsed for the key.
      .select(json_tuple(col("value"), "payload").as("__p"), col("timestamp"))
      .select(json_tuple(col("__p"), "after", "ts_ms").as(Seq("__after", "__ts_ms")),
        col("timestamp"))
      .filter(col("__after").isNotNull)
      .select(
        get_json_object(col("__after"), s"$$.$keyField").as(keyField),
        col("__after").as("nested_data"),
        col("__ts_ms").cast(LongType).as("cdc_ts_ms"),
        col("timestamp").as("ingestion_cdc_time"),
        date_format(col("timestamp"), "yyyy-MM-dd").as("ingestion_cdc_date"),
        current_timestamp().as("ingestion_timestamp"))

  /** Single-parse typed raw model — the fast path when the row schema is
    * declared (CdcTablePipeline, benchmarks): ONE `from_json` of the full
    * envelope yields key, after-image, op and ts_ms together, vs the 3
    * independent JsonPath parses of the schema-free [[rawModel]] (each
    * `get_json_object` re-parses the string; measured ~2× on the 2M-event
    * path). `nested_data` is the re-serialized after-image — the same
    * normalization Trino's `json_query` applies in the reference. Output
    * contract is identical to [[rawModel]] plus typed `after.*` access. */
  def rawModelTyped(cdc: DataFrame, keyField: String, row: StructType): DataFrame = {
    val env = envelopeSchema(row)
    cdc
      .withColumn("__env", from_json(col("value"), env))
      .filter(col("__env.payload.after").isNotNull)
      .select(
        col(s"__env.payload.after.$keyField").cast(StringType).as(keyField),
        to_json(col("__env.payload.after")).as("nested_data"),
        col("__env.payload.ts_ms").as("cdc_ts_ms"),
        col("__env.payload.after").as("after"),
        col("timestamp").as("ingestion_cdc_time"),
        date_format(col("timestamp"), "yyyy-MM-dd").as("ingestion_cdc_date"),
        current_timestamp().as("ingestion_timestamp"))
  }

  /** Shred the raw layer's `nested_data` after-image into typed columns
    * (reference `curated_provider.sql:12-54`, minus the per-field
    * json_query+regexp dance — one parse). Tolerant casts: non-ANSI `cast`
    * NULLs malformed values, matching the chosen Trino-tolerant semantics. */
  def shred(raw: DataFrame, row: StructType): DataFrame = {
    val parsed = raw.withColumn("_r", from_json(col("nested_data"), row))
    row.fields.foldLeft(parsed) { (df, f) =>
      df.withColumn(f.name, col(s"_r.${f.name}"))
    }.drop("_r")
  }

  /** Debezium envelopes → a SIGNED delta batch for the IVM family
    * (`appendLeftDelta`/`appendRightDelta`/`IncrementalAgg.appendDelta`).
    *
    * The op-code mapping is the textbook multiset-delta reading of a CDC
    * stream: `c`/`r` (insert/snapshot-read) emit the after-image at +1,
    * `u` emits the before-image at −1 AND the after-image at +1, `d`
    * emits the before-image at −1. The reference's own CDC models simply
    * DROP deletes (`raw_provider_postgres.sql:22` filters to
    * after-image-present); this transform is the seam that lets every
    * maintained join/aggregate downstream absorb takedown and
    * right-to-be-forgotten waves at delta cost instead of recompute.
    *
    * Signed deltas COMMUTE (the stores net by summation), so the result
    * is invariant to envelope ordering ACROSS batches — a delete
    * processed before its insert nets the same multiset. The only
    * contract is Debezium's own: `u`/`d` before-images are the
    * previously-observed row (guaranteed by any REPLICA IDENTITY FULL
    * source).
    *
    * Input: a `value: string` frame of envelope JSON (one per row, the
    * topic-twin/Kafka column contract). Output: the row schema's columns
    * plus `deltaCol` (±1 long). Malformed envelopes are the caller's
    * concern ([[splitMalformed]]); rows whose needed image is null
    * (a `d` with no before-image — a REPLICA IDENTITY DEFAULT source)
    * are REFUSED at runtime rather than silently dropped, because
    * dropping them re-creates the reference's delete-blindness. */
  def signedDeltas(cdc: DataFrame, row: StructType,
                   deltaCol: String = "__delta"): DataFrame = {
    val env = cdc
      .select(from_json(col("value"), envelopeSchema(row))
        .getField("payload").as("p"))
      .filter(col("p").isNotNull && col("p.op").isNotNull)
    // the guard lives INSIDE the always-selected delta value (an
    // assert_true in its own pruned-away column would never evaluate):
    // a missing needed image raises instead of silently vanishing
    def img(image: Column, sign: Long) = struct(image.as("r"),
      when(image.isNotNull, lit(sign)).otherwise(
        raise_error(lit("CDC envelope lacks the image its op needs " +
          "(op=u/d with null before — REPLICA IDENTITY DEFAULT " +
          "source?); refusing to drop deletes silently")).cast("long"))
        .as("d"))
    val pairs = env.select(
      explode(
        when(col("p.op") === "u",
          array(img(col("p.before"), -1L), img(col("p.after"), 1L)))
        .when(col("p.op") === "d", array(img(col("p.before"), -1L)))
        .when(col("p.op").isin("c", "r"), array(img(col("p.after"), 1L)))
        // anything else (Debezium 't' truncate, 'm' message, unknown
        // ops) has NO multiset-delta reading — counting it as a +1
        // insert would silently corrupt every maintained view, and a
        // null after-image would raise img's misleading replica-identity
        // error. Refuse with a dedicated message instead.
        .otherwise(array(struct(col("p.after").as("r"),
          raise_error(concat(lit("unsupported CDC op '"), col("p.op"),
            lit("' — signedDeltas maps op IN ('c','r','u','d') only; " +
              "truncate/message envelopes must be filtered or handled " +
              "upstream"))).cast("long").as("d")))))
        .as("e"))
    pairs.select(row.fields.toIndexedSeq.map(f => col(s"e.r.${f.name}")) :+
      col("e.d").as(deltaCol): _*)
  }

  /** Latest-per-key compaction (ST4/K3): the newest version of each key
    * wins, ordered by the CDC timestamp with explicit tiebreaks — the
    * scale-safe realization of `incremental_strategy='merge'`.
    *
    * Implemented as `max_by(struct(*), struct(orderBy...))`: a hash
    * aggregate with map-side partial combine, so each map task forwards at
    * most one row per key and no per-partition sort happens (the
    * row_number-window formulation shuffles EVERY version of every key and
    * sorts each partition — strictly more IO at CDC-update-heavy scale).
    * Struct comparison is lexicographic, so callers pass explicit
    * tiebreaks to stay deterministic on order-ties. */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column]): DataFrame = {
    val valueCols = df.columns.filterNot(keys.contains)
    val packed = struct(valueCols.toIndexedSeq.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(packed, struct(orderBy: _*)).as("__latest"))
      .select(keys.map(col) ++ valueCols.map(c => col(s"__latest.$c")): _*)
  }
}
