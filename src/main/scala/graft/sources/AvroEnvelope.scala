package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro-serialized Debezium envelope decode — the binary twin of the
  * JSON topic path (reference deploys Debezium with JSON converters via
  * `promptly/setup.py:68-99`; the Avro+schema-registry converter is the
  * other standard wire format, and a Spark library must ingest both).
  *
  * `spark-avro` is not on this classpath, so decoding rides avro-core
  * directly inside `mapPartitions` — the sanctioned use: one
  * `GenericDatumReader` and one reused `BinaryDecoder` per PARTITION
  * (never per row), imperative record-level logic no declarative
  * operator expresses. The decoded record surfaces as its canonical
  * JSON text in a `value` column, so every existing envelope operator —
  * malformed-split, tombstone drop, typed shred, latest-per-key merge —
  * composes unchanged ([[Debezium]]); the decode step is the only new
  * code, exactly the posture the JSON path established.
  *
  * Scale: stateless row transform, no shuffle, codegen'd neighbors
  * unaffected; per-partition reader setup is O(schema), per-row cost is
  * the avro read itself. Schema EVOLUTION follows avro resolution rules:
  * pass the writer schema the topic was produced with and (optionally) a
  * newer reader schema — added-with-default / dropped fields resolve
  * per spec, same contract a schema registry enforces.
  */
object AvroEnvelope {

  /** Decode `binCol` (avro binary) into JSON text appended as `outCol`.
    *
    * @param skipBytes leading bytes to skip per message — 5 for the
    *                  Confluent wire format (magic byte + schema id),
    *                  0 for bare avro
    * @param readerSchemaJson optional evolved reader schema (defaults to
    *                  the writer schema) */
  def decodeToJson(df: DataFrame, binCol: String, writerSchemaJson: String,
                   readerSchemaJson: Option[String] = None,
                   skipBytes: Int = 0,
                   outCol: String = "value"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"output column $outCol already exists")
    val binIdx = df.schema.fieldIndex(binCol)
    val outSchema = df.schema.add(StructField(outCol, StringType,
      nullable = true))
    df.mapPartitions { it =>
      val writer = new Schema.Parser().parse(writerSchemaJson)
      val reader = readerSchemaJson
        .map(r => new GenericDatumReader[GenericRecord](writer,
          new Schema.Parser().parse(r)))
        .getOrElse(new GenericDatumReader[GenericRecord](writer))
      var decoder: BinaryDecoder = null
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](binIdx)
        val json: String =
          if (bytes == null || bytes.length <= skipBytes) null
          else try {
            decoder = DecoderFactory.get().binaryDecoder(
              bytes, skipBytes, bytes.length - skipBytes, decoder)
            // GenericRecord.toString IS the record's canonical JSON
            reader.read(null, decoder).toString
          } catch {
            // truncated/corrupt message → null, so the caller quarantines
            // it like the JSON path's splitMalformed instead of one bad
            // Kafka message failing the whole job
            case _: Exception => null
          }
        Row.fromSeq(row.toSeq :+ json)
      }
    }(Encoders.row(outSchema))
  }

  /** Decoded frame → the topic-frame contract [[Debezium.readJsonl]]
    * yields (`value` + envelope-derived `timestamp`), so the Avro and
    * JSON ingest paths are interchangeable downstream. */
  def toTopicFrame(decoded: DataFrame, valueCol: String = "value"): DataFrame =
    decoded.select(
      col(valueCol).as("value"),
      timestamp_millis(
        get_json_object(col(valueCol), "$.payload.ts_ms").cast(LongType))
        .as("timestamp"))
}
