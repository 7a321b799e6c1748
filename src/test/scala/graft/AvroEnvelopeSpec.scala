package graft

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

import graft.sources.{AvroEnvelope, Debezium}

/** Avro-wire Debezium envelopes must decode to the SAME topic-frame
  * contract as the JSON path and flow through the existing shred /
  * tombstone operators unchanged; Confluent framing, schema evolution
  * and corrupt-message quarantine are part of the contract.
  */
class AvroEnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private val rowAvro =
    """{"type":"record","name":"RowV1","fields":[
      |  {"name":"id","type":"int"},
      |  {"name":"name","type":["null","string"],"default":null},
      |  {"name":"updated","type":"long"}]}""".stripMargin
  private val envelopeAvro =
    s"""{"type":"record","name":"Envelope","fields":[
       |  {"name":"payload","type":{"type":"record","name":"Payload","fields":[
       |    {"name":"before","type":["null",$rowAvro],"default":null},
       |    {"name":"after","type":["null","RowV1"],"default":null},
       |    {"name":"op","type":"string"},
       |    {"name":"ts_ms","type":"long"},
       |    {"name":"source","type":{"type":"record","name":"Source","fields":[
       |      {"name":"db","type":"string"},
       |      {"name":"schema","type":"string"},
       |      {"name":"table","type":"string"}]}}]}}]}""".stripMargin

  private val rowStruct = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType),
    StructField("updated", LongType)))

  private def encode(schema: Schema, recs: Seq[GenericRecord],
                     prefix: Array[Byte] = Array.empty): Seq[Array[Byte]] = {
    val writer = new GenericDatumWriter[GenericRecord](schema)
    recs.map { r =>
      val bos = new ByteArrayOutputStream()
      bos.write(prefix)
      val enc = EncoderFactory.get().binaryEncoder(bos, null)
      writer.write(r, enc)
      enc.flush()
      bos.toByteArray
    }
  }

  /** i-th change event: insert for i%3==0, update i%3==1, delete i%3==2
    * (after=null — the Debezium delete image). */
  private def mkRecords(schema: Schema, n: Int): Seq[GenericRecord] = {
    val payloadS = schema.getField("payload").schema()
    val rowS = payloadS.getField("before").schema().getTypes.get(1)
    val sourceS = payloadS.getField("source").schema()
    (1 to n).map { i =>
      def row(id: Int, nm: String): GenericRecord = {
        val r = new GenericData.Record(rowS)
        r.put("id", id)
        r.put("name", if (nm == null) null else nm)
        r.put("updated", 1700000000000L + id)
        r
      }
      val p = new GenericData.Record(payloadS)
      val op = i % 3 match {
        case 0 => p.put("before", null); p.put("after", row(i, s"n$i")); "c"
        case 1 =>
          p.put("before", row(i, s"old$i")); p.put("after", row(i, s"n$i")); "u"
        case _ => p.put("before", row(i, s"old$i")); p.put("after", null); "d"
      }
      p.put("op", op)
      p.put("ts_ms", 1700000000000L + i)
      val s = new GenericData.Record(sourceS)
      s.put("db", "pg"); s.put("schema", "public"); s.put("table", "provider")
      p.put("source", s)
      val e = new GenericData.Record(schema)
      e.put("payload", p)
      e
    }
  }

  test("avro envelopes decode and shred identically to the JSON path") {
    val schema = new Schema.Parser().parse(envelopeAvro)
    val recs = mkRecords(schema, 300)
    val bin = encode(schema, recs)
    val df = bin.zipWithIndex.map { case (b, i) => (i.toLong, b) }
      .toDF("offset", "bin")
    val topic = AvroEnvelope.toTopicFrame(
      AvroEnvelope.decodeToJson(df, "bin", envelopeAvro))
    assert(topic.count() == 300)
    // timestamps derive from the envelope, exactly like readJsonl
    assert(topic.agg(min(unix_millis($"timestamp"))).head.getLong(0)
      == 1700000000001L)
    // the EXISTING typed shred consumes the decoded frames unchanged:
    // 100 deletes (after=null) tombstone-drop, 200 upserts survive
    val shredded = Debezium.rawModelTyped(topic, "id", rowStruct)
    assert(shredded.count() == 200, "tombstone drop must filter deletes")
    val named = shredded
      .select(get_json_object($"nested_data", "$.name").as("nm"))
    assert(named.filter($"nm".startsWith("n")).count() == 200)
  }

  test("Confluent wire framing: 5-byte header skipped per message") {
    val schema = new Schema.Parser().parse(envelopeAvro)
    val recs = mkRecords(schema, 40)
    val framed = encode(schema, recs,
      prefix = Array[Byte](0, 0, 0, 0, 42)) // magic + schema id
    val df = framed.map(Tuple1(_)).toDF("bin")
    val out = AvroEnvelope.decodeToJson(df, "bin", envelopeAvro,
      skipBytes = 5)
    assert(out.filter($"value".isNotNull).count() == 40)
    assert(out.select(get_json_object($"value", "$.payload.op"))
      .distinct().count() == 3)
  }

  test("schema evolution: evolved reader resolves old-writer messages") {
    val schema = new Schema.Parser().parse(envelopeAvro)
    // reader adds a nullable-with-default field to the row — the standard
    // additive evolution a registry allows
    val evolved = envelopeAvro
      .replace("""{"name":"updated","type":"long"}]}""",
        """{"name":"updated","type":"long"},
          |{"name":"region","type":["null","string"],"default":null}]}"""
          .stripMargin)
    val bin = encode(schema, mkRecords(schema, 30))
    val df = bin.map(Tuple1(_)).toDF("bin")
    val out = AvroEnvelope.decodeToJson(df, "bin", envelopeAvro,
      readerSchemaJson = Some(evolved))
    assert(out.filter($"value".isNotNull).count() == 30)
    // the new field materializes with its default on every after-image
    val regions = out
      .select(get_json_object($"value", "$.payload.after").as("after"))
      .filter($"after".isNotNull)
      .select(get_json_object($"after", "$.region").as("r"))
    assert(regions.count() == 20 && regions.filter($"r".isNull).count() == 20)
  }

  test("corrupt messages quarantine as null, never failing the job") {
    val schema = new Schema.Parser().parse(envelopeAvro)
    val good = encode(schema, mkRecords(schema, 10))
    val corrupt: Seq[Array[Byte]] =
      Seq(Array[Byte](1, 2, 3), good.head.take(4), null)
    val df = (good ++ corrupt).map(Tuple1(_)).toDF("bin")
    val out = AvroEnvelope.decodeToJson(df, "bin", envelopeAvro)
    assert(out.count() == 13)
    assert(out.filter($"value".isNotNull).count() == 10)
    assert(out.filter($"value".isNull).count() == 3)
  }
}
