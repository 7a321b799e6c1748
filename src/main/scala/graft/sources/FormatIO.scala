package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Uniform batch read/write over the columnar + line formats Spark ships
  * natively — parquet, ORC, JSON-lines, headered CSV. One entry point so
  * pipeline configs can say `format = "orc"` and get the identical
  * column contract regardless of container.
  *
  * Posture per format (why a 100 TB pipeline would pick each):
  *  - parquet/ORC: columnar + footer stats → pruned scans, the lake
  *    formats; both vectorized in Spark.
  *  - jsonl: the interchange drop format (and the Kafka envelope shape);
  *    schema REQUIRED on read — inference scans the data twice and
  *    guesses, which is how silent type drift gets in.
  *  - csv: the client-drop format of the reference (S3 ingest, header
  *    row, declared all-string schema, cast downstream).
  */
object FormatIO {

  val supported: Set[String] = Set("parquet", "orc", "json", "csv")

  private def check(format: String): String = {
    val f = format.toLowerCase match {
      case "jsonl" => "json"
      case other => other
    }
    require(supported.contains(f), s"unsupported format: $format")
    f
  }

  /** Schema-declared read (schema mandatory for the text formats; for
    * parquet/ORC it doubles as a projection/evolution contract). */
  def read(spark: SparkSession, format: String, path: String,
           schema: StructType, header: Boolean = true): DataFrame = {
    val f = check(format)
    val r = spark.read.schema(schema)
    f match {
      case "csv" => r.option("header", header.toString).csv(path)
      case "json" => r.json(path)
      case other => r.format(other).load(path)
    }
  }

  def write(df: DataFrame, format: String, path: String,
            mode: String = "overwrite", header: Boolean = true,
            partitionBy: Seq[String] = Nil): Unit = {
    val f = check(format)
    val w0 = df.write.mode(mode)
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    f match {
      case "csv" => w.option("header", header.toString).csv(path)
      case "json" => w.json(path)
      case other => w.format(other).save(path)
    }
  }
}
