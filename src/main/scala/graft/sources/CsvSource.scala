package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Robust CSV ingestion for client dropzones (SURVEY.md §2.1 S3): schema
  * is declared (never inferred — the reference declares DDL for its CSV
  * external table), parsing is PERMISSIVE, and rows that fail to parse are
  * captured verbatim in a quarantine frame instead of failing the load or
  * silently disappearing. The clean/quarantine split means a malformed
  * upload degrades to a data-quality metric, not an outage.
  */
object CsvSource {

  final case class CsvLoad(clean: DataFrame, quarantine: DataFrame)

  private val corruptCol = "_corrupt_record"

  /** Read with the declared schema + corrupt-record capture. A row is
    * quarantined when the parser could not produce every declared column
    * (malformed quoting, wrong arity with missing required tail, etc.). */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType, header: Boolean = true,
                         sep: String = ","): CsvLoad = {
    val withCorrupt = StructType(schema.fields :+ StructField(corruptCol, StringType))
    val raw = spark.read
      .schema(withCorrupt)
      .option("header", header)
      .option("sep", sep)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)
      .cache() // corrupt-record semantics require stable row evaluation
    CsvLoad(
      clean = raw.filter(col(corruptCol).isNull).drop(corruptCol),
      quarantine = raw.filter(col(corruptCol).isNotNull)
        .select(col(corruptCol).as("raw_line")))
  }
}
