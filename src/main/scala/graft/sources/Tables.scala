package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Loaders for the driver's TPC-H-ish parquet test tables (TESTDATA.md).
  *
  * One parquet file per table under `<dir>/<name>.parquet`. Column pruning
  * and predicate pushdown reach the parquet scan because these are plain
  * declarative reads — verify with `.explain("formatted")` (`PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // With spark.sql.legacy.parquet.nanosAsLong=true, TIMESTAMP(NANOS)
    // columns (events.ts) surface as LongType epoch-nanos; convert to a
    // proper TimestampType (micros). Lossless here — testdata carries no
    // sub-microsecond digits.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    // Generator flavors vary: a micros column with isAdjustedToUTC=false
    // infers as TIMESTAMP_NTZ unless the session disables NTZ inference
    // (GraftSession does). Under the UTC session the wall-clock micros ARE
    // the instant, so the cast is value-preserving — and keeps every
    // downstream unix_micros/window expression on plain TimestampType.
    else if (name == "events" && df.schema("ts").dataType == TimestampNTZType)
      df.withColumn("ts", col("ts").cast("timestamp"))
    else df
  }

  /** Register every table as a temp view so `spark.sql` works against the
    * same names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
