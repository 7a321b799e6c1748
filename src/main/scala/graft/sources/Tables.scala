package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` works against the
    * same names the DuckDB oracle sees. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
