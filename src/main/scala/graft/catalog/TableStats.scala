package graft.catalog

import org.apache.spark.sql.SparkSession

/** Table/column statistics for Spark's cost-based optimizer.
  *
  * At 100 TB the difference between a broadcast and a sort-merge join is
  * the whole query, and without statistics Spark estimates a FILTERED
  * dimension at its full scan size (size-only visitor: a Filter inherits
  * its child's `sizeInBytes`) — so a `dim WHERE kind = 'x'` that would
  * fit in a broadcast still plans a shuffle. `ANALYZE TABLE` row counts +
  * per-column NDVs let `spark.sql.cbo.enabled` estimate the post-filter
  * cardinality (`rows / ndv` for an equality) and pick the broadcast.
  * Stats are metadata-priced: one scan at write time, reused by every
  * query until the next refresh.
  *
  * Applies to catalog (saveAsTable / bucketed) tables — Spark has no
  * statistics store for bare-path reads; those rely on file-size
  * estimates and AQE's runtime re-planning instead.
  */
object TableStats {

  /** Table-level stats (+ column NDV/min/max/null-count for `columns`). */
  def analyze(spark: SparkSession, table: String,
              columns: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (columns.nonEmpty)
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS " +
        columns.mkString(", "))
  }

  /** Optimizer-visible row count, `None` until [[analyze]] has run. */
  def rowCount(spark: SparkSession, table: String): Option[BigInt] =
    spark.table(table).queryExecution.optimizedPlan.stats.rowCount

  /** Optimizer-visible size estimate in bytes. */
  def sizeInBytes(spark: SparkSession, table: String): BigInt =
    spark.table(table).queryExecution.optimizedPlan.stats.sizeInBytes
}
