package graft.checks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.SnapshotTable

/** Per-run metrics history + anomaly rules — the engine-native form of the
  * reference's Elementary monitoring (SURVEY.md §2.8 T4: volume/freshness
  * anomaly models persisted across runs).
  *
  * Each pipeline run appends one row per monitored table (run id, row
  * count, null counts, max event time, wall clock). Anomaly checks compare
  * the newest run against trailing history — all computed as DataFrame
  * aggregation over the (tiny) metrics table, never over the data itself.
  */
class MetricsStore(spark: SparkSession, root: String) {

  private val table = new SnapshotTable(spark, root)

  /** Record metrics for one table in one run (one fused aggregation pass
    * over `df`). When the caller already knows the row count — e.g. from
    * the WAP audit's fused aggregation — use [[recordRowCount]] instead
    * and skip this scan entirely. */
  def record(runId: String, tableName: String, df: DataFrame,
             notNullCols: Seq[String] = Nil, tsCol: Option[String] = None): Unit = {
    val aggs = Seq(count(lit(1)).as("row_count")) ++
      notNullCols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")) ++
      tsCol.map(c => max(col(c)).cast("long").as("max_ts")).toSeq
    append(runId, tableName, df.agg(aggs.head, aggs.tail: _*))
  }

  /** Record a volume row from an ALREADY-COMPUTED count — zero data
    * scans (the pipeline reads the count off the audit aggregation it
    * runs anyway; at 100 TB the difference between "metrics are free"
    * and "metrics re-read the table once per stage"). */
  def recordRowCount(runId: String, tableName: String, rowCount: Long): Unit = {
    val sp = spark
    import sp.implicits._
    append(runId, tableName, Seq(rowCount).toDF("row_count"))
  }

  private def append(runId: String, tableName: String,
                     metricsRow: DataFrame): Unit = {
    // single-row frame; the read-union-overwrite is over the (tiny)
    // metrics table only
    val row = metricsRow
      .withColumn("run_id", lit(runId))
      .withColumn("table_name", lit(tableName))
      .withColumn("recorded_at", current_timestamp())
    if (table.exists)
      table.overwrite(table.read().unionByName(row, allowMissingColumns = true))
    else table.overwrite(row)
  }

  def history(tableName: String): DataFrame =
    table.read().filter(col("table_name") === tableName)
      .orderBy(col("recorded_at"))

  /** Volume anomaly: newest row_count deviates from the trailing mean of
    * prior runs by more than `tolerance` (fraction). Returns None when
    * there's no history to compare against. */
  def volumeAnomaly(tableName: String, tolerance: Double = 0.5): Option[Checks.CheckResult] = {
    val h = history(tableName).select("row_count").collect().map(_.getLong(0))
    if (h.length < 2) None
    else {
      val prior = h.dropRight(1)
      val mean = prior.sum.toDouble / prior.length
      val latest = h.last
      val dev = if (mean == 0) 0.0 else math.abs(latest - mean) / mean
      val ok = dev <= tolerance
      Some(Checks.CheckResult("volume_anomaly", tableName,
        if (ok) 0 else 1, Checks.Warn, ok,
        detail = f"latest=$latest mean=$mean%.1f deviation=$dev%.3f tol=$tolerance"))
    }
  }

  /** Null-rate anomaly (the Elementary column-level monitor): the newest
    * run's null FRACTION for `colName` deviates from the trailing mean
    * by more than `tolerance` fraction points — a rate, not a count, so
    * volume growth alone can't trip it. Requires the column to have been
    * recorded via `record(notNullCols = ...)`; runs that didn't record
    * it are skipped. None without a recorded latest run and ≥1 prior. */
  def nullRateAnomaly(tableName: String, colName: String,
                      tolerance: Double = 0.1): Option[Checks.CheckResult] = {
    val c = s"nulls_$colName"
    val h = history(tableName)
    if (!h.columns.contains(c)) return None
    val rows = h.select(col("row_count"), col(c).cast("long")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    def rate(n: Long, nulls: Long) = if (n == 0) 0.0 else nulls.toDouble / n
    val prior = rows.dropRight(1).collect { case (n, Some(v)) => rate(n, v) }
    rows.lastOption.collect { case (n, Some(v)) if prior.nonEmpty =>
      val mean = prior.sum / prior.length
      val latest = rate(n, v)
      val dev = math.abs(latest - mean)
      val ok = dev <= tolerance
      Checks.CheckResult("null_rate_anomaly", s"$tableName.$colName",
        if (ok) 0 else 1, Checks.Warn, ok,
        detail = f"latest=$latest%.4f mean=$mean%.4f deviation=$dev%.4f tol=$tolerance")
    }
  }
}
