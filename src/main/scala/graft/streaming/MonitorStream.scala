package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.checks.{Alerts, Checks, MetricsStore}

/** Streaming data-quality monitoring — the streaming twin of
  * `Pipeline.withAlerts`: every micro-batch is checked and the results
  * routed through an edge-triggered [[Alerts.AlertManager]], so a stream
  * that starts violating a contract pages once, stays suppressed while it
  * keeps violating, and pages again on recovery (reference behavior:
  * Elementary monitors posting to Slack, `promptly/app.py:52-58` — here
  * evaluated continuously instead of per scheduled run).
  *
  * Scale posture: each check is one batch-sized aggregation fused into the
  * micro-batch (no full-table rescans); alert/suppression state is
  * O(#checks) driver scalars held by the manager, and the MetricsStore
  * variant appends one metrics row per batch — none of it grows with
  * stream volume. Alert state lives in the manager instance (one per
  * driver), matching any alert deduplicator; the checkpoint makes batch
  * replay idempotent on the data side while a crash between delivery and
  * checkpoint can at worst re-page, never drop a page (same
  * delivery-commit contract as [[Alerts.AlertManager.process]]).
  */
object MonitorStream {

  /** Run `checks` on every micro-batch, routing results through `manager`.
    * Returns the alerts actually delivered during this invocation.
    * `maxFilesPerTrigger` bounds micro-batch size (and lets tests force
    * multi-batch runs to exercise cross-batch suppression). */
  def monitorAvailableNow(spark: SparkSession, parquetDir: String,
                          schema: StructType,
                          checks: Seq[Checks.Check],
                          manager: Alerts.AlertManager,
                          checkpointDir: String,
                          maxFilesPerTrigger: Int = Integer.MAX_VALUE): Seq[Alerts.Alert] =
    run(spark, parquetDir, schema, checkpointDir, maxFilesPerTrigger) {
      (batch, _) => manager.process(Checks.runAll(batch, checks))
    }

  /** Metrics-history variant: record each micro-batch into the
    * [[MetricsStore]] and evaluate the volume-anomaly rule — plus the
    * null-rate drift rule for each of `notNullCols` — against the
    * trailing history, paging through `manager` on deviation beyond the
    * tolerances. The anomaly models thus update at stream cadence
    * rather than scheduler cadence. */
  def monitorVolumeAvailableNow(spark: SparkSession, parquetDir: String,
                                schema: StructType,
                                store: MetricsStore, tableName: String,
                                manager: Alerts.AlertManager,
                                checkpointDir: String,
                                tolerance: Double = 0.5,
                                maxFilesPerTrigger: Int = Integer.MAX_VALUE,
                                notNullCols: Seq[String] = Nil,
                                nullRateTolerance: Double = 0.1): Seq[Alerts.Alert] =
    run(spark, parquetDir, schema, checkpointDir, maxFilesPerTrigger) {
      (batch, batchId) =>
        store.record(s"batch_$batchId", tableName, batch, notNullCols)
        manager.process(store.volumeAnomaly(tableName, tolerance).toSeq ++
          notNullCols.flatMap(c =>
            store.nullRateAnomaly(tableName, c, nullRateTolerance)))
    }

  private def run(spark: SparkSession, parquetDir: String,
                  schema: StructType, checkpointDir: String,
                  maxFilesPerTrigger: Int)(
      evalBatch: (DataFrame, Long) => Seq[Alerts.Alert]): Seq[Alerts.Alert] = {
    // foreachBatch bodies execute on the driver, so the buffer (like the
    // manager's suppression state) is safe single-JVM driver state.
    val sent = mutable.ArrayBuffer[Alerts.Alert]()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .parquet(parquetDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sent ++= evalBatch(batch, batchId)
        ()
      }
      .start()
    q.awaitTermination()
    sent.toSeq
  }
}
