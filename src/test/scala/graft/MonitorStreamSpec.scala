package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.checks.{Alerts, Checks, MetricsStore}
import graft.streaming.MonitorStream

/** Streaming data-quality monitoring: per-micro-batch checks routed
  * through the edge-triggered alert manager — fire once on the first
  * violating batch, suppress while subsequent batches keep violating,
  * recover when a clean batch arrives, and volume-anomaly paging from
  * stream-maintained metrics history.
  */
class MonitorStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(dir: String, ids: Seq[(Int, String)]): Unit =
    ids.toDF("id", "name").coalesce(1)
      .write.mode(SaveMode.Append).parquet(dir)

  test("per-batch checks: fire once, suppress across batches, recover") {
    val dir = tmpDir("monitor_src")
    val ckpt = tmpDir("monitor_ckpt")
    // two violating files → two micro-batches (maxFilesPerTrigger=1)
    writeBatch(dir, Seq((1, "a"), (2, null)))
    writeBatch(dir, Seq((3, null), (4, "d")))
    val schema = spark.read.parquet(dir).schema
    val mgr = new Alerts.AlertManager((_: Alerts.Alert) => ())

    val run1 = MonitorStream.monitorAvailableNow(spark, dir, schema,
      Seq(Checks.NotNull("name")), mgr, ckpt, maxFilesPerTrigger = 1)
    assert(run1.map(_.event) == Seq("fired"),
      "second violating batch must be suppressed, not re-paged")
    assert(run1.head.rule == "not_null" && run1.head.subject == "name")

    // a clean batch arrives → recovery, re-armed
    writeBatch(dir, Seq((5, "e"), (6, "f")))
    val run2 = MonitorStream.monitorAvailableNow(spark, dir, schema,
      Seq(Checks.NotNull("name")), mgr, ckpt, maxFilesPerTrigger = 1)
    assert(run2.map(_.event) == Seq("recovered"))

    // violation returns → pages again
    writeBatch(dir, Seq((7, null)))
    val run3 = MonitorStream.monitorAvailableNow(spark, dir, schema,
      Seq(Checks.NotNull("name")), mgr, ckpt, maxFilesPerTrigger = 1)
    assert(run3.map(_.event) == Seq("fired"))
  }

  test("volume anomaly pages from stream-maintained metrics history") {
    val dir = tmpDir("volmon_src")
    val ckpt = tmpDir("volmon_ckpt")
    val store = new MetricsStore(spark, tmpDir("volmon_metrics"))
    val mgr = new Alerts.AlertManager((_: Alerts.Alert) => ())
    val normal = (1 to 200).map(i => (i, s"n$i"))
    writeBatch(dir, normal)
    val schema = spark.read.parquet(dir).schema

    // run 1 establishes history; no prior runs → no anomaly possible
    val run1 = MonitorStream.monitorVolumeAvailableNow(spark, dir, schema,
      store, "events", mgr, ckpt)
    assert(run1.isEmpty)

    // a 5-row batch against a 200-row trailing mean → anomaly fires
    writeBatch(dir, Seq((9001, "x"), (9002, "y"), (9003, "z"), (9004, "w"), (9005, "v")))
    val run2 = MonitorStream.monitorVolumeAvailableNow(spark, dir, schema,
      store, "events", mgr, ckpt)
    assert(run2.map(_.event) == Seq("fired"))
    assert(run2.head.rule == "volume_anomaly" && run2.head.subject == "events")
  }

  test("null-rate drift pages from stream-maintained metrics history") {
    val dir = tmpDir("nrmon_src")
    val ckpt = tmpDir("nrmon_ckpt")
    val store = new MetricsStore(spark, tmpDir("nrmon_metrics"))
    val mgr = new Alerts.AlertManager((_: Alerts.Alert) => ())
    def batch(n: Int, nulls: Int): Seq[(Int, String)] =
      (1 to n).map(i => (i, if (i <= nulls) null else s"v$i"))
    writeBatch(dir, batch(200, 4)) // 2% nulls: baseline
    val schema = spark.read.parquet(dir).schema
    val run1 = MonitorStream.monitorVolumeAvailableNow(spark, dir, schema,
      store, "docs", mgr, ckpt, notNullCols = Seq("name"))
    assert(run1.isEmpty)
    // same volume, 50% nulls → null-rate fires, volume stays quiet
    writeBatch(dir, batch(200, 100))
    val run2 = MonitorStream.monitorVolumeAvailableNow(spark, dir, schema,
      store, "docs", mgr, ckpt, notNullCols = Seq("name"))
    assert(run2.map(_.rule) == Seq("null_rate_anomaly"))
    assert(run2.head.subject == "docs.name")
  }
}
