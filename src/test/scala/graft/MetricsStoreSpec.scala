package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.checks.MetricsStore
import graft.checks.Checks.Unique
import graft.pipeline.{Pipeline, Stage}

class MetricsStoreSpec extends SparkSpec {
  import spark.implicits._

  test("metrics history accumulates per run; volume anomaly fires on a spike") {
    val store = new MetricsStore(spark, tmpDir("metrics") + "/m")
    store.record("r1", "docs", Seq.fill(100)(1).toDF("x"))
    store.record("r2", "docs", Seq.fill(110)(1).toDF("x"))
    assert(store.volumeAnomaly("docs", tolerance = 0.5).exists(_.passed))
    store.record("r3", "docs", Seq.fill(900)(1).toDF("x")) // ~8.6x the mean
    val a = store.volumeAnomaly("docs", tolerance = 0.5)
    assert(a.exists(r => !r.passed && r.check == "volume_anomaly"))
    assert(store.history("docs").count() == 3)
    // null-count and freshness columns recorded when requested
    store.record("r4", "other",
      Seq((Some(1), 10L), (None, 20L)).toDF("v", "ts"),
      notNullCols = Seq("v"), tsCol = Some("ts"))
    val row = store.history("other").head()
    assert(row.getAs[Long]("nulls_v") == 1 && row.getAs[Long]("max_ts") == 20L)
  }

  test("null-rate anomaly fires on drift, not on volume growth") {
    val store = new MetricsStore(spark, tmpDir("metrics-nr") + "/m")
    def batch(n: Int, nulls: Int) =
      (Seq.fill(nulls)(None: Option[Int]) ++ Seq.fill(n - nulls)(Some(1)))
        .toDF("v")
    store.record("r1", "docs", batch(100, 2), notNullCols = Seq("v"))
    assert(store.nullRateAnomaly("docs", "v").isEmpty, "needs ≥2 runs")
    // 10× the volume at the same ~2% null rate: NOT anomalous
    store.record("r2", "docs", batch(1000, 22), notNullCols = Seq("v"))
    assert(store.nullRateAnomaly("docs", "v", tolerance = 0.1)
      .exists(_.passed))
    // same volume, 40% null rate: anomalous
    store.record("r3", "docs", batch(1000, 400), notNullCols = Seq("v"))
    val a = store.nullRateAnomaly("docs", "v", tolerance = 0.1)
    assert(a.exists(r => !r.passed && r.check == "null_rate_anomaly"))
    // unrecorded column → no signal, no crash
    assert(store.nullRateAnomaly("docs", "missing").isEmpty)
  }

  test("stage retries recover transient build failures; check failures never retry") {
    val attempts = new AtomicInteger(0)
    val flaky = new Pipeline(Seq(Stage("flaky", retries = 2,
      build = (s, _) => {
        import s.implicits._
        if (attempts.incrementAndGet() < 3) sys.error("transient")
        Seq(1).toDF("x")
      })))
    val r = flaky.run(spark, _ => ())
    assert(r.ok && attempts.get() == 3)

    val checkAttempts = new AtomicInteger(0)
    val badData = new Pipeline(Seq(Stage("dupes", retries = 5,
      build = (s, _) => {
        import s.implicits._
        checkAttempts.incrementAndGet()
        Seq(1, 1).toDF("id")
      },
      checks = Seq(Unique(Seq("id"))))))
    val r2 = badData.run(spark, _ => ())
    assert(!r2.ok && checkAttempts.get() == 1) // deterministic failure: no retry
  }
}
