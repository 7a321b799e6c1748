package graft

import graft.checks.MetricsStore
import graft.pipeline.{Pipeline, Stage}

class PipelineMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("attached metrics store records per-stage volume rows each run") {
    val store = new MetricsStore(spark, tmpDir("pm") + "/m")
    def mkPipeline(n: Int, run: String) = new Pipeline(Seq(
      Stage("a", build = (s, _) => { import s.implicits._; (1 to n).toDF("x") }),
      Stage("b", deps = Seq("a"), build = (s, ctx) => ctx("a"))))
      .withMetrics(store, run)
    assert(mkPipeline(100, "r1").run(spark, _ => ()).ok)
    assert(mkPipeline(110, "r2").runParallel(spark, 2, _ => ()).ok)
    assert(store.history("a").count() == 2)
    assert(store.history("b").collect().map(_.getAs[Long]("row_count")).toSeq
      == Seq(100L, 110L))
    // spike in a third run triggers the volume anomaly
    assert(mkPipeline(2000, "r3").run(spark, _ => ()).ok)
    assert(store.volumeAnomaly("a", tolerance = 0.5).exists(!_.passed))
  }
}
