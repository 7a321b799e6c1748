package graft

import graft.functions.CountMin

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("collision-free regime: estimates are exact and partitioning-invariant") {
    val items = (1 to 5000).map(i => s"k${i % 40}")
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def run(parts: Int): Map[String, Long] = {
      val sk = items.toDF("v").repartition(parts).as[String]
        .select(CountMin.sketch(5, 4096)).head()
      exact.keys.map(k => k -> CountMin.estimate(sk, 5, 4096, k)).toMap
    }
    assert(run(1) == exact)
    assert(run(13) == exact) // linear sketch: merge order cannot matter
  }

  test("approximate regime: overestimate-only within the eps*N bound") {
    val n = 20000
    val items = (1 to n).map(i => s"item${i % 1000}") // 1000 keys, width 64
    val (depth, width) = (5, 64)
    val sk = items.toDF("v").as[String].select(CountMin.sketch(depth, width)).head()
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val eps = math.E / width
    exact.foreach { case (k, c) =>
      val est = CountMin.estimate(sk, depth, width, k)
      assert(est >= c, s"CMS must never underestimate: $k $est < $c")
      // e^-depth < 1%% failure per key; deterministic here, so assert all
      assert(est - c <= (eps * n).ceil.toLong * 3,
        s"estimate error too large for $k: $est vs $c")
    }
  }

  test("absent keys estimate to zero when the sketch is sparse") {
    val sk = Seq("a", "b", "c").toDF("v").as[String]
      .select(CountMin.sketch(5, 4096)).head()
    assert(CountMin.estimate(sk, 5, 4096, "zzz-not-present") == 0L)
  }
}
