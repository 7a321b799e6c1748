package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.RankOps

class RankOpsSpec extends SparkSpec {
  import spark.implicits._

  /** 50 keys × 200 rows with a deterministic pseudo-random value and a
    * unique id tie-break. */
  lazy val data = (1 to 10000).map { i =>
    (i % 50L, (i * 2654435761L) % 10007L, i.toLong)
  }.toDF("key", "v", "id")

  private def windowed(largest: Boolean, k: Int) = {
    val ord = if (largest) Seq($"v".desc, $"id".desc) else Seq($"v".asc, $"id".asc)
    data.withColumn("rank", row_number().over(
        Window.partitionBy($"key").orderBy(ord: _*)))
      .filter($"rank" <= k)
      .select($"key", $"rank", $"v", $"id")
  }

  private def assertMatchesWindow(largest: Boolean, k: Int): Unit = {
    val got = RankOps.topKPerKey(data, Seq("key"), Seq($"v"), k,
        largest = largest, payload = Seq("id"))
      .select($"key", $"rank", $"v", $"id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val want = windowed(largest, k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
  }

  test("top-k largest per key equals the window formulation, ranks included") {
    assertMatchesWindow(largest = true, k = 5)
  }

  test("bottom-k per key equals the ascending window formulation") {
    assertMatchesWindow(largest = false, k = 3)
  }

  test("k larger than the group returns the whole group ranked") {
    val small = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 5L, 3L)).toDF("key", "v", "id")
    val got = RankOps.topKPerKey(small, Seq("key"), Seq($"v"), k = 10,
        largest = true, payload = Seq("id"))
      .orderBy($"key", $"rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 1, 20L), (1L, 2, 10L), (2L, 1, 5L)))
  }

  test("no Sort node: the plan is heap-aggregate + explode") {
    val df = RankOps.topKPerKey(data, Seq("key"), Seq($"v"), 5,
      largest = true, payload = Seq("id"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("collect_top_k"), s"expected collect_top_k in: $p")
    assert(!p.contains("Sort "), "top-k per key must not sort partitions")
    assert(!p.contains("Window"), "top-k per key must not use a window")
  }
}
