package graft

import graft.ops.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // star: center 0 ↔ leaves 1,2,3 (symmetrized)
  private val star = Seq(
    (0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L))

  test("one iteration matches the hand-computed integer ranks") {
    val out = GraphOps.pageRankQuantized(star.toDF("src", "dst"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // center: base + 85·(3·(10⁹ div 1)) div 100 = 150000000 + 2550000000
    assert(out(0L) == 2700000000L)
    // leaf: base + 85·(10⁹ div 3) div 100 = 150000000 + 283333333
    assert(out(1L) == 433333333L)
    assert(out(2L) == 433333333L && out(3L) == 433333333L)
  }

  test("ranks are bit-identical across partitionings (integer arithmetic)") {
    val edges = (1L to 500L).flatMap { i =>
      Seq((i, i % 50), (i % 50, i), (i, (i * 7) % 500), ((i * 7) % 500, i))
    }
    val a = GraphOps.pageRankQuantized(edges.toDF("src", "dst").repartition(1), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = GraphOps.pageRankQuantized(edges.toDF("src", "dst").repartition(17), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("broadcast and shuffled iteration paths are bit-identical") {
    val edges = (1L to 300L).flatMap(i => Seq((i, i % 37), (i % 37, i)))
    val df = edges.toDF("src", "dst")
    val bcast = GraphOps.pageRankQuantized(df, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // maxBroadcastNodes=0 forces the large-graph plan (shuffled joins,
    // AQE left on) — the hints must never change a single rank value
    val shuffled = GraphOps.pageRankQuantized(df, 3, maxBroadcastNodes = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(bcast.toSeq == shuffled.toSeq)
  }

  test("cut cadence never changes values; AQE conf is restored") {
    val edges = (1L to 200L).flatMap(i => Seq((i, i % 23), (i % 23, i)))
    val df = edges.toDF("src", "dst")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val every = GraphOps.pageRankQuantized(df, 4, cutEvery = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val sparse = GraphOps.pageRankQuantized(df, 4, cutEvery = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(every.toSeq == sparse.toSeq)
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == aqeBefore)
  }

  test("dangling destinations get base rank and every node appears once") {
    // 1→2 only: node 2 has no out-edges (kept as a node, contributes nothing)
    val out = GraphOps.pageRankQuantized(Seq((1L, 2L)).toDF("src", "dst"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 2)
    assert(out(1L) == 150000000L) // nothing points at 1
    // 2 receives 1's full rank each iteration: base + 85·r(1) div 100
    assert(out(2L) == 150000000L + 85L * 150000000L / 100L)
  }
}
