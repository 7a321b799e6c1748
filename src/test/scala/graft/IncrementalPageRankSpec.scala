package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, IncrementalPageRank}

/** Maintained k-iteration PageRank vs the batch op it twins: after any
  * wave sequence, `currentRanks` must be ROW-IDENTICAL to
  * [[GraphOps.pageRankQuantized]] over the net edge set — the quantized
  * integer arithmetic leaves no tolerance to hide behind. */
class IncrementalPageRankSpec extends SparkSpec {
  import spark.implicits._

  private def signed(rows: Seq[(Long, Long)], d: Long): DataFrame =
    rows.map { case (s, t) => (s, t, d) }.toDF("src", "dst", "__delta")

  /** Batch recompute over the live edge set: (node, rk) map. */
  private def batchRanks(live: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.pageRankQuantized(live.toDF("src", "dst"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def servedRanks(st: IncrementalPageRank.Stores): Map[Long, Long] =
    IncrementalPageRank.currentRanks(st)
      .select(col("node"), col("r3"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def servedDegs(st: IncrementalPageRank.Stores): Map[Long, Long] =
    IncrementalPageRank.currentRanks(st)
      .select(col("node"), col("deg"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // a small directed graph with a hub, a chain (so multi-hop
  // propagation is exercised), and a disconnected pair
  private val g0 = Seq(1L -> 2L, 2L -> 1L, 1L -> 3L, 3L -> 1L,
    3L -> 4L, 4L -> 5L, 5L -> 3L, 10L -> 11L, 11L -> 10L)

  test("insert waves match the batch recompute exactly") {
    val st = IncrementalPageRank.stores(spark, tmpDir("ipr"))
    val (w1, w2) = g0.partition { case (s, _) => s % 2 == 1 }
    IncrementalPageRank.appendDelta(st, signed(w1, 1L), 0L)
    assert(servedRanks(st) == batchRanks(w1))
    IncrementalPageRank.appendDelta(st, signed(w2, 1L), 1L)
    assert(servedRanks(st) == batchRanks(g0))
    assert(servedDegs(st) == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L,
      5L -> 1L, 10L -> 1L, 11L -> 1L))
  }

  test("a delete wave re-solves the touched closure; far state survives") {
    val st = IncrementalPageRank.stores(spark, tmpDir("ipr"))
    IncrementalPageRank.appendDelta(st, signed(g0, 1L), 0L)
    // delete 3→4: the chain loses its feed, ranks downstream of 3 drop;
    // the {10,11} component is untouched
    IncrementalPageRank.appendDelta(st, signed(Seq(3L -> 4L), -1L), 1L)
    val net = g0.filterNot(_ == (3L -> 4L))
    assert(servedRanks(st) == batchRanks(net))
  }

  test("a takedown removing a node's last edges removes its vector") {
    val st = IncrementalPageRank.stores(spark, tmpDir("ipr"))
    IncrementalPageRank.appendDelta(st, signed(g0, 1L), 0L)
    IncrementalPageRank.appendDelta(st,
      signed(Seq(10L -> 11L, 11L -> 10L), -1L), 1L)
    val net = g0.filterNot(e => e._1 >= 10L)
    val served = servedRanks(st)
    assert(!served.contains(10L) && !served.contains(11L),
      s"taken-down nodes must vanish from the served ranks: $served")
    assert(served == batchRanks(net))
  }

  test("in-batch insert+delete of the same edge nets away") {
    val st = IncrementalPageRank.stores(spark, tmpDir("ipr"))
    IncrementalPageRank.appendDelta(st, signed(g0, 1L), 0L)
    val churn = signed(Seq(2L -> 5L), 1L)
      .unionByName(signed(Seq(2L -> 5L), -1L))
    IncrementalPageRank.appendDelta(st, churn, 1L)
    assert(servedRanks(st) == batchRanks(g0))
  }

  test("replays and compaction leave the served ranks invariant") {
    val st = IncrementalPageRank.stores(spark, tmpDir("ipr"))
    IncrementalPageRank.appendDelta(st, signed(g0, 1L), 0L)
    val del = signed(Seq(1L -> 3L), -1L)
    IncrementalPageRank.appendDelta(st, del, 1L)
    val want = batchRanks(g0.filterNot(_ == (1L -> 3L)))
    assert(servedRanks(st) == want)
    IncrementalPageRank.appendDelta(st, del, 1L) // replay: emit-identical
    assert(servedRanks(st) == want)
    IncrementalPageRank.compact(st)
    assert(servedRanks(st) == want)
    IncrementalPageRank.appendDelta(st, del, 1L) // compaction-straddling
    assert(servedRanks(st) == want)
    // a REAL post-compaction batch still lands
    IncrementalPageRank.appendDelta(st, signed(Seq(5L -> 6L), 1L), 2L)
    assert(servedRanks(st) ==
      batchRanks(g0.filterNot(_ == (1L -> 3L)) :+ (5L -> 6L)))
  }

  test("a no-change batch far from the graph appends no rank state") {
    val st = IncrementalPageRank.stores(spark, tmpDir("ipr"))
    IncrementalPageRank.appendDelta(st, signed(g0, 1L), 0L)
    val filesBefore = st.ranks.dataFiles().toSet
    // a disjoint two-cycle: its own vectors append, but no existing
    // node's vector may be touched
    IncrementalPageRank.appendDelta(st,
      signed(Seq(100L -> 101L, 101L -> 100L), 1L), 1L)
    val served = servedRanks(st)
    assert(served == batchRanks(g0 ++ Seq(100L -> 101L, 101L -> 100L)))
    val newFiles = st.ranks.dataFiles().toSet -- filesBefore
    // the emitted partials must mention only the new component's nodes
    if (newFiles.nonEmpty) {
      val emitted = spark.read.parquet(newFiles.toSeq: _*)
        .select(col("node")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(emitted == Set(100L, 101L),
        s"a disjoint batch touched existing vectors: $emitted")
    }
  }

  test("dangling nodes hold rank, contribute nothing, and match batch") {
    val st = IncrementalPageRank.stores(spark, tmpDir("ipr"))
    // 1→2→3, 3 dangling (deg 0); 4→3 later adds an in-edge to it
    val base = Seq(1L -> 2L, 2L -> 3L)
    IncrementalPageRank.appendDelta(st, signed(base, 1L), 0L)
    assert(servedRanks(st) == batchRanks(base))
    assert(servedDegs(st)(3L) == 0L)
    IncrementalPageRank.appendDelta(st, signed(Seq(4L -> 3L), 1L), 1L)
    assert(servedRanks(st) == batchRanks(base :+ (4L -> 3L)))
  }
}
