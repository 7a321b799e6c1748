package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, IncrementalSssp}

/** Maintained hop-bounded SSSP vs the batch op it twins: after any wave
  * sequence, `currentDists` must be ROW-IDENTICAL to
  * [[GraphOps.ssspBounded]] over the net weighted edge set. */
class IncrementalSsspSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = IncrementalSssp.Config(source = 1L, maxHops = 3)

  private def signed(rows: Seq[(Long, Long, Long)], d: Long): DataFrame =
    rows.map { case (s, t, w) => (s, t, w, d) }
      .toDF("src", "dst", "w", "__delta")

  private def batchDists(live: Seq[(Long, Long, Long)]): Map[Long, Long] =
    GraphOps.ssspBounded(live.toDF("src", "dst", "w"),
        source = cfg.source, maxHops = cfg.maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def served(st: IncrementalSssp.Stores): Map[Long, Long] =
    IncrementalSssp.currentDists(st)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // 1→2 (cheap) and 1→3→2 (cheaper total), a 3-hop tail 2→4→5, and an
  // unreachable island 10→11
  private val g0 = Seq((1L, 2L, 10L), (1L, 3L, 2L), (3L, 2L, 3L),
    (2L, 4L, 1L), (4L, 5L, 1L), (10L, 11L, 1L))

  test("insert waves match the batch recompute exactly") {
    val st = IncrementalSssp.stores(spark, tmpDir("isp"), cfg)
    val (w1, w2) = g0.partition { case (s, _, _) => s <= 2 }
    IncrementalSssp.appendDelta(st, signed(w1, 1L), 0L)
    assert(served(st) == batchDists(w1))
    IncrementalSssp.appendDelta(st, signed(w2, 1L), 1L)
    assert(served(st) == batchDists(g0))
    // sanity on the shape itself: 2 via 3 costs 5 (beats the direct
    // 10), 4 at 6 via the detour, 5 at 12 via the DIRECT edge (the
    // cheap 4-hop route is over the bound); the island never appears
    assert(served(st) ==
      Map(1L -> 0L, 2L -> 5L, 3L -> 2L, 4L -> 6L, 5L -> 12L))
  }

  test("a delete severing a subtree removes it; a detour re-prices") {
    val st = IncrementalSssp.stores(spark, tmpDir("isp"), cfg)
    IncrementalSssp.appendDelta(st, signed(g0, 1L), 0L)
    // delete the cheap detour 1→3: node 2 re-prices to the direct 10,
    // which pushes 4 past... 2→4 = 11, still within 3 hops (1→2→4)
    IncrementalSssp.appendDelta(st, signed(Seq((1L, 3L, 2L)), -1L), 1L)
    val net = g0.filterNot(_ == ((1L, 3L, 2L)))
    assert(served(st) == batchDists(net))
    // 3 left the served set (unreachable); 2 re-priced to the direct
    // 10, which re-prices 4 downstream; 5's direct route is unchanged
    assert(served(st) == Map(1L -> 0L, 2L -> 10L, 4L -> 11L, 5L -> 12L))
    // delete 1→2 as well: everything downstream of the source vanishes
    IncrementalSssp.appendDelta(st, signed(Seq((1L, 2L, 10L)), -1L), 2L)
    val net2 = net.filterNot(_ == ((1L, 2L, 10L)))
    assert(served(st) == batchDists(net2))
    assert(served(st) == Map(1L -> 0L))
  }

  test("a weight update (−old +new) re-prices downstream nodes") {
    val st = IncrementalSssp.stores(spark, tmpDir("isp"), cfg)
    IncrementalSssp.appendDelta(st, signed(g0, 1L), 0L)
    // 1→3 gets dearer (2 → 9): best 2 becomes the direct edge at 10 vs
    // 12 via 3 — batch twin decides
    val upd = signed(Seq((1L, 3L, 2L)), -1L)
      .unionByName(signed(Seq((1L, 3L, 9L)), 1L))
    IncrementalSssp.appendDelta(st, upd, 1L)
    val net = g0.filterNot(_ == ((1L, 3L, 2L))) :+ ((1L, 3L, 9L))
    assert(served(st) == batchDists(net))
  }

  test("replays and compaction leave the served distances invariant") {
    val st = IncrementalSssp.stores(spark, tmpDir("isp"), cfg)
    IncrementalSssp.appendDelta(st, signed(g0, 1L), 0L)
    val del = signed(Seq((3L, 2L, 3L)), -1L)
    IncrementalSssp.appendDelta(st, del, 1L)
    val want = batchDists(g0.filterNot(_ == ((3L, 2L, 3L))))
    assert(served(st) == want)
    IncrementalSssp.appendDelta(st, del, 1L) // replay
    assert(served(st) == want)
    IncrementalSssp.compact(st)
    assert(served(st) == want)
    IncrementalSssp.appendDelta(st, del, 1L) // compaction-straddling
    assert(served(st) == want)
    IncrementalSssp.appendDelta(st, signed(Seq((4L, 6L, 2L)), 1L), 2L)
    assert(served(st) ==
      batchDists(g0.filterNot(_ == ((3L, 2L, 3L))) :+ ((4L, 6L, 2L))))
  }

  test("the source is served at 0 even before any edge touches it") {
    val st = IncrementalSssp.stores(spark, tmpDir("isp"), cfg)
    assert(served(st) == Map(1L -> 0L))
    IncrementalSssp.appendDelta(st,
      signed(Seq((10L, 11L, 1L)), 1L), 0L)
    assert(served(st) == Map(1L -> 0L))
  }

  test("a disjoint batch appends no distance state for the old graph") {
    val st = IncrementalSssp.stores(spark, tmpDir("isp"), cfg)
    IncrementalSssp.appendDelta(st, signed(g0, 1L), 0L)
    val filesBefore = st.dists.dataFiles().toSet
    IncrementalSssp.appendDelta(st,
      signed(Seq((100L, 101L, 1L)), 1L), 1L)
    assert(served(st) == batchDists(g0 :+ ((100L, 101L, 1L))))
    val newFiles = st.dists.dataFiles().toSet -- filesBefore
    assert(newFiles.isEmpty,
      "an unreachable disjoint batch must emit no distance rows")
  }
}
