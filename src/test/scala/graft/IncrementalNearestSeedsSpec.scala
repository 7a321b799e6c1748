package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, IncrementalNearestSeeds}

/** Maintained nearest-seed labels vs the batch multi-source BFS they
  * twin: after any wave sequence, `currentLabels` must be
  * ROW-IDENTICAL to [[GraphOps.nearestSeeds]] over the net edge set —
  * node, winning seed (min id at minimal distance), and distance. */
class IncrementalNearestSeedsSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = IncrementalNearestSeeds.Config(
    seeds = Seq(1L -> 10L, 7L -> 20L), maxHops = 3)

  private def signed(rows: Seq[(Long, Long)], d: Long): DataFrame =
    rows.map { case (s, t) => (s, t, d) }.toDF("src", "dst", "__delta")

  private def batchLabels(live: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    GraphOps.nearestSeeds(live.toDF("src", "dst"),
        cfg.seedByNode.toDF("node", "seed"), maxHops = cfg.maxHops)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  private def served(
      st: IncrementalNearestSeeds.Stores): Map[Long, (Long, Long)] =
    IncrementalNearestSeeds.currentLabels(st)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  // two seed regions (1: seed 10, 7: seed 20) meeting at node 4 — a tie
  // at distance 2 from both, broken to the minimum seed id
  private val g0 = Seq(1L -> 2L, 2L -> 1L, 2L -> 4L, 4L -> 2L,
    7L -> 6L, 6L -> 7L, 6L -> 4L, 4L -> 6L, 7L -> 8L, 8L -> 7L)

  test("insert waves match the batch frontier exactly (ties included)") {
    val st = IncrementalNearestSeeds.stores(spark, tmpDir("ins"), cfg)
    val (w1, w2) = g0.partition { case (s, _) => s <= 4 }
    IncrementalNearestSeeds.appendDelta(st, signed(w1, 1L), 0L)
    assert(served(st) == batchLabels(w1))
    IncrementalNearestSeeds.appendDelta(st, signed(w2, 1L), 1L)
    assert(served(st) == batchLabels(g0))
    // the contested node 4: dist 2 from both seeds → min seed 10 wins
    assert(served(st)(4L) == (10L, 2L))
  }

  test("a delete flips a tie to the surviving side") {
    val st = IncrementalNearestSeeds.stores(spark, tmpDir("ins"), cfg)
    IncrementalNearestSeeds.appendDelta(st, signed(g0, 1L), 0L)
    // cut 2→4/4→2: node 4 now belongs to seed 20's region at dist 2
    IncrementalNearestSeeds.appendDelta(st,
      signed(Seq(2L -> 4L, 4L -> 2L), -1L), 1L)
    val net = g0.filterNot(e => e == (2L -> 4L) || e == (4L -> 2L))
    assert(served(st) == batchLabels(net))
    assert(served(st)(4L) == (20L, 2L))
    // cut the other approach too: node 4 leaves the served labels
    IncrementalNearestSeeds.appendDelta(st,
      signed(Seq(6L -> 4L, 4L -> 6L), -1L), 2L)
    val net2 = net.filterNot(e => e == (6L -> 4L) || e == (4L -> 6L))
    assert(served(st) == batchLabels(net2))
    assert(!served(st).contains(4L))
  }

  test("seeds are served at distance 0 even with no edges") {
    val st = IncrementalNearestSeeds.stores(spark, tmpDir("ins"), cfg)
    assert(served(st) == Map(1L -> (10L, 0L), 7L -> (20L, 0L)))
  }

  test("replays and compaction leave the served labels invariant") {
    val st = IncrementalNearestSeeds.stores(spark, tmpDir("ins"), cfg)
    IncrementalNearestSeeds.appendDelta(st, signed(g0, 1L), 0L)
    val del = signed(Seq(7L -> 8L, 8L -> 7L), -1L)
    IncrementalNearestSeeds.appendDelta(st, del, 1L)
    val want = batchLabels(
      g0.filterNot(e => e == (7L -> 8L) || e == (8L -> 7L)))
    assert(served(st) == want)
    IncrementalNearestSeeds.appendDelta(st, del, 1L) // replay
    assert(served(st) == want)
    IncrementalNearestSeeds.compact(st)
    assert(served(st) == want)
    IncrementalNearestSeeds.appendDelta(st, del, 1L) // straddling replay
    assert(served(st) == want)
    IncrementalNearestSeeds.appendDelta(st,
      signed(Seq(8L -> 6L, 6L -> 8L), 1L), 2L)
    assert(served(st) == batchLabels(
      g0.filterNot(e => e == (7L -> 8L) || e == (8L -> 7L)) ++
        Seq(8L -> 6L, 6L -> 8L)))
  }

  test("duplicate seed nodes collapse to the minimum seed id") {
    val c2 = IncrementalNearestSeeds.Config(
      seeds = Seq(1L -> 30L, 1L -> 10L), maxHops = 2)
    val st = IncrementalNearestSeeds.stores(spark, tmpDir("ins"), c2)
    IncrementalNearestSeeds.appendDelta(st, signed(Seq(1L -> 2L), 1L), 0L)
    assert(served(st) == Map(1L -> (10L, 0L), 2L -> (10L, 1L)))
  }
}
