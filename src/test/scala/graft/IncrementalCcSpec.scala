package graft

import graft.ops.IncrementalCc

/** Insert-only connected-components maintenance: labels merge as edges
  * stream in, only changed memberships append, replays and compactions
  * are no-ops, untouched components' state never rewrites. */
class IncrementalCcSpec extends SparkSpec {
  import spark.implicits._

  private def labels(st: IncrementalCc.Stores): Map[Long, Long] =
    IncrementalCc.currentLabels(st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("merging two components relabels exactly the losing side") {
    val st = IncrementalCc.stores(spark, tmpDir("icc"))
    IncrementalCc.appendEdges(st,
      Seq(1L -> 2L, 3L -> 4L, 10L -> 11L).toDF("src", "dst"), 0L)
    assert(labels(st) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      10L -> 10L, 11L -> 10L))
    // bridge 2—3: components {1,2} and {3,4} merge under min id 1;
    // {10,11} untouched
    IncrementalCc.appendEdges(st, Seq(2L -> 3L).toDF("src", "dst"), 1L)
    assert(labels(st) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
    // a LOWER id joins: the whole merged component relabels to 0
    IncrementalCc.appendEdges(st, Seq(0L -> 4L).toDF("src", "dst"), 2L)
    assert(labels(st) == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 0L, 10L -> 10L, 11L -> 10L))
  }

  test("replays and compaction leave labels invariant") {
    val st = IncrementalCc.stores(spark, tmpDir("icc"))
    IncrementalCc.appendEdges(st,
      Seq(1L -> 2L, 3L -> 4L).toDF("src", "dst"), 0L)
    val merge = Seq(2L -> 3L).toDF("src", "dst")
    IncrementalCc.appendEdges(st, merge, 1L)
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
    assert(labels(st) == want)
    IncrementalCc.appendEdges(st, merge, 1L) // replay
    assert(labels(st) == want)
    IncrementalCc.compact(st)
    assert(labels(st) == want)
    IncrementalCc.appendEdges(st, merge, 1L) // post-compaction replay
    assert(labels(st) == want)
    // REAL post-compaction batch still lands
    IncrementalCc.appendEdges(st, Seq(4L -> 5L).toDF("src", "dst"), 2L)
    assert(labels(st) == want + (5L -> 1L))
  }

  test("an edge inside one component appends nothing") {
    val st = IncrementalCc.stores(spark, tmpDir("icc"))
    IncrementalCc.appendEdges(st,
      Seq(1L -> 2L, 2L -> 3L).toDF("src", "dst"), 0L)
    val filesBefore = st.labels.dataFiles().toSet
    IncrementalCc.appendEdges(st, Seq(1L -> 3L).toDF("src", "dst"), 1L)
    assert(labels(st) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // no membership changed → the emit was empty → no new data files
    assert(st.labels.dataFiles().toSet == filesBefore,
      "a no-change batch must not grow the label state")
  }

  private def signedLabels(st: IncrementalCc.SignedStores): Map[Long, Long] =
    IncrementalCc.currentLabels(st).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("signed CC: bridge delete splits and relabels; takedown removes the node") {
    val st = IncrementalCc.signedStores(spark, tmpDir("scc"))
    def batch(rows: (Long, Long, Long)*) = rows.toDF("src", "dst", "__delta")
    IncrementalCc.appendDelta(st, batch(
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (10L, 11L, 1L), (5L, 6L, 1L), (6L, 7L, 1L)), 0L)
    assert(signedLabels(st) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 5L -> 5L, 6L -> 5L, 7L -> 5L))
    // delete the 2—3 bridge: the component SPLITS, {3,4} relabels to 3
    val split = batch((2L, 3L, -1L))
    IncrementalCc.appendDelta(st, split, 1L)
    val afterSplit = Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      10L -> 10L, 11L -> 10L, 5L -> 5L, 6L -> 5L, 7L -> 5L)
    assert(signedLabels(st) == afterSplit)
    IncrementalCc.appendDelta(st, split, 1L) // replay: emit-identical
    assert(signedLabels(st) == afterSplit)
    IncrementalCc.compact(st)
    assert(signedLabels(st) == afterSplit)
    IncrementalCc.appendDelta(st, split, 1L) // post-compaction replay
    assert(signedLabels(st) == afterSplit)
    // takedown of node 7 (its only edge retracts): 7 LEAVES the served
    // labels, {5,6} survives; an unrelated new component lands in the
    // same post-compaction batch
    IncrementalCc.appendDelta(st,
      batch((6L, 7L, -1L), (20L, 21L, 1L)), 2L)
    assert(signedLabels(st) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      10L -> 10L, 11L -> 10L, 5L -> 5L, 6L -> 5L, 20L -> 20L, 21L -> 20L))
    // full-component takedown: both members vanish
    IncrementalCc.appendDelta(st, batch((10L, 11L, -1L)), 3L)
    assert(signedLabels(st) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 5L, 20L -> 20L, 21L -> 20L))
  }

  test("signed CC: an in-batch insert+delete of the same edge nets away") {
    val st = IncrementalCc.signedStores(spark, tmpDir("scc"))
    IncrementalCc.appendDelta(st,
      Seq((1L, 2L, 1L)).toDF("src", "dst", "__delta"), 0L)
    IncrementalCc.appendDelta(st,
      Seq((2L, 3L, 1L), (2L, 3L, -1L), (1L, 4L, 1L))
        .toDF("src", "dst", "__delta"), 1L)
    assert(signedLabels(st) == Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
  }

  test("signed CC: a deleted-then-reinserted edge re-merges the split") {
    val st = IncrementalCc.signedStores(spark, tmpDir("scc"))
    def batch(rows: (Long, Long, Long)*) = rows.toDF("src", "dst", "__delta")
    IncrementalCc.appendDelta(st, batch((1L, 2L, 1L), (2L, 3L, 1L)), 0L)
    // deleting 2—3 leaves node 3 edgeless: it VANISHES (node-existence
    // semantics — a node exists exactly while it has a live edge)
    IncrementalCc.appendDelta(st, batch((2L, 3L, -1L)), 1L)
    assert(signedLabels(st) == Map(1L -> 1L, 2L -> 1L))
    IncrementalCc.appendDelta(st, batch((2L, 3L, 1L)), 2L)
    assert(signedLabels(st) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
