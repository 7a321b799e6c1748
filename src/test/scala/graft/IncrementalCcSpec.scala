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
}
