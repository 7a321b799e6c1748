package graft

import graft.ops.IncrementalTriangles

/** The triangle-count Δ-rule (δAA + δδA + δδδ) against hand-counted
  * graphs: insert waves, delete waves, mixed batches, replays,
  * compaction — every step must equal the from-scratch count. */
class IncrementalTrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def edges(es: (Long, Long)*): org.apache.spark.sql.DataFrame =
    es.toSeq.toDF("src", "dst").withColumn("__delta",
      org.apache.spark.sql.functions.lit(1L))

  private def deletes(es: (Long, Long)*): org.apache.spark.sql.DataFrame =
    es.toSeq.toDF("src", "dst").withColumn("__delta",
      org.apache.spark.sql.functions.lit(-1L))

  private def count(st: IncrementalTriangles.Stores): Long =
    IncrementalTriangles.current(st).collect().head.getLong(0)

  test("inserts, deletes, mixed batches, replay, compaction — all exact") {
    val st = IncrementalTriangles.stores(spark, tmpDir("itri"))
    assert(count(st) == 0L) // pre-first-append serve
    // K4 minus (3,4): triangles 123, 124
    IncrementalTriangles.appendDelta(st,
      edges(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L), 0L)
    assert(count(st) == 2L)
    // close K4: 4 triangles
    IncrementalTriangles.appendDelta(st, edges(3L -> 4L), 1L)
    assert(count(st) == 4L)
    // mixed wave: delete (1,2) [kills 123, 124], add (2,5), (4,5)
    // [creates 245] → {134, 234, 245}
    val mixed = deletes(1L -> 2L).unionByName(edges(2L -> 5L, 4L -> 5L))
    IncrementalTriangles.appendDelta(st, mixed, 2L)
    assert(count(st) == 3L)
    // replay: both stores no-op at their manifests
    IncrementalTriangles.appendDelta(st, mixed, 2L)
    assert(count(st) == 3L)
    IncrementalTriangles.compact(st)
    assert(count(st) == 3L)
    // REAL post-compaction batch: delete (4,5) → kills 245
    IncrementalTriangles.appendDelta(st, deletes(4L -> 5L), 3L)
    assert(count(st) == 2L)
    assert(IncrementalTriangles.currentEdges(st).count() == 6L)
    // per-node view after all waves: edges {13,14,23,24,34,25},
    // triangles {134, 234}
    val perNode = IncrementalTriangles.currentPerNode(st)
      .orderBy($"node")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(perNode == Seq(
      (1L, 2L, 1L, 1000000L),
      (2L, 3L, 1L, 333333L),
      (3L, 3L, 2L, 666666L),
      (4L, 3L, 2L, 666666L),
      (5L, 1L, 0L, 0L)))
  }

  test("a batch deleting two edges of one triangle applies the δδA correction") {
    val st = IncrementalTriangles.stores(spark, tmpDir("itri"))
    IncrementalTriangles.appendDelta(st,
      edges(1L -> 2L, 1L -> 3L, 2L -> 3L), 0L)
    assert(count(st) == 1L)
    // naive per-edge deltas would double-count the shared triangle (−2);
    // the pairwise δδ·A term restores −1
    IncrementalTriangles.appendDelta(st, deletes(1L -> 2L, 1L -> 3L), 1L)
    assert(count(st) == 0L)
    assert(IncrementalTriangles.currentEdges(st).count() == 1L)
  }

  test("a batch inserting a full triangle counts it exactly once (δδδ)") {
    val st = IncrementalTriangles.stores(spark, tmpDir("itri"))
    IncrementalTriangles.appendDelta(st,
      edges(7L -> 8L, 7L -> 9L, 8L -> 9L), 0L)
    assert(count(st) == 1L)
    // cancelling +1/−1 for the same edge inside ONE batch nets away
    IncrementalTriangles.appendDelta(st,
      edges(8L -> 10L).unionByName(deletes(8L -> 10L)), 1L)
    assert(count(st) == 1L)
  }
}
