package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, IncrementalKCore}

/** Maintained k-core vs the batch peel it twins: after any wave
  * sequence, `currentCore` must be ROW-IDENTICAL to [[GraphOps.kCore]]
  * over the net edge set — membership AND in-core degree. */
class IncrementalKCoreSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = IncrementalKCore.Config(k = 3)

  private def signed(rows: Seq[(Long, Long)], d: Long): DataFrame =
    rows.map { case (s, t) => (s, t, d) }.toDF("src", "dst", "__delta")

  private def batchCore(live: Seq[(Long, Long)]): Map[Long, Long] =
    if (live.isEmpty) Map.empty
    else GraphOps.kCore(live.toDF("src", "dst"), k = cfg.k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def served(st: IncrementalKCore.Stores): Map[Long, Long] =
    IncrementalKCore.currentCore(st)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b)

  // K4 on {1..4}, a pendant chain 4−5−6, and a separate K4 on {10..13}
  private val g0 = clique(Seq(1L, 2L, 3L, 4L)) ++
    Seq(4L -> 5L, 5L -> 6L) ++ clique(Seq(10L, 11L, 12L, 13L))

  test("insert waves match the batch peel exactly") {
    val st = IncrementalKCore.stores(spark, tmpDir("ikc"), cfg)
    val (w1, w2) = g0.partition { case (s, _) => s < 10 }
    IncrementalKCore.appendDelta(st, signed(w1, 1L), 0L)
    assert(served(st) == batchCore(w1))
    IncrementalKCore.appendDelta(st, signed(w2, 1L), 1L)
    assert(served(st) == batchCore(g0))
    // both K4s are the 3-core; the chain is not
    assert(served(st) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      10L -> 3L, 11L -> 3L, 12L -> 3L, 13L -> 3L))
  }

  test("a delete triggers the cascade; the other component survives") {
    val st = IncrementalKCore.stores(spark, tmpDir("ikc"), cfg)
    IncrementalKCore.appendDelta(st, signed(g0, 1L), 0L)
    // deleting one K4 edge unravels THAT whole component (every member
    // drops to 2); the second K4 must not be touched
    IncrementalKCore.appendDelta(st, signed(Seq(1L -> 2L), -1L), 1L)
    val net = g0.filterNot(_ == (1L -> 2L))
    assert(served(st) == batchCore(net))
    assert(served(st) == Map(10L -> 3L, 11L -> 3L, 12L -> 3L, 13L -> 3L))
  }

  test("an insert re-admits a previously unraveled region") {
    val st = IncrementalKCore.stores(spark, tmpDir("ikc"), cfg)
    IncrementalKCore.appendDelta(st, signed(g0, 1L), 0L)
    IncrementalKCore.appendDelta(st, signed(Seq(1L -> 2L), -1L), 1L)
    // restore the edge: the component must re-enter the core exactly
    IncrementalKCore.appendDelta(st, signed(Seq(1L -> 2L), 1L), 2L)
    assert(served(st) == batchCore(g0))
  }

  test("a long cascade chain peels fully") {
    val st = IncrementalKCore.stores(spark, tmpDir("ikc"),
      IncrementalKCore.Config(k = 2))
    // a cycle 1−2−...−8−1 is exactly the 2-core; cutting one edge
    // unravels the entire ring, node by node, in a cascade
    val ring = (1L to 7L).map(i => i -> (i + 1)) :+ (8L -> 1L)
    IncrementalKCore.appendDelta(st, signed(ring, 1L), 0L)
    assert(served(st) == ring.flatMap(e => Seq(e._1, e._2)).distinct
      .map(_ -> 2L).toMap)
    IncrementalKCore.appendDelta(st, signed(Seq(3L -> 4L), -1L), 1L)
    assert(served(st) == Map.empty[Long, Long])
  }

  test("a mixed batch: deletion whose victims are saved by inserts") {
    val st = IncrementalKCore.stores(spark, tmpDir("ikc"), cfg)
    IncrementalKCore.appendDelta(st, signed(g0, 1L), 0L)
    // one batch removes a K4 edge AND adds edges that keep every
    // member at degree ≥ 3 (re-admission inside a single batch: the
    // cascade may over-remove, the insertion region must recover)
    val mixed = signed(Seq(1L -> 2L), -1L)
      .unionByName(signed(Seq(1L -> 5L, 2L -> 5L, 4L -> 6L, 3L -> 6L,
        5L -> 6L, 1L -> 6L, 2L -> 6L), 1L))
    IncrementalKCore.appendDelta(st, mixed, 1L)
    val net = g0.filterNot(_ == (1L -> 2L)) ++
      Seq(1L -> 5L, 2L -> 5L, 4L -> 6L, 3L -> 6L, 5L -> 6L, 1L -> 6L,
        2L -> 6L)
    assert(served(st) == batchCore(net))
    assert(served(st).keySet.intersect(Set(1L, 2L, 3L, 4L, 5L, 6L))
      .nonEmpty, "the rescued region must be back in the core")
  }

  test("replays and compaction leave the served core invariant") {
    val st = IncrementalKCore.stores(spark, tmpDir("ikc"), cfg)
    IncrementalKCore.appendDelta(st, signed(g0, 1L), 0L)
    val del = signed(Seq(10L -> 11L), -1L)
    IncrementalKCore.appendDelta(st, del, 1L)
    val want = batchCore(g0.filterNot(_ == (10L -> 11L)))
    assert(served(st) == want)
    IncrementalKCore.appendDelta(st, del, 1L) // replay
    assert(served(st) == want)
    IncrementalKCore.compact(st)
    assert(served(st) == want)
    IncrementalKCore.appendDelta(st, del, 1L) // compaction-straddling
    assert(served(st) == want)
    IncrementalKCore.appendDelta(st,
      signed(Seq(10L -> 11L), 1L), 2L) // real post-compaction batch
    assert(served(st) == batchCore(g0))
  }

  test("a disjoint sub-core batch appends only its own rows") {
    val st = IncrementalKCore.stores(spark, tmpDir("ikc"), cfg)
    IncrementalKCore.appendDelta(st, signed(g0, 1L), 0L)
    val filesBefore = st.core.dataFiles().toSet
    val far = clique(Seq(100L, 101L, 102L, 103L))
    IncrementalKCore.appendDelta(st, signed(far, 1L), 1L)
    assert(served(st) == batchCore(g0 ++ far))
    val newFiles = st.core.dataFiles().toSet -- filesBefore
    if (newFiles.nonEmpty) {
      val emitted = spark.read.parquet(newFiles.toSeq: _*)
        .select(col("node")).distinct()
        .collect().map(_.getLong(0)).toSet
      assert(emitted == Set(100L, 101L, 102L, 103L),
        s"a disjoint batch touched existing core rows: $emitted")
    }
  }
}
