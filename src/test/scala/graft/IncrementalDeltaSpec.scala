package graft

import graft.ops.{IncrementalAgg, IncrementalFullOuterJoin, IncrementalJoin,
  IncrementalOuterJoin}
import graft.sinks.AppendOnlyStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SIGNED input deltas across the IVM family: delete/update waves as
  * negative multiplicities, gated against one-shot results over the NET
  * input multisets. Covers the transition append-only inputs can never
  * take (a key becoming unmatched AGAIN after its matches are deleted),
  * over-retraction refusal, replay identity for signed batches, the
  * append-only→signed delegation, and the compaction quiescence guard. */
class IncrementalDeltaSpec extends SparkSpec {
  import spark.implicits._

  // --- helpers: signed batches carry (k, v, __delta) ---------------------

  private def sl(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("k", "lv", "__delta")
  private def sr(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("k", "rv", "__delta")

  /** The net input multiset of a signed batch sequence: (cols…, m>0). */
  private def net(batches: Seq[DataFrame], vcol: String): DataFrame =
    batches.reduce(_ unionByName _)
      .groupBy($"k", col(vcol)).agg(sum($"__delta").as("m"))
      .filter($"m" > 0)

  private def innerSet(st: IncrementalJoin.Stores) =
    IncrementalJoin.current(st).select($"k", $"lv", $"rv", $"n")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet

  private def innerOneShot(ls: Seq[DataFrame], rs: Seq[DataFrame]) =
    net(ls, "lv").withColumnRenamed("m", "ml")
      .join(net(rs, "rv").withColumnRenamed("m", "mr"), Seq("k"))
      .select($"k", $"lv", $"rv", ($"ml" * $"mr").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet

  private def outerSet(st: IncrementalOuterJoin.Stores) =
    IncrementalOuterJoin.current(st).select($"k", $"lv", $"rv", $"n")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), r.getLong(3))).toSet

  private def outerOneShot(ls: Seq[DataFrame], rs: Seq[DataFrame]) =
    net(ls, "lv").withColumnRenamed("m", "ml")
      .join(net(rs, "rv").withColumnRenamed("m", "mr"), Seq("k"), "left")
      .select($"k", $"lv", $"rv",
        when($"mr".isNull, $"ml").otherwise($"ml" * $"mr").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), r.getLong(3))).toSet

  private def fullSet(st: IncrementalFullOuterJoin.Stores) =
    IncrementalFullOuterJoin.current(st).select($"k", $"lv", $"rv", $"n")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getLong(3))).toSet

  private def fullOneShot(ls: Seq[DataFrame], rs: Seq[DataFrame]) =
    net(ls, "lv").withColumnRenamed("m", "ml")
      .join(net(rs, "rv").withColumnRenamed("m", "mr"), Seq("k"), "full")
      .select($"k", $"lv", $"rv",
        when($"mr".isNull, $"ml").when($"ml".isNull, $"mr")
          .otherwise($"ml" * $"mr").as("n"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getString(2)), r.getLong(3))).toSet

  // --- inner join --------------------------------------------------------

  test("inner: interleaved signed batches equal the one-shot join over nets") {
    val st = IncrementalJoin.stores(spark, tmpDir("sdelta"))
    val l1 = sl((1L, "a", 2L), (2L, "b", 1L), (3L, "c", 1L))
    val r1 = sr((1L, "x", 1L), (2L, "y", 3L))
    val l2 = sl((1L, "a", -1L), (3L, "c", -1L), (4L, "d", 1L)) // deletes + insert
    val r2 = sr((2L, "y", -2L), (4L, "w", 1L))
    IncrementalJoin.appendLeftDelta(st, l1, Seq("k"), 0L)
    IncrementalJoin.appendRightDelta(st, r1, Seq("k"), 10L)
    IncrementalJoin.appendLeftDelta(st, l2, Seq("k"), 1L)
    IncrementalJoin.appendRightDelta(st, r2, Seq("k"), 11L)
    assert(innerSet(st) == innerOneShot(Seq(l1, l2), Seq(r1, r2)))
  }

  test("inner: a fully-deleted key vanishes from the output") {
    val st = IncrementalJoin.stores(spark, tmpDir("sdelta"))
    IncrementalJoin.appendLeftDelta(st, sl((1L, "a", 1L), (2L, "b", 1L)), Seq("k"), 0L)
    IncrementalJoin.appendRightDelta(st, sr((1L, "x", 1L), (2L, "y", 1L)), Seq("k"), 10L)
    IncrementalJoin.appendLeftDelta(st, sl((1L, "a", -1L)), Seq("k"), 1L)
    assert(innerSet(st) == Set((2L, "b", "y", 1L)))
  }

  test("inner: an update is a −old/+new pair in ONE batch") {
    val st = IncrementalJoin.stores(spark, tmpDir("sdelta"))
    IncrementalJoin.appendLeftDelta(st, sl((1L, "old", 1L)), Seq("k"), 0L)
    IncrementalJoin.appendRightDelta(st, sr((1L, "x", 1L)), Seq("k"), 10L)
    IncrementalJoin.appendLeftDelta(st, sl((1L, "old", -1L), (1L, "new", 1L)),
      Seq("k"), 1L)
    assert(innerSet(st) == Set((1L, "new", "x", 1L)))
  }

  test("inner: signed replays are no-ops; compaction is result-invariant") {
    val st = IncrementalJoin.stores(spark, tmpDir("sdelta"))
    val l1 = sl((1L, "a", 2L), (2L, "b", 1L))
    val r1 = sr((1L, "x", 1L), (2L, "y", 1L))
    val l2 = sl((1L, "a", -1L))
    IncrementalJoin.appendLeftDelta(st, l1, Seq("k"), 0L)
    IncrementalJoin.appendRightDelta(st, r1, Seq("k"), 10L)
    IncrementalJoin.appendLeftDelta(st, l2, Seq("k"), 1L)
    val before = innerSet(st)
    IncrementalJoin.appendLeftDelta(st, l2, Seq("k"), 1L) // replay
    assert(innerSet(st) == before)
    IncrementalJoin.compactOut(st)
    IncrementalJoin.compactSides(st, Seq("k"))
    assert(innerSet(st) == before)
    IncrementalJoin.appendLeftDelta(st, l2, Seq("k"), 1L) // post-compaction replay
    assert(innerSet(st) == before)
    assert(before == innerOneShot(Seq(l1, l2), Seq(r1)))
  }

  test("inner: REAL (non-replay) signed batches land after compactSides") {
    // the r7 regression shipped exactly here: appendToTable partitioned
    // the side tables by __bg while compactSides staged without the
    // partition spec, so the FIRST real append after a compaction threw
    // AnalysisException — every existing post-compaction append was a
    // replay no-op and never exercised the write path
    val st = IncrementalJoin.stores(spark, tmpDir("sdelta"))
    val l1 = sl((1L, "a", 2L), (2L, "b", 1L))
    val r1 = sr((1L, "x", 1L), (2L, "y", 1L))
    IncrementalJoin.appendLeftDelta(st, l1, Seq("k"), 0L)
    IncrementalJoin.appendRightDelta(st, r1, Seq("k"), 10L)
    IncrementalJoin.compactOut(st)
    IncrementalJoin.compactSides(st, Seq("k"))
    // fresh batch ids, fresh rows, BOTH sides, both signed and unsigned
    val l2 = sl((1L, "a", -1L), (3L, "c", 1L))
    val r2 = sr((3L, "z", 1L))
    IncrementalJoin.appendLeftDelta(st, l2, Seq("k"), 1L)
    IncrementalJoin.appendRightDelta(st, r2, Seq("k"), 11L)
    IncrementalJoin.appendLeft(st, Seq(2L -> "b2").toDF("k", "lv"), Seq("k"), 2L)
    assert(innerSet(st) == innerOneShot(
      Seq(l1, l2, sl((2L, "b2", 1L))), Seq(r1, r2)))
    // and again after a SECOND compaction (compact → append → compact → append)
    IncrementalJoin.compactOut(st)
    IncrementalJoin.compactSides(st, Seq("k"))
    IncrementalJoin.appendRightDelta(st, sr((2L, "y", -1L)), Seq("k"), 12L)
    assert(innerSet(st) == innerOneShot(
      Seq(l1, l2, sl((2L, "b2", 1L))), Seq(r1, r2, sr((2L, "y", -1L)))))
  }

  test("inner: over-retraction stays VISIBLE as a negative n, never clamped") {
    val st = IncrementalJoin.stores(spark, tmpDir("sdelta"))
    IncrementalJoin.appendLeftDelta(st, sl((1L, "a", 1L)), Seq("k"), 0L)
    IncrementalJoin.appendRightDelta(st, sr((1L, "x", 1L)), Seq("k"), 10L)
    IncrementalJoin.appendLeftDelta(st, sl((1L, "a", -3L)), Seq("k"), 1L)
    assert(innerSet(st) == Set((1L, "a", "x", -2L)))
  }

  test("compactions REFUSE while a batch is started-but-uncommitted") {
    val root = tmpDir("sdelta")
    val st = IncrementalJoin.stores(spark, root)
    IncrementalJoin.appendLeft(st, Seq((1L, "a")).toDF("k", "lv"), Seq("k"), 0L)
    IncrementalJoin.appendRight(st, Seq((1L, "x")).toDF("k", "rv"), Seq("k"), 10L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate a crash inside batch 1's write window
    assert(fs.delete(new org.apache.hadoop.fs.Path(root, "_applied/right.10.done"), false))
    intercept[IllegalArgumentException] { IncrementalJoin.compactOut(st) }
    intercept[IllegalArgumentException] { IncrementalJoin.compactSides(st, Seq("k")) }
    // retrying the batch to completion unblocks compaction
    IncrementalJoin.appendRight(st, Seq((1L, "x")).toDF("k", "rv"), Seq("k"), 10L)
    IncrementalJoin.compactOut(st)
    IncrementalJoin.compactSides(st, Seq("k"))
    assert(innerSet(st) == Set((1L, "a", "x", 1L)))
  }

  // --- left outer --------------------------------------------------------

  test("left outer: a right delete wave flips keys back to UNMATCHED (re-add)") {
    val st = IncrementalOuterJoin.stores(spark, tmpDir("sdelta"))
    val l1 = sl((1L, "a", 1L), (2L, "b", 2L))
    val r1 = sr((2L, "y", 1L))
    IncrementalOuterJoin.appendLeftDelta(st, l1, Seq("k"), 0L)
    IncrementalOuterJoin.appendRightDelta(st, r1, Seq("k"), 10L)
    assert(outerSet(st) ==
      Set((1L, "a", None, 1L), (2L, "b", Some("y"), 2L)))
    // delete the only right row for key 2: its left groups must become
    // unmatched AGAIN — the transition append-only inputs can never take
    val r2 = sr((2L, "y", -1L))
    IncrementalOuterJoin.appendRightDelta(st, r2, Seq("k"), 11L)
    assert(outerSet(st) == Set((1L, "a", None, 1L), (2L, "b", None, 2L)))
    assert(outerSet(st) == outerOneShot(Seq(l1), Seq(r1, r2)))
    // and a re-match retracts the re-added null rows once more
    val r3 = sr((2L, "z", 1L), (1L, "x", 1L))
    IncrementalOuterJoin.appendRightDelta(st, r3, Seq("k"), 12L)
    assert(outerSet(st) ==
      Set((1L, "a", Some("x"), 1L), (2L, "b", Some("z"), 2L)))
    assert(outerSet(st) == outerOneShot(Seq(l1), Seq(r1, r2, r3)))
  }

  test("left outer: left deletes shrink matched AND unmatched groups") {
    val st = IncrementalOuterJoin.stores(spark, tmpDir("sdelta"))
    val l1 = sl((1L, "a", 3L), (2L, "b", 2L))
    val r1 = sr((1L, "x", 1L))
    IncrementalOuterJoin.appendLeftDelta(st, l1, Seq("k"), 0L)
    IncrementalOuterJoin.appendRightDelta(st, r1, Seq("k"), 10L)
    val l2 = sl((1L, "a", -2L), (2L, "b", -1L)) // shrink both kinds
    IncrementalOuterJoin.appendLeftDelta(st, l2, Seq("k"), 1L)
    assert(outerSet(st) ==
      Set((1L, "a", Some("x"), 1L), (2L, "b", None, 1L)))
    assert(outerSet(st) == outerOneShot(Seq(l1, l2), Seq(r1)))
  }

  test("left outer: signed replays + compactions leave the result unchanged") {
    val st = IncrementalOuterJoin.stores(spark, tmpDir("sdelta"))
    val l1 = sl((1L, "a", 1L), (2L, "b", 1L), (3L, "c", 1L))
    val r1 = sr((1L, "x", 1L), (3L, "w", 2L))
    val r2 = sr((3L, "w", -2L), (2L, "y", 1L)) // full delete + new match
    IncrementalOuterJoin.appendLeftDelta(st, l1, Seq("k"), 0L)
    IncrementalOuterJoin.appendRightDelta(st, r1, Seq("k"), 10L)
    IncrementalOuterJoin.appendRightDelta(st, r2, Seq("k"), 11L)
    val before = outerSet(st)
    assert(before == outerOneShot(Seq(l1), Seq(r1, r2)))
    IncrementalOuterJoin.appendRightDelta(st, r2, Seq("k"), 11L) // replay
    assert(outerSet(st) == before)
    IncrementalJoin.compactOut(st.inner)
    IncrementalJoin.compactSides(st.inner, Seq("k"))
    IncrementalOuterJoin.compactUn(st)
    assert(outerSet(st) == before)
    IncrementalOuterJoin.appendRightDelta(st, r2, Seq("k"), 11L) // stale replay
    assert(outerSet(st) == before)
  }

  test("left outer: append-only calls DELEGATE to netting once signed") {
    val st = IncrementalOuterJoin.stores(spark, tmpDir("sdelta"))
    IncrementalOuterJoin.appendLeft(st, Seq((1L, "a"), (2L, "b")).toDF("k", "lv"),
      Seq("k"), 0L)
    IncrementalOuterJoin.appendRight(st, sr((1L, "x", 1L)).drop("__delta"),
      Seq("k"), 10L)
    // signed wave fully deletes right key 1 …
    IncrementalOuterJoin.appendRightDelta(st, sr((1L, "x", -1L)), Seq("k"), 11L)
    // … then an APPEND-ONLY right batch arrives for key 1. Under the old
    // fast path the physically-present (net-0) state rows would mask the
    // unmatched→matched transition; the signed marker must route this
    // through the netting path so key 1's null row is retracted.
    IncrementalOuterJoin.appendRight(st, Seq((1L, "z")).toDF("k", "rv"),
      Seq("k"), 12L)
    assert(outerSet(st) ==
      Set((1L, "a", Some("z"), 1L), (2L, "b", None, 1L)))
  }

  test("left outer: over-retraction is refused loudly, before any write") {
    val st = IncrementalOuterJoin.stores(spark, tmpDir("sdelta"))
    IncrementalOuterJoin.appendLeftDelta(st, sl((1L, "a", 1L)), Seq("k"), 0L)
    IncrementalOuterJoin.appendRightDelta(st, sr((1L, "x", 1L)), Seq("k"), 10L)
    val before = outerSet(st)
    intercept[IllegalArgumentException] {
      IncrementalOuterJoin.appendRightDelta(st, sr((1L, "x", -5L)), Seq("k"), 11L)
    }
    // the refused batch must not have committed anything; a corrected
    // retry under the SAME id then applies exactly once
    IncrementalOuterJoin.appendRightDelta(st, sr((1L, "x", -1L)), Seq("k"), 11L)
    assert(outerSet(st) == Set((1L, "a", None, 1L)))
    assert(before == Set((1L, "a", Some("x"), 1L)))
  }

  // --- full outer --------------------------------------------------------

  test("full outer: delete waves drive BOTH unmatched directions") {
    val st = IncrementalFullOuterJoin.stores(spark, tmpDir("sdelta"))
    val l1 = sl((1L, "a", 1L), (2L, "b", 1L))
    val r1 = sr((1L, "x", 1L), (3L, "y", 1L))
    IncrementalFullOuterJoin.appendLeftDelta(st, l1, Seq("k"), 0L)
    IncrementalFullOuterJoin.appendRightDelta(st, r1, Seq("k"), 10L)
    assert(fullSet(st) == fullOneShot(Seq(l1), Seq(r1)))
    // delete left 1 (its right rows become unmatched-right) and right 3
    // (its unmatched-right row vanishes)
    val l2 = sl((1L, "a", -1L))
    val r2 = sr((3L, "y", -1L))
    IncrementalFullOuterJoin.appendLeftDelta(st, l2, Seq("k"), 1L)
    IncrementalFullOuterJoin.appendRightDelta(st, r2, Seq("k"), 11L)
    assert(fullSet(st) ==
      Set((2L, Some("b"), None, 1L), (1L, None, Some("x"), 1L)))
    assert(fullSet(st) == fullOneShot(Seq(l1, l2), Seq(r1, r2)))
    // re-insert left 1: the unmatched-right row retracts again
    val l3 = sl((1L, "c", 2L))
    IncrementalFullOuterJoin.appendLeftDelta(st, l3, Seq("k"), 2L)
    assert(fullSet(st) ==
      Set((2L, Some("b"), None, 1L), (1L, Some("c"), Some("x"), 2L)))
    assert(fullSet(st) == fullOneShot(Seq(l1, l2, l3), Seq(r1, r2)))
  }

  test("full outer: signed replays (incl. cross-side id collision) + compaction") {
    val st = IncrementalFullOuterJoin.stores(spark, tmpDir("sdelta"))
    val l1 = sl((1L, "a", 1L), (2L, "b", 1L))
    val r1 = sr((2L, "y", 1L), (3L, "z", 1L))
    // SAME numeric batch id on both sides — the __tside dedup qualifier
    IncrementalFullOuterJoin.appendLeftDelta(st, l1, Seq("k"), 7L)
    IncrementalFullOuterJoin.appendRightDelta(st, r1, Seq("k"), 7L)
    val d1 = sr((2L, "y", -1L))
    IncrementalFullOuterJoin.appendRightDelta(st, d1, Seq("k"), 8L)
    val before = fullSet(st)
    assert(before == fullOneShot(Seq(l1), Seq(r1, d1)))
    IncrementalFullOuterJoin.appendRightDelta(st, d1, Seq("k"), 8L) // replay
    IncrementalFullOuterJoin.appendLeftDelta(st, l1, Seq("k"), 7L)  // replay
    assert(fullSet(st) == before)
    IncrementalJoin.compactOut(st.inner)
    IncrementalJoin.compactSides(st.inner, Seq("k"))
    IncrementalFullOuterJoin.compactUn(st)
    assert(fullSet(st) == before)
    IncrementalFullOuterJoin.appendRightDelta(st, d1, Seq("k"), 8L) // stale
    assert(fullSet(st) == before)
  }

  // --- aggregate ---------------------------------------------------------

  test("agg: signed batches net counts and sums; net-0 keys vanish") {
    val store = new AppendOnlyStore(spark, tmpDir("sdelta"),
      prefixCol = "__agg_key", prefixChars = 1)
    val spec = IncrementalAgg.Spec(Seq("g"), Seq("v"))
    def b(rows: (String, Long, Long)*): DataFrame = rows.toDF("g", "v", "__delta")
    IncrementalAgg.appendDelta(store, b(("a", 10L, 1L), ("a", 5L, 1L),
      ("b", 7L, 1L)), spec, 0L)
    IncrementalAgg.appendDelta(store, b(("a", 10L, -1L), ("b", 7L, -1L),
      ("c", 2L, 1L)), spec, 1L)
    val out = IncrementalAgg.current(store, spec)
      .select($"g", $"n_rows", $"sum_v", $"cnt_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // a: 5 remains; b: fully deleted → gone; c: 2
    assert(out == Set(("a", 1L, 5L, 1L), ("c", 1L, 2L, 1L)))
  }

  test("agg: signed + unsigned batches interleave; replay + compact invariant") {
    val store = new AppendOnlyStore(spark, tmpDir("sdelta"),
      prefixCol = "__agg_key", prefixChars = 1)
    val spec = IncrementalAgg.Spec(Seq("g"), Seq("v"))
    IncrementalAgg.appendBatch(store,
      Seq(("a", 10L), ("a", 20L), ("b", 1L)).toDF("g", "v"), spec, 0L)
    val d = Seq(("a", 10L, -1L), ("b", 4L, 2L)).toDF("g", "v", "__delta")
    IncrementalAgg.appendDelta(store, d, spec, 1L)
    def snap() = IncrementalAgg.current(store, spec)
      .select($"g", $"n_rows", $"sum_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val before = snap()
    assert(before == Set(("a", 1L, 20L), ("b", 3L, 9L)))
    IncrementalAgg.appendDelta(store, d, spec, 1L) // replay
    assert(snap() == before)
    IncrementalAgg.compact(store, spec)
    assert(snap() == before)
  }

  test("agg: min/max specs are refused for signed batches") {
    val store = new AppendOnlyStore(spark, tmpDir("sdelta"),
      prefixCol = "__agg_key", prefixChars = 1)
    val spec = IncrementalAgg.Spec(Seq("g"), Seq("v"), minCols = Seq("v"))
    intercept[IllegalArgumentException] {
      IncrementalAgg.appendDelta(store,
        Seq(("a", 1L, 1L)).toDF("g", "v", "__delta"), spec, 0L)
    }
  }

  test("agg: null measure values count toward n_rows but never cnt_v") {
    val store = new AppendOnlyStore(spark, tmpDir("sdelta"),
      prefixCol = "__agg_key", prefixChars = 1)
    val spec = IncrementalAgg.Spec(Seq("g"), Seq("v"))
    IncrementalAgg.appendDelta(store,
      Seq(("a", Some(3L), 1L), ("a", None, 1L), ("a", None, 1L))
        .toDF("g", "v", "__delta"), spec, 0L)
    IncrementalAgg.appendDelta(store,
      Seq(("a", Option.empty[Long], -1L)).toDF("g", "v", "__delta"), spec, 1L)
    val out = IncrementalAgg.current(store, spec)
      .select($"g", $"n_rows", $"sum_v", $"cnt_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out == Set(("a", 2L, 3L, 1L)))
  }
}
