package graft

import graft.ops.{IncrementalFullOuterJoin, IncrementalJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Symmetric signed-multiset FULL OUTER IVM vs the one-shot full join. */
class IncrementalFullOuterJoinSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf(rows: (Long, String)*): DataFrame = rows.toDF("k", "lv")
  private def rightDf(rows: (Long, String)*): DataFrame = rows.toDF("k", "rv")

  private def multiset(df: DataFrame): Set[(Long, Option[String], Option[String], Long)] =
    df.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      Option(r.getString(2)), r.getLong(3))).toSet

  private def currentSet(st: IncrementalFullOuterJoin.Stores) =
    multiset(IncrementalFullOuterJoin.current(st).select($"k", $"lv", $"rv", $"n"))

  private def oneShot(l: DataFrame, r: DataFrame) =
    multiset(l.join(r, Seq("k"), "full")
      .groupBy($"k", $"lv", $"rv").agg(count(lit(1)).as("n"))
      .select($"k", $"lv", $"rv", $"n"))

  test("both directions null-extend; late matches retract on both sides") {
    val st = IncrementalFullOuterJoin.stores(spark, tmpDir("fjoin"))
    IncrementalFullOuterJoin.appendLeft(st, leftDf(1L -> "a", 2L -> "b"), Seq("k"), 0L)
    IncrementalFullOuterJoin.appendRight(st, rightDf(1L -> "x", 3L -> "y"), Seq("k"), 10L)
    assert(currentSet(st) == Set(
      (1L, Some("a"), Some("x"), 1L),
      (2L, Some("b"), None, 1L),
      (3L, None, Some("y"), 1L)))
    // late left match for key 3 retracts the right-null row; late right
    // match for key 2 retracts the left-null row
    IncrementalFullOuterJoin.appendLeft(st, leftDf(3L -> "c"), Seq("k"), 1L)
    IncrementalFullOuterJoin.appendRight(st, rightDf(2L -> "z"), Seq("k"), 11L)
    assert(currentSet(st) == Set(
      (1L, Some("a"), Some("x"), 1L),
      (2L, Some("b"), Some("z"), 1L),
      (3L, Some("c"), Some("y"), 1L)))
  }

  test("interleaved appends equal the one-shot full join (with duplicates)") {
    val st = IncrementalFullOuterJoin.stores(spark, tmpDir("fjoin"))
    val l1 = leftDf(1L -> "a", 1L -> "a", 5L -> "e")
    val r1 = rightDf(1L -> "x", 7L -> "g")
    val l2 = leftDf(7L -> "h", 2L -> "b")
    val r2 = rightDf(5L -> "w", 9L -> "q")
    IncrementalFullOuterJoin.appendLeft(st, l1, Seq("k"), 0L)
    IncrementalFullOuterJoin.appendRight(st, r1, Seq("k"), 10L)
    IncrementalFullOuterJoin.appendLeft(st, l2, Seq("k"), 1L)
    IncrementalFullOuterJoin.appendRight(st, r2, Seq("k"), 11L)
    assert(currentSet(st) ==
      oneShot(l1.unionByName(l2), r1.unionByName(r2)))
  }

  test("replays are no-ops even when batch ids collide ACROSS sides") {
    val st = IncrementalFullOuterJoin.stores(spark, tmpDir("fjoin"))
    val l = leftDf(1L -> "a", 2L -> "b")
    val r = rightDf(2L -> "y", 3L -> "z")
    // SAME numeric id on both sides: the un-store dedup identity must
    // still separate a + row (v, 1, 1) from a - retraction (v, 1, 1)
    // triggered by the other side's batch 1 — the sign qualifies it
    IncrementalFullOuterJoin.appendLeft(st, l, Seq("k"), 1L)
    IncrementalFullOuterJoin.appendRight(st, r, Seq("k"), 1L)
    assert(currentSet(st) == oneShot(l, r))
    IncrementalFullOuterJoin.appendLeft(st, l, Seq("k"), 1L)  // replay
    IncrementalFullOuterJoin.appendRight(st, r, Seq("k"), 1L) // replay
    assert(currentSet(st) == oneShot(l, r))
  }

  test("compactions are result-invariant; appends continue") {
    val st = IncrementalFullOuterJoin.stores(spark, tmpDir("fjoin"))
    val ls = (0 until 3).map(i => leftDf((1L to 5L).map(k => k -> s"l$i"): _*))
    val rs = (0 until 3).map(i => rightDf((3L to 8L).map(k => k -> s"r$i"): _*))
    ls.zipWithIndex.foreach { case (b, i) =>
      IncrementalFullOuterJoin.appendLeft(st, b, Seq("k"), i.toLong)
      IncrementalFullOuterJoin.appendRight(st, rs(i), Seq("k"), 100L + i)
    }
    val before = currentSet(st)
    IncrementalJoin.compactOut(st.inner)
    IncrementalJoin.compactSides(st.inner, Seq("k"))
    IncrementalFullOuterJoin.compactUn(st)
    assert(currentSet(st) == before)
    val l4 = leftDf(8L -> "late-match", 20L -> "late-unmatched")
    IncrementalFullOuterJoin.appendLeft(st, l4, Seq("k"), 50L)
    assert(currentSet(st) ==
      oneShot(ls.reduce(_ unionByName _).unionByName(l4),
        rs.reduce(_ unionByName _)))
  }
}
