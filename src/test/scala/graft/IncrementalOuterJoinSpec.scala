package graft

import graft.ops.{IncrementalJoin, IncrementalOuterJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Append-only LEFT OUTER IVM vs the one-shot left join: null-extension,
  * retraction on late match, signed multiplicities, replays, compaction. */
class IncrementalOuterJoinSpec extends SparkSpec {
  import spark.implicits._

  private def leftDf(rows: (Long, String)*): DataFrame = rows.toDF("k", "lv")
  private def rightDf(rows: (Long, String)*): DataFrame = rows.toDF("k", "rv")
  private val emptyRight: DataFrame = Seq.empty[(Long, String)].toDF("k", "rv")

  private def multiset(df: DataFrame): Set[(Long, String, Option[String], Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1),
      Option(r.getString(2)), r.getLong(3))).toSet

  private def currentSet(st: IncrementalOuterJoin.Stores) =
    multiset(IncrementalOuterJoin.current(st).select($"k", $"lv", $"rv", $"n"))

  private def oneShot(l: DataFrame, r: DataFrame) =
    multiset(l.join(r, Seq("k"), "left")
      .groupBy($"k", $"lv", $"rv").agg(count(lit(1)).as("n"))
      .select($"k", $"lv", $"rv", $"n"))

  test("unmatched left rows carry nulls; a late right match retracts them") {
    val st = IncrementalOuterJoin.stores(spark, tmpDir("ojoin"))
    IncrementalOuterJoin.appendLeft(st, leftDf(1L -> "a", 2L -> "b"), Seq("k"), 0L)
    IncrementalOuterJoin.appendRight(st, rightDf(1L -> "x"), Seq("k"), 10L)
    assert(currentSet(st) ==
      Set((1L, "a", Some("x"), 1L), (2L, "b", None, 1L)))
    // the late match must retract the null row, not duplicate key 2
    IncrementalOuterJoin.appendRight(st, rightDf(2L -> "y", 3L -> "z"), Seq("k"), 11L)
    assert(currentSet(st) ==
      Set((1L, "a", Some("x"), 1L), (2L, "b", Some("y"), 1L)))
  }

  test("signed multiplicities: duplicate unmatched rows net exactly") {
    val st = IncrementalOuterJoin.stores(spark, tmpDir("ojoin"))
    IncrementalOuterJoin.appendLeft(st, leftDf(1L -> "a", 1L -> "a", 1L -> "a"),
      Seq("k"), 0L)
    // an EMPTY right batch establishes the right schema without matching
    IncrementalOuterJoin.appendRight(st, emptyRight, Seq("k"), 10L)
    assert(currentSet(st) == Set((1L, "a", None, 3L)))
    IncrementalOuterJoin.appendRight(st, rightDf(1L -> "x", 1L -> "x"), Seq("k"), 11L)
    assert(currentSet(st) == Set((1L, "a", Some("x"), 6L)))
  }

  test("interleaved appends on both sides equal the one-shot left join") {
    val st = IncrementalOuterJoin.stores(spark, tmpDir("ojoin"))
    val l1 = leftDf(1L -> "a", 2L -> "b", 5L -> "e")
    val r1 = rightDf(1L -> "x", 3L -> "y")
    val l2 = leftDf(3L -> "c", 1L -> "d", 6L -> "f")
    val r2 = rightDf(2L -> "z", 1L -> "w")
    IncrementalOuterJoin.appendLeft(st, l1, Seq("k"), 0L)
    IncrementalOuterJoin.appendRight(st, r1, Seq("k"), 10L)
    IncrementalOuterJoin.appendLeft(st, l2, Seq("k"), 1L)
    IncrementalOuterJoin.appendRight(st, r2, Seq("k"), 11L)
    assert(currentSet(st) ==
      oneShot(l1.unionByName(l2), r1.unionByName(r2)))
  }

  test("crash-replayed batches on either side change nothing") {
    val st = IncrementalOuterJoin.stores(spark, tmpDir("ojoin"))
    val l = leftDf(1L -> "a", 2L -> "b")
    val r = rightDf(1L -> "x")
    IncrementalOuterJoin.appendLeft(st, l, Seq("k"), 0L)
    IncrementalOuterJoin.appendRight(st, r, Seq("k"), 10L)
    val before = currentSet(st)
    IncrementalOuterJoin.appendRight(st, r, Seq("k"), 10L) // replay
    IncrementalOuterJoin.appendLeft(st, l, Seq("k"), 0L)   // replay
    assert(currentSet(st) == before)
    assert(before == oneShot(l, r))
  }

  test("right-only keys never produce output rows") {
    val st = IncrementalOuterJoin.stores(spark, tmpDir("ojoin"))
    IncrementalOuterJoin.appendLeft(st, leftDf(1L -> "a"), Seq("k"), 0L)
    IncrementalOuterJoin.appendRight(st, rightDf(1L -> "x", 9L -> "ghost"),
      Seq("k"), 10L)
    assert(currentSet(st) == Set((1L, "a", Some("x"), 1L)))
  }

  test("compactions (out, sides, un) are result-invariant; appends continue") {
    val st = IncrementalOuterJoin.stores(spark, tmpDir("ojoin"))
    val ls = (0 until 3).map(i =>
      leftDf((1L to 6L).map(k => k -> s"l$i"): _*))
    val rs = (0 until 3).map(i =>
      rightDf((1L to 4L).map(k => k -> s"r$i"): _*)) // keys 5,6 stay unmatched
    ls.zipWithIndex.foreach { case (b, i) =>
      IncrementalOuterJoin.appendLeft(st, b, Seq("k"), i.toLong)
      IncrementalOuterJoin.appendRight(st, rs(i), Seq("k"), 100L + i)
    }
    val before = currentSet(st)
    IncrementalJoin.compactOut(st.inner)
    IncrementalJoin.compactSides(st.inner, Seq("k"))
    IncrementalOuterJoin.compactUn(st)
    assert(currentSet(st) == before)
    val l4 = leftDf(9L -> "late-unmatched", 1L -> "late-matched")
    IncrementalOuterJoin.appendLeft(st, l4, Seq("k"), 50L)
    assert(currentSet(st) ==
      oneShot(ls.reduce(_ unionByName _).unionByName(l4),
        rs.reduce(_ unionByName _)))
  }
}
