package graft

import org.apache.spark.sql.functions._

import graft.ops.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  lazy val quotes = Seq(
    (1, 10L, 100.0), (1, 20L, 110.0), (1, 30L, 120.0),
    (2, 15L, 50.0))
    .toDF("k", "q_ts", "px")

  lazy val trades = Seq(
    (1, 5L, "t1"),   // before any quote → null
    (1, 10L, "t2"),  // exactly at quote ts → inclusive match 100
    (1, 25L, "t3"),  // between → 110
    (1, 99L, "t4"),  // after all → 120
    (2, 16L, "t5"),  // → 50
    (3, 10L, "t6"))  // keyless → null
    .toDF("k", "ts", "tag")

  test("as-of join picks latest right row at-or-before each left ts") {
    val got = TemporalJoins.asOfJoin(trades, quotes, Seq("k"), "ts", "q_ts",
        valueCols = Seq("px"))
      .select($"tag", $"asof_px").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map("t1" -> None, "t2" -> Some(100.0), "t3" -> Some(110.0),
      "t4" -> Some(120.0), "t5" -> Some(50.0), "t6" -> None))
  }

  test("as-of join tolerance voids stale matches") {
    val got = TemporalJoins.asOfJoin(trades, quotes, Seq("k"), "ts", "q_ts",
        valueCols = Seq("px"), tolerance = Some(10L))
      .select($"tag", $"asof_px").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got("t4") == None) // 99 - 30 > 10 → too stale
    assert(got("t3") == Some(110.0)) // 25 - 20 <= 10
  }

  test("range join equals the naive inequality join, no duplicate pairs") {
    val points = (1 to 300).map(i => (i % 5, i.toLong, i.toDouble)).toDF("k", "pid", "p")
    val intervals = (1 to 60).map(i =>
      (i % 5, i.toLong, i * 4.0, i * 4.0 + 37.0)).toDF("k", "iid", "lo", "hi")
    val got = TemporalJoins.rangeJoin(points, "p", intervals, "lo", "hi",
        Seq("k"), bucketWidth = 20.0)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = points.as("p").join(intervals.as("i"),
        $"p.k" === $"i.k" && $"p.p" >= $"i.lo" && $"p.p" <= $"i.hi")
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "duplicates from bucket explode")
    assert(got.toSet == naive.toSet)
    assert(got.nonEmpty)
  }

  test("interval-overlap join equals the naive join at any bucket width, no dup pairs") {
    // nested, disjoint, shared-endpoint, and spanning intervals mixed:
    // pair (a,b) overlaps iff aS <= bE && bS <= aE (inclusive ends)
    val rnd = new scala.util.Random(31)
    val a = (1 to 120).map { i =>
      val s = rnd.nextInt(400).toLong
      (i % 3, i.toLong, s, s + 1 + rnd.nextInt(60).toLong)
    }.toDF("k", "aid", "s1", "e1")
    val b = (1 to 150).map { i =>
      val s = rnd.nextInt(400).toLong
      (i % 3, 1000L + i, s, s + 1 + rnd.nextInt(25).toLong)
    }.toDF("k", "bid", "s2", "e2")
    val naive = a.as("a").join(b.as("b"),
        $"a.k" === $"b.k" && $"s1" <= $"e2" && $"s2" <= $"e1")
      .select($"aid", $"bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    // width smaller than, comparable to, and larger than interval spans:
    // the dedup-to-max(start)-bucket rule must hold for all of them
    Seq(7.0, 30.0, 500.0).foreach { w =>
      val got = TemporalJoins.intervalOverlapJoin(a, "s1", "e1",
          b, "s2", "e2", Seq("k"), bucketWidth = w)
        .select($"aid", $"bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == got.distinct.length,
        s"width $w: duplicates from the two-sided explode")
      assert(got.toSet == naive.toSet, s"width $w: pair set diverged")
    }
  }
}
