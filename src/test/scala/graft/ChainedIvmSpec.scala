package graft

import graft.ops.{ChainedIvm, IncrementalAgg, IncrementalJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chained IVM (join Δ-output → maintained aggregate) vs the one-shot
  * `GROUP BY` over the one-shot join, under interleavings, duplicates,
  * signed delete waves, crash replays, and whole-chain compactions. */
class ChainedIvmSpec extends SparkSpec {
  import spark.implicits._

  private def chain() = ChainedIvm.stores(spark, tmpDir("chain"),
    Seq("k"), IncrementalAgg.Spec(Seq("grp"), Seq("v")))

  private def leftDf(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("k", "grp", "v")
  private def rightDf(rows: (Long, String)*): DataFrame =
    rows.toDF("k", "rv")

  private def aggSet(c: ChainedIvm.Stores) =
    ChainedIvm.currentAgg(c).select($"grp", $"n_rows", $"sum_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def oneShot(l: DataFrame, r: DataFrame) =
    l.join(r, Seq("k"))
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r0 => (r0.getString(0), r0.getLong(1), r0.getLong(2)))
      .toSet

  test("interleaved appends on both sides: chained agg equals one-shot GROUP BY") {
    val c = chain()
    val l1 = leftDf((1L, "a", 10L), (2L, "b", 20L), (2L, "b", 20L))
    val r1 = rightDf(1L -> "x", 3L -> "y")
    val l2 = leftDf((3L, "a", 30L), (1L, "b", 40L))
    val r2 = rightDf(2L -> "z", 1L -> "w")
    ChainedIvm.appendLeft(c, l1, 0L)
    ChainedIvm.appendRight(c, r1, 10L)
    ChainedIvm.appendLeft(c, l2, 1L)
    ChainedIvm.appendRight(c, r2, 11L)
    assert(aggSet(c) == oneShot(l1.unionByName(l2), r1.unionByName(r2)))
    // multiplicities are real: k=1 matches TWO right rows after r2
    assert(aggSet(c).exists(_._2 > 2))
  }

  test("a delete wave flows join → agg: retracted rows leave the aggregate") {
    val c = chain()
    val l1 = leftDf((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
    val r1 = rightDf(1L -> "x", 2L -> "y", 3L -> "z")
    ChainedIvm.appendLeft(c, l1, 0L)
    ChainedIvm.appendRight(c, r1, 10L)
    assert(aggSet(c) == Set(("a", 2L, 30L), ("b", 1L, 30L)))
    // takedown: delete (2, a, 20) — group a shrinks; delete (3, b, 30)
    // — group b nets to zero rows and VANISHES from the aggregate
    ChainedIvm.appendLeftDelta(c,
      Seq((2L, "a", 20L, -1L), (3L, "b", 30L, -1L))
        .toDF("k", "grp", "v", "__delta"), 1L)
    assert(aggSet(c) == Set(("a", 1L, 10L)))
    // a right-side delete retracts every pair it had matched
    ChainedIvm.appendRightDelta(c,
      Seq((1L, "x", -1L)).toDF("k", "rv", "__delta"), 11L)
    assert(aggSet(c) == Set.empty)
  }

  test("replays are chain-wide no-ops; compactions are result-invariant") {
    val c = chain()
    val l1 = leftDf((1L, "a", 10L), (2L, "b", 20L))
    val r1 = rightDf(1L -> "x", 2L -> "y")
    val l2 = leftDf((1L, "a", 5L))
    ChainedIvm.appendLeft(c, l1, 0L)
    ChainedIvm.appendRight(c, r1, 10L)
    ChainedIvm.appendLeft(c, l2, 1L)
    val want = aggSet(c)
    // committed replays: the join manifest stops them BEFORE the tap,
    // so the downstream aggregate sees nothing either
    ChainedIvm.appendLeft(c, l2, 1L)
    ChainedIvm.appendRight(c, r1, 10L)
    assert(aggSet(c) == want)
    ChainedIvm.compact(c)
    assert(aggSet(c) == want)
    // post-compaction REAL batch still flows end-to-end...
    ChainedIvm.appendRight(c, rightDf(2L -> "y2"), 12L)
    assert(aggSet(c) ==
      oneShot(l1.unionByName(l2), r1.unionByName(rightDf(2L -> "y2"))))
    // ...and a replay of a PRE-compaction batch stays a no-op
    val after = aggSet(c)
    ChainedIvm.appendLeft(c, l1, 0L)
    assert(aggSet(c) == after)
  }

  test("a crash between out-append and done-marker re-taps idempotently") {
    val c = chain()
    ChainedIvm.appendLeft(c, leftDf((1L, "a", 10L)), 0L)
    ChainedIvm.appendRight(c, rightDf(1L -> "x"), 10L)
    ChainedIvm.appendLeft(c, leftDf((1L, "a", 7L)), 1L)
    val want = aggSet(c)
    // simulate the crash window: batch 1 committed everything but its
    // done-marker; the retry re-runs the full append INCLUDING the tap
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(
      c.join.root, "_applied/left.1.done"), false))
    ChainedIvm.appendLeft(c, leftDf((1L, "a", 7L)), 1L)
    // identical re-tapped partials dedup inside the agg store; the
    // join side dedups via its dirty flag — the chain agrees end-to-end
    assert(aggSet(c) == want)
    assert(aggSet(c) == Set(("a", 2L, 17L)))
  }

  test("extrema sink: min/max/median of the join maintained through waves") {
    import graft.ops.MinMaxAgg
    val c = ChainedIvm.stores(spark, tmpDir("chainex"), Seq("k"),
      IncrementalAgg.Spec(Seq("grp"), Seq("v")),
      extremaSpec = Some(MinMaxAgg.Spec(Seq("grp"), "v")))
    val l1 = leftDf((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 7L))
    val r1 = rightDf(1L -> "x", 2L -> "y", 3L -> "z", 4L -> "w")
    ChainedIvm.appendLeft(c, l1, 0L)
    ChainedIvm.appendRight(c, r1, 10L)
    def ex() = ChainedIvm.currentExtrema(c)
      .select($"grp", $"n_rows", $"min_v", $"max_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    def med() = ChainedIvm.quantiles(c, Seq(0.5))
      .select($"grp", $"p50").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(ex() == Set(("a", 3L, 10L, 30L), ("b", 1L, 7L, 7L)))
    assert(med() == Set("a" -> 20L, "b" -> 7L))
    // delete the max of a AND all of b: extrema shrink, b vanishes
    ChainedIvm.appendLeftDelta(c,
      Seq((3L, "a", 30L, -1L), (4L, "b", 7L, -1L))
        .toDF("k", "grp", "v", "__delta"), 1L)
    assert(ex() == Set(("a", 2L, 10L, 20L)))
    assert(med() == Set("a" -> 10L))
    // replay + whole-chain compaction: invariant
    ChainedIvm.appendLeftDelta(c,
      Seq((3L, "a", 30L, -1L), (4L, "b", 7L, -1L))
        .toDF("k", "grp", "v", "__delta"), 1L)
    ChainedIvm.compact(c)
    assert(ex() == Set(("a", 2L, 10L, 20L)))
    // a RIGHT-side append doubles a key's multiplicity: the median
    // weighting must see it (k=2 now matches two right rows)
    ChainedIvm.appendRight(c, rightDf(2L -> "y2"), 11L)
    // multiset for a: {10, 20, 20} → median 20
    assert(ex() == Set(("a", 3L, 10L, 20L)))
    assert(med() == Set("a" -> 20L))
  }

  test("a chain without extremaSpec refuses extrema reads") {
    val c = chain()
    intercept[IllegalStateException] { ChainedIvm.currentExtrema(c) }
  }

  test("the aggregate read never touches join state or raw inputs") {
    val c = chain()
    ChainedIvm.appendLeft(c, leftDf((1L, "a", 10L)), 0L)
    ChainedIvm.appendRight(c, rightDf(1L -> "x"), 10L)
    val plan = ChainedIvm.currentAgg(c).queryExecution.optimizedPlan
    val scanned = plan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString).toSeq
          case _ => Seq.empty[String]
        }
    }.flatten
    assert(scanned.nonEmpty)
    scanned.foreach(p => assert(p.contains("/agg"),
      s"chained agg read must scan ONLY the agg store, saw $p"))
  }
}
