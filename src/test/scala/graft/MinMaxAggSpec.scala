package graft

import graft.ops.MinMaxAgg
import graft.sinks.AppendOnlyStore
import org.apache.spark.sql.DataFrame

/** Retractable min/max via the value-multiset store, vs one-shot
  * aggregates over the net inputs — the runner-up surfacing case
  * subtractable-aggregate IVM cannot do. */
class MinMaxAggSpec extends SparkSpec {
  import spark.implicits._

  private val spec = MinMaxAgg.Spec(Seq("k"), "v")
  private def store() = new AppendOnlyStore(spark, tmpDir("minmax"),
    prefixCol = "__agg_key", prefixChars = 1)

  private def df(rows: (String, java.lang.Long)*): DataFrame =
    rows.toDF("k", "v")
  private def sdf(rows: (String, Long, Long)*): DataFrame =
    rows.toDF("k", "v", "__delta")

  private def cur(st: AppendOnlyStore) =
    MinMaxAgg.current(st, spec).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("deleting every copy of the minimum surfaces the runner-up") {
    val st = store()
    MinMaxAgg.appendBatch(st, df("a" -> 1L, "a" -> 1L, "a" -> 5L,
      "a" -> 9L, "b" -> 3L), spec, 0L)
    assert(cur(st) == Set(("a", 4L, 3L, 1L, 9L), ("b", 1L, 1L, 3L, 3L)))
    // one copy of the min gone: min UNCHANGED (a copy remains)
    MinMaxAgg.appendDelta(st, sdf(("a", 1L, -1L)), spec, 1L)
    assert(cur(st) == Set(("a", 3L, 3L, 1L, 9L), ("b", 1L, 1L, 3L, 3L)))
    // last copy gone: the runner-up 5 surfaces as the new min
    MinMaxAgg.appendDelta(st, sdf(("a", 1L, -1L)), spec, 2L)
    assert(cur(st) == Set(("a", 2L, 2L, 5L, 9L), ("b", 1L, 1L, 3L, 3L)))
    // delete the max too: both ends move inward
    MinMaxAgg.appendDelta(st, sdf(("a", 9L, -1L)), spec, 3L)
    assert(cur(st) == Set(("a", 1L, 1L, 5L, 5L), ("b", 1L, 1L, 3L, 3L)))
    // fully-deleted key vanishes
    MinMaxAgg.appendDelta(st, sdf(("b", 3L, -1L)), spec, 4L)
    assert(cur(st) == Set(("a", 1L, 1L, 5L, 5L)))
  }

  test("update wave (−old/+new), replay, and compaction are invariant") {
    val st = store()
    MinMaxAgg.appendBatch(st, df("a" -> 2L, "a" -> 7L, "b" -> 4L), spec, 0L)
    // update a:7 → a:1 as one signed batch — min moves DOWN
    val upd = sdf(("a", 7L, -1L), ("a", 1L, 1L))
    MinMaxAgg.appendDelta(st, upd, spec, 1L)
    val want = Set(("a", 2L, 2L, 1L, 2L), ("b", 1L, 1L, 4L, 4L))
    assert(cur(st) == want)
    // replayed signed batch: identical partials dedup on (k, v, batch)
    MinMaxAgg.appendDelta(st, upd, spec, 1L)
    assert(cur(st) == want)
    MinMaxAgg.compact(st, spec)
    assert(cur(st) == want)
    // post-compaction real batch still applies
    MinMaxAgg.appendDelta(st, sdf(("a", 1L, -1L)), spec, 2L)
    assert(cur(st) == Set(("a", 1L, 1L, 2L, 2L), ("b", 1L, 1L, 4L, 4L)))
  }

  test("over-retraction stays visible as a negative net, never phantom extrema") {
    val st = store()
    MinMaxAgg.appendBatch(st, df("a" -> 5L), spec, 0L)
    MinMaxAgg.appendDelta(st, sdf(("a", 3L, -2L)), spec, 1L)
    // n_rows nets to −1 (visible contract violation); extrema ignore
    // the phantom value 3 and still report the really-present 5
    assert(cur(st) == Set(("a", -1L, 1L, 5L, 5L)))
  }

  test("nulls are skipped; in-batch −old/+new of the same value nets away") {
    val st = store()
    MinMaxAgg.appendBatch(st, df("a" -> 2L, "a" -> null, "b" -> null), spec, 0L)
    // b had ONLY null values → no groups at all → absent
    assert(cur(st) == Set(("a", 1L, 1L, 2L, 2L)))
    // same-value −/+ pair inside one batch folds to net 0 and writes nothing
    MinMaxAgg.appendDelta(st, sdf(("a", 2L, -1L), ("a", 2L, 1L)), spec, 1L)
    assert(cur(st) == Set(("a", 1L, 1L, 2L, 2L)))
  }

  test("topK serves the k largest surviving values, post-delete") {
    val st = store()
    MinMaxAgg.appendBatch(st,
      df("a" -> 10L, "a" -> 8L, "a" -> 6L, "a" -> 4L, "b" -> 1L), spec, 0L)
    MinMaxAgg.appendDelta(st, sdf(("a", 10L, -1L)), spec, 1L)
    val top2 = MinMaxAgg.topK(st, spec, 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(top2 == Set(("a", 8L), ("a", 6L), ("b", 1L)))
  }

  test("quantilesDisc: percentile_disc semantics, exact under deletes") {
    val st = store()
    // key a: multiset {1,2,2,3,4,4,4,10} (N=8)
    MinMaxAgg.appendBatch(st, df("a" -> 1L, "a" -> 2L, "a" -> 2L,
      "a" -> 3L, "a" -> 4L, "a" -> 4L, "a" -> 4L, "a" -> 10L), spec, 0L)
    def quant(qs: Double*) =
      MinMaxAgg.quantilesDisc(st, spec, qs).collect()
        .map(r => (r.getString(0), r.toSeq.drop(1))).toMap
    // p0=min, p25: cum/8>=.25 at rank2 → 2; p50: rank4 → 3; p75: rank6
    // → 4; p100=max — checked against the hand-expanded multiset
    assert(quant(0.0, 0.25, 0.5, 0.75, 1.0)("a") ==
      Seq(8L, 1L, 2L, 3L, 4L, 10L))
    // delete both 2s and one 4: {1,3,4,4,10} (N=5) — p50: cum/5>=.5 at
    // rank3 → 4 (the median MOVED, exactly as a recompute would say)
    MinMaxAgg.appendDelta(st,
      sdf(("a", 2L, -2L), ("a", 4L, -1L)), spec, 1L)
    assert(quant(0.5)("a") == Seq(5L, 4L))
    // exact-boundary rank: q=0.2 on N=5 must hit rank 1 EXACTLY (the
    // float 0.2·5=1.0000000000000002 trap the ppm arithmetic avoids)
    assert(quant(0.2)("a") == Seq(5L, 1L))
    // sub-percent quantiles label by exact micro-units, never a rounded
    // percent; same-percent-different-q pairs are refused, not silently
    // emitted as duplicate ambiguous columns
    val cols = MinMaxAgg.quantilesDisc(st, spec, Seq(0.005, 0.333)).columns
    assert(cols.contains("p5000ppm") && cols.contains("p333000ppm"), cols.toSeq)
    val e = intercept[IllegalArgumentException] {
      MinMaxAgg.quantilesDisc(st, spec, Seq(0.25, 0.25))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("quantilesDisc: histogram narrowing is bit-equal to the window path") {
    val st = store()
    // hot key with many distinct values (incl. negatives and clumps),
    // plus a small key — the mixed regime the guard must not disturb
    val rows = (1L to 3000L).map(i => ("hot", (i * 37) % 997 - 200, 1L)) ++
      (1L to 2500L).map(i => ("hot", i % 13, 1L)) ++
      Seq(("cold", 5L, 1L), ("cold", 7L, 1L), ("cold", 7L, 1L))
    MinMaxAgg.appendDelta(st, rows.toDF("k", "v", "__delta"), spec, 0L)
    // delete a slice so nets vary
    MinMaxAgg.appendDelta(st, (1L to 900L).map(i =>
      ("hot", (i * 37) % 997 - 200, -1L)).toDF("k", "v", "__delta"),
      spec, 1L)
    val qs = Seq(0.0, 0.005, 0.2, 0.25, 0.333, 0.5, 0.75, 0.999, 1.0)
    def run(): Set[Seq[Any]] =
      MinMaxAgg.quantilesDisc(st, spec, qs).collect().map(_.toSeq).toSet
    val windowed = run() // default threshold: window path
    val key = MinMaxAgg.DiscWindowMaxDistinctKey
    spark.conf.set(key, "1") // force histogram narrowing for every key
    try assert(run() == windowed,
      "histogram narrowing must be bit-equal to the window path")
    finally spark.conf.unset(key)
  }

  test("quantilesCont matches Spark's percentile_cont exactly, under deletes") {
    val st = store()
    val ins = (1L to 500L).map(i => (s"k${i % 3}", (i * 17) % 101, 1L))
    MinMaxAgg.appendDelta(st, ins.toDF("k", "v", "__delta"), spec, 0L)
    val del = ins.filter(_._2 % 4 == 0).map { case (k, v, _) => (k, v, -1L) }
    MinMaxAgg.appendDelta(st, del.toDF("k", "v", "__delta"), spec, 1L)
    val net = ins.filterNot(_._2 % 4 == 0).map { case (k, v, _) => (k, v) }
    val qs = Seq(0.0, 0.25, 0.3, 0.5, 0.75, 1.0)
    val want = net.toDF("k", "v").groupBy($"k")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_rows"),
        qs.map(q => org.apache.spark.sql.functions.expr(
          s"percentile_cont($q) WITHIN GROUP (ORDER BY v)")
          .as(MinMaxAgg.contLabel(q))): _*)
      .collect().map(_.toSeq).toSet
    val got = MinMaxAgg.quantilesCont(st, spec, qs)
      .collect().map(_.toSeq).toSet
    assert(got == want, "quantilesCont must be bit-identical to the builtin")
  }

  test("chained one-shot equality on a larger random-ish multiset") {
    val st = store()
    val rows = (1L to 400L).map(i =>
      (s"k${i % 7}", (i * 31) % 23, 1L))
    val ins = rows.toDF("k", "v", "__delta")
    MinMaxAgg.appendDelta(st, ins, spec, 0L)
    // delete every row whose v is that key's minimum (all copies)
    val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val del = rows.filter { case (k, v, _) => v == byKey(k) }
      .map { case (k, v, _) => (k, v, -1L) }.toDF("k", "v", "__delta")
    MinMaxAgg.appendDelta(st, del, spec, 1L)
    MinMaxAgg.compact(st, spec)
    val survivors = rows.filter { case (k, v, _) => v != byKey(k) }
    val want = survivors.groupBy(_._1).map { case (k, vs) =>
      val v = vs.map(_._2)
      (k, v.size.toLong, v.distinct.size.toLong, v.min, v.max)
    }.toSet
    assert(cur(st) == want)
  }
}
