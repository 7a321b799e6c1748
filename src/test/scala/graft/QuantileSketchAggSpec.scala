package graft

import org.apache.spark.sql.functions._

import graft.ops.QuantileSketchAgg
import graft.sinks.AppendOnlyStore

/** Incremental quantile maintenance: exactness below sketch capacity
  * (inclusive-rank identity with SQL cume_dist), bounded rank error
  * beyond it, crash-replay idempotence, and result-invariant compaction
  * — the QuantileSketchAgg leg of the sketch-IVM family.
  */
class QuantileSketchAggSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(tag: String) =
    new AppendOnlyStore(spark, tmpDir(tag), prefixCol = "__agg_key",
      prefixChars = 1)

  /** Inclusive-rank reference quantile: min v with |{x ≤ v}|/n ≥ p. */
  private def refQuantile(values: Seq[Long], p: Double): Long = {
    val sorted = values.sorted
    val n = sorted.length
    sorted.find(v => sorted.count(_ <= v).toDouble / n >= p).get
  }

  test("below capacity: merged-across-batches quantiles are exact") {
    val spec = QuantileSketchAgg.Spec(Seq("g"), "v", k = 200)
    val store = newStore("kll-exact")
    val rows = (0 until 600).map(i => (i % 4, (i * 2654435761L) % 997L))
    val df = rows.toDF("g", "v")
    (0 to 2).foreach(b => QuantileSketchAgg.appendBatch(store,
      df.filter($"v" % 3 === b), spec, b.toLong))
    val got = QuantileSketchAgg.current(store, spec, Seq(0.5, 0.9))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    (0 until 4).foreach { g =>
      val vs = rows.filter(_._1 == g).map(_._2)
      val (n, q50, q90) = got(g)
      assert(n == vs.size)
      assert(q50 == refQuantile(vs, 0.5), s"g=$g q50")
      assert(q90 == refQuantile(vs, 0.9), s"g=$g q90")
    }
  }

  test("replaying a batch id does not change any quantile") {
    val spec = QuantileSketchAgg.Spec(Seq("g"), "v")
    val store = newStore("kll-replay")
    val df = (0 until 500).map(i => (i % 3, i.toLong)).toDF("g", "v")
    QuantileSketchAgg.appendBatch(store, df, spec, 7L)
    val before = QuantileSketchAgg.current(store, spec, Seq(0.5))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    QuantileSketchAgg.appendBatch(store, df, spec, 7L) // crash replay
    val after = QuantileSketchAgg.current(store, spec, Seq(0.5))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(before == after)
  }

  test("compaction is result-invariant and shrinks the store") {
    val spec = QuantileSketchAgg.Spec(Seq("g"), "v", k = 200)
    val store = newStore("kll-compact")
    val df = (0 until 400).map(i => (i % 3, (i * 31L) % 211L)).toDF("g", "v")
    (0 to 3).foreach(b => QuantileSketchAgg.appendBatch(store,
      df.filter($"v" % 4 === b), spec, b.toLong))
    val before = QuantileSketchAgg.current(store, spec, Seq(0.25, 0.75))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val rowsBefore = store.read().count()
    QuantileSketchAgg.compact(store, spec)
    val after = QuantileSketchAgg.current(store, spec, Seq(0.25, 0.75))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(before == after, "compaction must not move any quantile")
    assert(store.read().count() < rowsBefore)
  }

  test("streaming twin: AvailableNow maintenance matches batch exactness") {
    val spec = QuantileSketchAgg.Spec(Seq("g"), "v", k = 200)
    val root = tmpDir("kll-stream")
    val dataDir = s"$root/in"
    val df1 = (0 until 300).map(i => (i % 3, (i * 31L) % 211L)).toDF("g", "v")
    df1.coalesce(1).write.mode("append").parquet(dataDir)
    val store = newStore("kll-stream-store")
    graft.streaming.EventStream.maintainQuantilesAvailableNow(
      spark, dataDir, df1.schema, store, spec, s"$root/ckpt")
    def got() = QuantileSketchAgg.current(store, spec, Seq(0.5))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    def want(rows: Seq[(Int, Long)]) = rows.groupBy(_._1).toSeq.map {
      case (g, rs) => (g, rs.size.toLong, refQuantile(rs.map(_._2), 0.5))
    }.sorted
    val rows1 = (0 until 300).map(i => (i % 3, (i * 31L) % 211L))
    assert(got().toSeq == want(rows1))
    // checkpoint: re-run with no new files is a no-op
    graft.streaming.EventStream.maintainQuantilesAvailableNow(
      spark, dataDir, df1.schema, store, spec, s"$root/ckpt")
    assert(got().toSeq == want(rows1))
    // a new file folds in incrementally
    val rows2 = (300 until 500).map(i => (i % 3, (i * 31L) % 211L))
    rows2.toDF("g", "v").coalesce(1).write.mode("append").parquet(dataDir)
    graft.streaming.EventStream.maintainQuantilesAvailableNow(
      spark, dataDir, df1.schema, store, spec, s"$root/ckpt")
    assert(got().toSeq == want(rows1 ++ rows2))
  }

  test("beyond capacity: rank error within the published epsilon bound") {
    // 100k uniform values through a k=200 sketch: Datasketches' bound
    // for k=200 is ~1.65% rank error (99% confidence); gate at 3%
    val spec = QuantileSketchAgg.Spec(Seq("g"), "v", k = 200)
    val store = newStore("kll-dense")
    val n = 100000
    val df = (0 until n).map(i => (0, ((i * 2654435761L) % n))).toDF("g", "v")
    (0 to 4).foreach(b => QuantileSketchAgg.appendBatch(store,
      df.filter($"v" % 5 === b), spec, b.toLong))
    val row = QuantileSketchAgg.current(store, spec, Seq(0.5, 0.99)).head()
    val (q50, q99) = (row.getLong(2), row.getLong(3))
    // values are a permutation of 0..n-1 → true quantile ≈ p·n
    assert(math.abs(q50 - n * 0.5) <= n * 0.03, s"q50=$q50")
    assert(math.abs(q99 - n * 0.99) <= n * 0.03, s"q99=$q99")
    assert(row.getLong(1) == n)
  }
}
