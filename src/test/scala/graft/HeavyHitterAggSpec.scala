package graft

import org.apache.spark.sql.functions._

import graft.ops.HeavyHitterAgg
import graft.sinks.AppendOnlyStore

/** Incremental heavy-hitter maintenance: exactness below summary
  * capacity, the SpaceSaving N/capacity guarantees beyond it (preserved
  * across merge), crash-replay idempotence, result-invariant compaction,
  * and the streaming twin — the HeavyHitterAgg leg of the sketch-IVM
  * family.
  */
class HeavyHitterAggSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(tag: String) =
    new AppendOnlyStore(spark, tmpDir(tag), prefixCol = "__agg_key",
      prefixChars = 1)

  /** items drawn from a small skewed alphabet: item j appears with
    * multiplicity proportional to its index. */
  private def skewedRows(n: Int, groups: Int, alphabet: Int): Seq[(Int, String)] =
    (0 until n).map { i =>
      val r = (i * 2654435761L) % ((alphabet * (alphabet + 1)) / 2)
      // inverse of triangular cumsum: item j owns [T(j), T(j+1))
      val j = ((math.sqrt(8.0 * r + 1) - 1) / 2).toInt
      (i % groups, s"tok${alphabet - 1 - j}")
    }

  private def exactTop(rows: Seq[(Int, String)], g: Int, k: Int): Seq[(String, Long)] =
    rows.filter(_._1 == g).groupBy(_._2).map { case (i, rs) => (i, rs.size.toLong) }
      .toSeq.sortBy { case (i, c) => (-c, i) }.take(k)

  test("below capacity: merged-across-batches top-k is exact, zero error") {
    val spec = HeavyHitterAgg.Spec(Seq("g"), "item", capacity = 32)
    val store = newStore("ss-exact")
    val rows = skewedRows(3000, 3, 20) // 20 distinct << capacity 32
    val df = rows.toDF("g", "item")
    (0 to 2).foreach(b => HeavyHitterAgg.appendBatch(store,
      df.filter(abs(hash($"item")) % 3 === b), spec, b.toLong))
    val got = HeavyHitterAgg.current(store, spec, k = 5).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getString(3), r.getLong(4),
        r.getLong(5)))
    (0 until 3).foreach { g =>
      val want = exactTop(rows, g, 5)
      val mine = got.filter(_._1 == g).sortBy(_._2)
      assert(mine.map(t => (t._3, t._4)).toSeq == want, s"g=$g top-5")
      assert(mine.forall(_._5 == 0L), s"g=$g exact regime must have zero error")
    }
  }

  test("beyond capacity: overcount bounded by N/capacity, heavy items present") {
    val capacity = 16
    val spec = HeavyHitterAgg.Spec(Seq("g"), "item", capacity = capacity)
    val store = newStore("ss-dense")
    val rows = skewedRows(20000, 1, 200) // 200 distinct >> capacity 16
    val df = rows.toDF("g", "item")
    (0 to 3).foreach(b => HeavyHitterAgg.appendBatch(store,
      df.filter(abs(hash($"item")) % 4 === b), spec, b.toLong))
    val n = rows.size.toLong
    val bound = n / capacity
    val true_ = rows.groupBy(_._2).map { case (i, rs) => (i, rs.size.toLong) }
    val got = HeavyHitterAgg.current(store, spec, k = capacity).collect()
      .map(r => (r.getString(3), r.getLong(4), r.getLong(5)))
    got.foreach { case (item, est, err) =>
      val t = true_.getOrElse(item, 0L)
      assert(est >= t, s"$item: SpaceSaving never undercounts")
      assert(est - t <= bound, s"$item: overcount ${est - t} > N/cap $bound")
      assert(err <= bound, s"$item: tracked error exceeds bound")
    }
    // any item with true frequency > N/capacity must be in the summary
    val mustHave = true_.filter(_._2 > bound).keySet
    val present = got.map(_._1).toSet
    assert(mustHave.subsetOf(present),
      s"missing guaranteed heavy hitters: ${mustHave -- present}")
  }

  test("replaying a batch id does not change the ranking") {
    val spec = HeavyHitterAgg.Spec(Seq("g"), "item", capacity = 32)
    val store = newStore("ss-replay")
    val df = skewedRows(1000, 2, 12).toDF("g", "item")
    HeavyHitterAgg.appendBatch(store, df, spec, 7L)
    def snap() = HeavyHitterAgg.current(store, spec, k = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSet
    val before = snap()
    HeavyHitterAgg.appendBatch(store, df, spec, 7L) // crash replay
    assert(snap() == before)
  }

  test("compaction is result-invariant and shrinks the store") {
    val spec = HeavyHitterAgg.Spec(Seq("g"), "item", capacity = 32)
    val store = newStore("ss-compact")
    val df = skewedRows(2000, 2, 15).toDF("g", "item")
    (0 to 3).foreach(b => HeavyHitterAgg.appendBatch(store,
      df.filter(abs(hash($"item")) % 4 === b), spec, b.toLong))
    def snap() = HeavyHitterAgg.current(store, spec, k = 6).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4), r.getLong(5))).toSet
    val before = snap()
    val rowsBefore = store.read().count()
    HeavyHitterAgg.compact(store, spec)
    assert(snap() == before, "compaction must not move the ranking")
    assert(store.read().count() < rowsBefore)
  }

  test("streaming twin: AvailableNow maintenance matches batch exactness") {
    val spec = HeavyHitterAgg.Spec(Seq("g"), "item", capacity = 32)
    val root = tmpDir("ss-stream")
    val dataDir = s"$root/in"
    val rows1 = skewedRows(1500, 2, 18)
    rows1.toDF("g", "item").coalesce(1).write.mode("append").parquet(dataDir)
    val schema = spark.read.parquet(dataDir).schema
    val store = newStore("ss-stream-store")
    graft.streaming.EventStream.maintainHeavyHittersAvailableNow(
      spark, dataDir, schema, store, spec, s"$root/ckpt")
    def got() = HeavyHitterAgg.current(store, spec, k = 4).collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getString(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    def want(rows: Seq[(Int, String)]) = (0 until 2).flatMap { g =>
      exactTop(rows, g, 4).zipWithIndex.map { case ((i, c), rk) =>
        (g, rk + 1L, i, c)
      }
    }
    assert(got().toSeq == want(rows1))
    // a new file folds in incrementally; replayed run is a no-op first
    graft.streaming.EventStream.maintainHeavyHittersAvailableNow(
      spark, dataDir, schema, store, spec, s"$root/ckpt")
    assert(got().toSeq == want(rows1))
    val rows2 = skewedRows(900, 2, 18).map { case (g, i) => (g, i.reverse) }
    rows2.toDF("g", "item").coalesce(1).write.mode("append").parquet(dataDir)
    graft.streaming.EventStream.maintainHeavyHittersAvailableNow(
      spark, dataDir, schema, store, spec, s"$root/ckpt")
    assert(got().toSeq == want(rows1 ++ rows2))
  }
}
