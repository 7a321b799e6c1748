package graft

import org.apache.spark.sql.functions._

import graft.ops.OverlapAgg
import graft.sinks.AppendOnlyStore

/** Incremental set-overlap maintenance: exact pairwise intersection /
  * union in the below-capacity regime, crash-replay idempotence, and
  * result-invariant compaction — SketchAggSpec's gates extended to the
  * set-EXPRESSION question HLL cannot answer.
  */
class OverlapAggSpec extends SparkSpec {
  import spark.implicits._

  private val spec = OverlapAgg.Spec(Seq("g"), "u", k = 1024)

  private def newStore(tag: String) =
    new AppendOnlyStore(spark, tmpDir(tag), prefixCol = "__agg_key",
      prefixChars = 1)

  /** Slice [lo, hi) of engineered member sets: a = 0..599,
    * b = 300..899 (∩a = 300), c = 600..1199 (∩a = 0, ∩b = 300). */
  private def mk(lo: Int, hi: Int) = {
    val rows =
      (lo until hi).filter(_ < 600).map(i => ("a", i)) ++
        (lo until hi).map(i => ("b", i + 300)) ++
        (lo until hi).map(i => ("c", i + 600))
    rows.toDF("g", "u")
  }

  test("exact regime: overlap matrix equals true intersections and unions") {
    val store = newStore("overlap-exact")
    OverlapAgg.appendBatch(store, mk(0, 300), spec, 1L)
    OverlapAgg.appendBatch(store, mk(300, 600), spec, 2L)
    val got = OverlapAgg.overlapMatrix(store, spec)
      .select($"k1", $"k2", $"n_common", $"n_either").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // a = 0..599, b = 300..899, c = 600..1199
    assert(got == Set(
      ("a", "b", 300L, 900L),
      ("a", "c", 0L, 1200L),
      ("b", "c", 300L, 900L)))
    val counts = OverlapAgg.current(store, spec)
      .select($"g", $"n_rows").as[(String, Long)].collect().toMap
    assert(counts == Map("a" -> 600L, "b" -> 600L, "c" -> 600L))
  }

  test("replaying a batch id does not change the matrix") {
    val store = newStore("overlap-replay")
    OverlapAgg.appendBatch(store, mk(0, 400), spec, 7L)
    val before = OverlapAgg.overlapMatrix(store, spec).collect().toSet
    OverlapAgg.appendBatch(store, mk(0, 400), spec, 7L) // crash replay
    assert(OverlapAgg.overlapMatrix(store, spec).collect().toSet == before)
  }

  test("streaming twin: AvailableNow maintenance matches the batch matrix") {
    val root = tmpDir("overlap-stream")
    val dataDir = s"$root/in"
    val df1 = mk(0, 300)
    df1.coalesce(1).write.mode("append").parquet(dataDir)
    val store = newStore("overlap-stream-store")
    graft.streaming.EventStream.maintainOverlapAvailableNow(
      spark, dataDir, df1.schema, store, spec, s"$root/ckpt")
    def got() = OverlapAgg.overlapMatrix(store, spec).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got() == Set(
      ("a", "b", 0L, 600L), ("a", "c", 0L, 600L), ("b", "c", 0L, 600L)))
    // re-run with no new files: checkpoint makes it a no-op
    graft.streaming.EventStream.maintainOverlapAvailableNow(
      spark, dataDir, df1.schema, store, spec, s"$root/ckpt")
    assert(got().size == 3)
    // a new file folds in incrementally and overlaps appear
    mk(300, 600).coalesce(1).write.mode("append").parquet(dataDir)
    graft.streaming.EventStream.maintainOverlapAvailableNow(
      spark, dataDir, df1.schema, store, spec, s"$root/ckpt")
    assert(got() == Set(
      ("a", "b", 300L, 900L), ("a", "c", 0L, 1200L), ("b", "c", 300L, 900L)))
  }

  test("compaction is result-invariant and folds to one row per key") {
    val store = newStore("overlap-compact")
    (1L to 5L).foreach(b =>
      OverlapAgg.appendBatch(store,
        mk((b.toInt - 1) * 120, b.toInt * 120), spec, b))
    val before = OverlapAgg.overlapMatrix(store, spec).collect().toSet
    OverlapAgg.compact(store, spec)
    assert(OverlapAgg.overlapMatrix(store, spec).collect().toSet == before)
    assert(store.read().count() == 3)
  }
}
