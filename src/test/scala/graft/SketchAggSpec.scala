package graft

import org.apache.spark.sql.functions._

import graft.ops.SketchAgg
import graft.sinks.AppendOnlyStore

/** Incremental distinct-count maintenance: exactness in the sparse
  * regime, bounded error when dense, crash-replay idempotence, and
  * result-invariant compaction — mirroring IncrementalAggSpec's gates
  * for the sketch state.
  */
class SketchAggSpec extends SparkSpec {
  import spark.implicits._

  private val spec = SketchAgg.Spec(Seq("g"), "u")

  private def newStore(tag: String) =
    new AppendOnlyStore(spark, tmpDir(tag), prefixCol = "__agg_key",
      prefixChars = 1)

  private def batch(lo: Int, hi: Int) =
    (lo until hi).map(i => (i % 5, i % 400)).toDF("g", "u")

  test("sparse regime: estimates equal exact distinct counts per key") {
    val store = newStore("sketch-exact")
    SketchAgg.appendBatch(store, batch(0, 2000), spec, 1L)
    SketchAgg.appendBatch(store, batch(2000, 4000), spec, 2L)
    val got = SketchAgg.current(store, spec)
      .select($"g", $"n_distinct", $"n_rows").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val want = batch(0, 4000).groupBy($"g")
      .agg(countDistinct($"u").as("d"), count(lit(1)).as("n")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(SketchAgg.globalDistinct(store, spec) == 400L)
  }

  test("replaying a batch id does not change any estimate") {
    val store = newStore("sketch-replay")
    SketchAgg.appendBatch(store, batch(0, 3000), spec, 7L)
    val before = SketchAgg.current(store, spec).collect().toSet
    SketchAgg.appendBatch(store, batch(0, 3000), spec, 7L) // crash replay
    val after = SketchAgg.current(store, spec).collect().toSet
    assert(before == after)
  }

  test("compaction is result-invariant and shrinks the store") {
    val store = newStore("sketch-compact")
    (1L to 6L).foreach(b =>
      SketchAgg.appendBatch(store,
        batch(b.toInt * 1000, b.toInt * 1000 + 1000), spec, b))
    val before = SketchAgg.current(store, spec).collect().toSet
    val filesBefore = store.dataFiles().size
    SketchAgg.compact(store, spec)
    assert(SketchAgg.current(store, spec).collect().toSet == before)
    assert(store.read().count() == 5) // one folded row per key
    assert(store.dataFiles().size <= filesBefore)
  }

  test("streaming twin: AvailableNow maintenance matches batch exactness") {
    val root = tmpDir("sketch-stream")
    val dataDir = s"$root/in"
    val df1 = (1 to 1500).map(i => (i % 5, i % 300)).toDF("g", "u")
    df1.coalesce(1).write.mode("append").parquet(dataDir)
    val schema = df1.schema
    val store = newStore("sketch-stream-store")
    graft.streaming.EventStream.maintainDistinctAvailableNow(
      spark, dataDir, schema, store, spec, s"$root/ckpt")
    def got() = SketchAgg.current(store, spec)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    def want(df: org.apache.spark.sql.DataFrame) = df.groupBy($"g")
      .agg(countDistinct($"u"), count(lit(1)))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
    assert(got().toSeq == want(df1).toSeq)
    // re-run with no new files: checkpoint makes it a no-op
    graft.streaming.EventStream.maintainDistinctAvailableNow(
      spark, dataDir, schema, store, spec, s"$root/ckpt")
    assert(got().toSeq == want(df1).toSeq)
    // a new file folds in incrementally
    val df2 = (1501 to 2500).map(i => (i % 5, i % 300)).toDF("g", "u")
    df2.coalesce(1).write.mode("append").parquet(dataDir)
    graft.streaming.EventStream.maintainDistinctAvailableNow(
      spark, dataDir, schema, store, spec, s"$root/ckpt")
    assert(got().toSeq == want(df1.unionByName(df2)).toSeq)
  }

  test("dense regime: error within published bound at 50k distinct") {
    val store = newStore("sketch-dense")
    val big = (0 until 200000).map(i => (0, i % 50000)).toDF("g", "u")
    SketchAgg.appendBatch(store, big, spec, 1L)
    val est = SketchAgg.current(store, spec).head().getAs[Long]("n_distinct")
    // lgK=12 → ~1.6% relative standard error; gate at 4 sigma
    assert(math.abs(est - 50000L) <= 50000L * 0.065,
      s"estimate $est too far from 50000")
  }
}
