package graft

import org.apache.spark.sql.functions._

import graft.ops.{IncrementalAgg, MinMaxAgg}
import graft.sinks.AppendOnlyStore

/** The applied-batch manifest on [[AppendOnlyStore]]: committed replays
  * are physical no-ops even AFTER compaction folded the original rows
  * (where the (key, batch_id) dedup alone could no longer catch them —
  * the double-count hole this manifest closes, mirroring
  * IncrementalJoin's), and compaction refuses while a started batch
  * never committed. */
class AppliedManifestSpec extends SparkSpec {
  import spark.implicits._

  private val spec = IncrementalAgg.Spec(Seq("k"), Seq("v"))

  test("replay AFTER compaction is a no-op for the agg store") {
    val store = new AppendOnlyStore(spark, tmpDir("manifest-agg"),
      prefixCol = "__agg_key", prefixChars = 1)
    val b0 = Seq(("a", 10L, 1L), ("a", 20L, 1L), ("b", 5L, 1L))
      .toDF("k", "v", "__delta")
    IncrementalAgg.appendDelta(store, b0, spec, 0L)
    IncrementalAgg.compact(store, spec)
    // pre-manifest, this replay re-counted b0 (its original partials are
    // folded into Compacted stamps and no longer dedup against it)
    IncrementalAgg.appendDelta(store, b0, spec, 0L)
    val cur = IncrementalAgg.current(store, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(cur == Set(("a", 2L, 30L), ("b", 1L, 5L)))
    assert(store.hasApplied(0L) && !store.hasApplied(1L))
  }

  test("replay AFTER compaction is a no-op for the extrema store") {
    val st = new AppendOnlyStore(spark, tmpDir("manifest-mm"),
      prefixCol = "__agg_key", prefixChars = 1)
    val mmSpec = MinMaxAgg.Spec(Seq("k"), "v")
    MinMaxAgg.appendBatch(st, Seq("a" -> 2L, "a" -> 7L).toDF("k", "v"),
      mmSpec, 0L)
    val takedown = Seq(("a", 7L, -1L)).toDF("k", "v", "__delta")
    MinMaxAgg.appendDelta(st, takedown, mmSpec, 1L)
    MinMaxAgg.compact(st, mmSpec)
    MinMaxAgg.appendDelta(st, takedown, mmSpec, 1L) // replay post-compact
    val cur = MinMaxAgg.current(st, mmSpec)
      .select($"k", $"n_rows", $"min_v", $"max_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(cur == Set(("a", 1L, 2L, 2L)))
  }

  test("compaction refuses while a started batch never committed") {
    val store = new AppendOnlyStore(spark, tmpDir("manifest-crash"),
      prefixCol = "__agg_key", prefixChars = 1)
    IncrementalAgg.appendBatch(store, Seq("a" -> 1L).toDF("k", "v"), spec, 0L)
    // a batch whose write job dies mid-flight: started marker, no done
    val boom = udf((v: Long) =>
      if (v >= 0) throw new RuntimeException("boom") else v)
    intercept[Exception] {
      IncrementalAgg.appendBatch(store,
        Seq("a" -> 2L).toDF("k", "v").withColumn("v", boom($"v")), spec, 1L)
    }
    val ex = intercept[IllegalArgumentException] {
      IncrementalAgg.compact(store, spec)
    }
    assert(ex.getMessage.contains("never committed"))
    // the retry completes the batch; compaction is unblocked
    IncrementalAgg.appendBatch(store, Seq("a" -> 2L).toDF("k", "v"), spec, 1L)
    IncrementalAgg.compact(store, spec)
    val cur = IncrementalAgg.current(store, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(cur == Set(("a", 2L, 3L)))
  }
}
