package graft

import org.apache.spark.sql.functions._

import graft.ops.IncrementalAgg
import graft.sinks.AppendOnlyStore

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(tag: String) =
    new AppendOnlyStore(spark, tmpDir(tag), prefixCol = "__agg_key", prefixChars = 1)

  private val spec = IncrementalAgg.Spec(Seq("k"), Seq("v"))

  test("batched maintenance equals the one-shot aggregate") {
    val data = (1 to 3000).map(i => (s"k${i % 7}", i.toLong))
    val df = data.toDF("k", "v")
    val store = newStore("ivm-eq")
    (0 until 3).foreach { b =>
      IncrementalAgg.appendBatch(store, df.filter($"v" % 3 === b), spec, batchId = b)
    }
    val got = IncrementalAgg.current(store, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val want = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("append touches only batch files; compact collapses partials invariantly") {
    val df = (1 to 1000).map(i => (s"k${i % 5}", i.toLong)).toDF("k", "v")
    val store = newStore("ivm-compact")
    IncrementalAgg.appendBatch(store, df.filter($"v" <= 500), spec, batchId = 0L)
    val filesAfterB1 = store.dataFiles().toSet
    IncrementalAgg.appendBatch(store, df.filter($"v" > 500), spec, batchId = 1L)
    // append-only: batch 1's files are still present, untouched
    assert(filesAfterB1.subsetOf(store.dataFiles().toSet))
    val before = IncrementalAgg.current(store, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    IncrementalAgg.compact(store, spec)
    val after = IncrementalAgg.current(store, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(before.toSeq == after.toSeq)
    // one row per key remains in the store after compaction
    assert(store.read().count() == 5)
  }

  test("replaying a batch id is idempotent (crash-replay exactly-once)") {
    val df = (1 to 200).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
    val store = newStore("ivm-replay")
    IncrementalAgg.appendBatch(store, df, spec, batchId = 7L)
    val once = IncrementalAgg.current(store, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    IncrementalAgg.appendBatch(store, df, spec, batchId = 7L) // replay
    val twice = IncrementalAgg.current(store, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(once.toSeq == twice.toSeq)
    // replay survives compaction of the deduped state too
    IncrementalAgg.compact(store, spec)
    val afterCompact = IncrementalAgg.current(store, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(afterCompact.toSeq == once.toSeq)
  }

  test("streaming maintenance: AvailableNow folds new files only, totals stay exact") {
    import org.apache.spark.sql.types._
    val root = tmpDir("ivm-stream")
    val dataDir = s"$root/in"
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", LongType)))
    val df1 = (1 to 300).map(i => (s"k${i % 4}", i.toLong)).toDF("k", "v")
    df1.coalesce(1).write.mode("append").parquet(dataDir)
    val store = newStore("ivm-stream-store")
    graft.streaming.EventStream.maintainAggAvailableNow(
      spark, dataDir, schema, store, spec, s"$root/ckpt")
    val got1 = IncrementalAgg.current(store, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val want1 = df1.groupBy($"k").agg(count(lit(1)), sum($"v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(got1.toSeq == want1.toSeq)
    // second run with NO new files: checkpoint makes it a no-op
    graft.streaming.EventStream.maintainAggAvailableNow(
      spark, dataDir, schema, store, spec, s"$root/ckpt")
    assert(IncrementalAgg.current(store, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq == want1.toSeq)
    // new file arrives; only it is folded in
    val df2 = (301 to 500).map(i => (s"k${i % 4}", i.toLong)).toDF("k", "v")
    df2.coalesce(1).write.mode("append").parquet(dataDir)
    graft.streaming.EventStream.maintainAggAvailableNow(
      spark, dataDir, schema, store, spec, s"$root/ckpt")
    val want2 = df1.unionByName(df2).groupBy($"k").agg(count(lit(1)), sum($"v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(IncrementalAgg.current(store, spec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq == want2.toSeq)
  }

  test("min/max columns maintain per-key bounds across batches + compact") {
    val mmSpec = IncrementalAgg.Spec(Seq("k"), Seq("v"),
      minCols = Seq("v"), maxCols = Seq("v"))
    val store = newStore("ivm-minmax")
    val all = (1 to 4000).map(i => (s"k${i % 6}", (i * 37L) % 1009L))
      .toDF("k", "v")
    (0L to 3L).foreach { b =>
      IncrementalAgg.appendBatch(store,
        all.filter($"v" % 4 === b), mmSpec, b)
      if (b == 2L) IncrementalAgg.compact(store, mmSpec)
    }
    val got = IncrementalAgg.current(store, mmSpec)
      .select($"k", $"n_rows", $"sum_v", $"min_v", $"max_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val want = all.groupBy($"k").agg(count(lit(1)), sum($"v"), min($"v"),
        max($"v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == want)
  }

  test("null grouping keys survive the hash key and the re-fold") {
    val df = Seq((Some("a"), 1L), (None, 2L), (None, 3L), (Some("a"), 4L))
      .toDF("k", "v")
    val store = newStore("ivm-null")
    IncrementalAgg.appendBatch(store, df.filter($"v" <= 2), spec, batchId = 0L)
    IncrementalAgg.appendBatch(store, df.filter($"v" > 2), spec, batchId = 1L)
    val got = IncrementalAgg.current(store, spec)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((Some("a"), 2L, 5L), (None, 2L, 5L)))
  }
}
