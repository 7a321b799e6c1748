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
      IncrementalAgg.appendBatch(store, df.filter($"v" % 3 === b), spec)
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
    IncrementalAgg.appendBatch(store, df.filter($"v" <= 500), spec)
    val filesAfterB1 = store.dataFiles().toSet
    IncrementalAgg.appendBatch(store, df.filter($"v" > 500), spec)
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

  test("null grouping keys survive the hash key and the re-fold") {
    val df = Seq((Some("a"), 1L), (None, 2L), (None, 3L), (Some("a"), 4L))
      .toDF("k", "v")
    val store = newStore("ivm-null")
    IncrementalAgg.appendBatch(store, df.filter($"v" <= 2), spec)
    IncrementalAgg.appendBatch(store, df.filter($"v" > 2), spec)
    val got = IncrementalAgg.current(store, spec)
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((Some("a"), 2L, 5L), (None, 2L, 5L)))
  }
}
