package graft

import org.apache.spark.sql.functions._

import graft.ops.DedupOps
import graft.sinks.AppendOnlyStore

class IncrementalNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the " +
    "old stone bridge while the miller grinds wheat into flour all day long"

  private def store() =
    new AppendOnlyStore(spark, tmpDir("neardup"), prefixCol = "bucket_key")

  test("near-dups are admitted once across batches; store is append-only") {
    val s = store()
    val batch1 = Seq(
      (1L, base),
      (2L, base + " extra"),          // near-dup of 1 → within-batch reject
      (3L, "completely different text about spark catalyst optimizer " +
        "rules and physical planning strategies for distributed joins")
    ).toDF("doc_id", "text")
    val admitted1 = DedupOps.incrementalMinhashDedup(
      batch1, "text", "doc_id", s).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admitted1 === Set(1L, 3L))

    val filesAfter1 = s.dataFiles().toSet
    assert(filesAfter1.nonEmpty)

    val batch2 = Seq(
      (4L, base + " indeed"),         // near-dup of stored 1 → cross reject
      (5L, "a genuinely novel document regarding embedded derby database " +
        "integration testing patterns for jdbc connector round trips")
    ).toDF("doc_id", "text")
    val admitted2 = DedupOps.incrementalMinhashDedup(
      batch2, "text", "doc_id", s).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admitted2 === Set(5L))

    // append-only: every file from batch 1 survives batch 2 untouched
    val filesAfter2 = s.dataFiles().toSet
    assert(filesAfter1.subsetOf(filesAfter2))
    assert(filesAfter2.size > filesAfter1.size)
  }

  test("replaying a batch admits nothing new") {
    val s = store()
    val batch = Seq((1L, base), (2L, "some other unrelated corpus text " +
      "mentioning bloom filters and broadcast joins at petabyte scale"))
      .toDF("doc_id", "text")
    assert(DedupOps.incrementalMinhashDedup(batch, "text", "doc_id", s)
      .count() === 2L)
    assert(DedupOps.incrementalMinhashDedup(batch, "text", "doc_id", s)
      .count() === 0L)
  }

  test("docs shorter than one shingle are always admitted") {
    val s = store()
    val batch = Seq((1L, "hi"), (2L, "yo")).toDF("doc_id", "text")
    val admitted = DedupOps.incrementalMinhashDedup(batch, "text", "doc_id", s)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted === Set(1L, 2L))
  }

  test("plan gate: the store probe is a broadcast join, store side unshuffled") {
    val s = store()
    DedupOps.incrementalMinhashDedup(
      Seq((1L, base)).toDF("doc_id", "text"), "text", "doc_id", s)
    val bk = Seq(("00aabbccdd112233", 9L)).toDF("bucket_key", "doc_id")
    val hits = DedupOps.crossBatchHits(bk, "doc_id", s, broadcastBatch = true)
    val p = hits.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join in: $p")
    // the only Exchange allowed is the tiny id-distinct ABOVE the join —
    // the store scan itself must feed the join directly
    val joinLine = p.linesIterator.indexWhere(_.contains("BroadcastHashJoin"))
    val below = p.linesIterator.drop(joinLine + 1).toSeq
    assert(!below.exists(l => l.contains("Exchange hashpartitioning")),
      s"store side must not shuffle:\n$p")
  }
}
