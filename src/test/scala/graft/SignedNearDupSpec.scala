package graft

import graft.ops.{DedupOps, IncrementalAgg}
import org.apache.spark.sql.DataFrame

/** Takedown-aware verified near-dedup over the SIGNED membership store:
  * a taken-down doc's LSH memberships net to zero and stop rejecting
  * newcomers; replays (admit and takedown, pre- and post-compaction) are
  * state no-ops; the returned admitted set is replay-stable. */
class SignedNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val spec = DedupOps.signedBucketSpec("doc_id")

  private def admit(store: graft.sinks.AppendOnlyStore, batch: DataFrame,
                    corpus: DataFrame, bid: Long): DataFrame =
    DedupOps.signedMinhashDedupVerified(batch, "text", "doc_id", store,
      corpus, threshold = 1.0, batchId = bid, k = 16, bands = 4)

  private val b1 = Seq(
    (10L, "alpha beta gamma delta"),
    (20L, "alpha beta gamma delta"), // within-batch dup of 10
    (30L, "one two three four")).toDF("doc_id", "text")

  test("a takedown frees the shingle group for an identical newcomer") {
    val store = DedupOps.signedBucketStore(spark, tmpDir("snd"))
    val a1 = admit(store, b1, b1.limit(0), 0L)
    assert(a1.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(10L, 30L))
    DedupOps.nearDupTakedown(store, a1.filter($"doc_id" === 10L),
      "text", "doc_id", 1L, k = 16, bands = 4)
    val live1 = a1.filter($"doc_id" =!= 10L)
    val b2 = Seq(
      (41L, "alpha beta gamma delta"), // twin of the taken-down 10: in
      (43L, "one two three four") //      twin of the live 30: out
    ).toDF("doc_id", "text")
    val a2 = admit(store, b2, live1, 2L)
    assert(a2.select("doc_id").as[Long].collect().toSeq == Seq(41L))
  }

  test("replays and compaction leave live memberships and admissions invariant") {
    val store = DedupOps.signedBucketStore(spark, tmpDir("snd"))
    val a1 = admit(store, b1, b1.limit(0), 0L)
    // replayed admit: same returned set (id1 ≠ id2 guard), state no-op
    val a1r = admit(store, b1, b1.limit(0), 0L)
    assert(a1r.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(10L, 30L))
    def liveIds(): Set[Long] =
      IncrementalAgg.current(store, spec)
        .select("doc_id").distinct().as[Long].collect().toSet
    assert(liveIds() == Set(10L, 30L))
    val td = a1.filter($"doc_id" === 10L)
    DedupOps.nearDupTakedown(store, td, "text", "doc_id", 1L, k = 16, bands = 4)
    assert(liveIds() == Set(30L))
    IncrementalAgg.compact(store, spec)
    assert(liveIds() == Set(30L))
    // post-compaction replayed takedown: manifest no-op (a second −1
    // wave would drive 10's nets negative and corrupt the store)
    DedupOps.nearDupTakedown(store, td, "text", "doc_id", 1L, k = 16, bands = 4)
    assert(liveIds() == Set(30L))
  }

  test("a fully-taken-down store admits everything again") {
    val store = DedupOps.signedBucketStore(spark, tmpDir("snd"))
    val a1 = admit(store, b1, b1.limit(0), 0L)
    DedupOps.nearDupTakedown(store, a1, "text", "doc_id", 1L, k = 16, bands = 4)
    IncrementalAgg.compact(store, spec)
    val b2 = b1.withColumn("doc_id", $"doc_id" + 100L)
    val a2 = admit(store, b2, b1.limit(0), 2L)
    assert(a2.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(110L, 130L))
  }
}
