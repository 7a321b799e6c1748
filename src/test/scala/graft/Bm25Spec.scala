package graft

import graft.ops.TextOps

/** Okapi BM25 ranking: scores verified against a hand-computed fixture. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark spark fast"),
    (2L, "slow database engine"),
    (3L, "spark engine"),
    (4L, "")).toDF("doc_id", "text")

  test("matches the hand-computed Okapi formula") {
    val got = TextOps.bm25(docs, "text", "doc_id", Seq("spark"))
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    // N=4, df=2, idf = ln((4-2+0.5)/(2+0.5)+1) = ln(2)
    // avgdl = (3+3+2+0)/4 = 2.0
    val idf = math.log(2.0)
    def s(tf: Double, dl: Double) =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.0))
    assert(math.abs(got(1L) - s(2, 3)) < 1e-12)
    assert(got(2L) == 0.0)
    assert(math.abs(got(3L) - s(1, 2)) < 1e-12)
    assert(got(4L) == 0.0) // blank doc: doc_len 0, no matches
  }

  test("multi-term score is the fixed-order sum of per-term scores") {
    val single = Seq("spark", "engine").map { t =>
      TextOps.bm25(docs, "text", "doc_id", Seq(t))
        .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    }
    val both = TextOps.bm25(docs, "text", "doc_id", Seq("spark", "engine"))
      .select($"doc_id", $"score").as[(Long, Double)].collect().toMap
    docs.select($"doc_id").as[Long].collect().foreach { id =>
      assert(both(id) == single(0)(id) + single(1)(id))
    }
  }

  test("ranking puts the term-dense short doc first") {
    val ranked = TextOps.bm25(docs, "text", "doc_id", Seq("spark"))
      .orderBy($"score".desc).select($"doc_id").as[Long].collect()
    assert(ranked.head == 1L)
  }

  test("packStream assigns contiguous shard-local offsets, bins, straddle flags") {
    // one shard (shards=1), capacity 10: lens 4,4,4 → offsets 0,4,8;
    // doc 3 starts in bin 0 and crosses into bin 1
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 10L))
      .toDF("doc_id", "n_tokens")
    val got = TextOps.packStream(docs, "doc_id", "n_tokens",
        capacity = 10, shards = 1)
      .select($"doc_id", $"start_off", $"bin", $"straddles")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 0L, 0L, false), (2L, 4L, 0L, false),
      (3L, 8L, 0L, true), // tokens 8..11 straddle the bin 0/1 cut
      (4L, 12L, 1L, true))) // tokens 12..21 straddle bins 1/2
    // sharding: prefix sums are independent per shard
    val sharded = TextOps.packStream(docs, "doc_id", "n_tokens",
        capacity = 10, shards = 2)
      .select($"doc_id", $"shard", $"start_off")
      .as[(Long, Long, Long)].collect().toSet
    assert(sharded == Set((2L, 0L, 0L), (4L, 0L, 4L), // shard 0: ids 2,4
      (1L, 1L, 0L), (3L, 1L, 4L))) // shard 1: ids 1,3
  }
}
