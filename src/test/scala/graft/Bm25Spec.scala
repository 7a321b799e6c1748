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
}
