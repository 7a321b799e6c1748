package graft

import graft.ops.SimilarityOps

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  /** 120 random vectors + exact copies of the first 10 at ids 1000+. */
  lazy val corpus = {
    val rnd = new scala.util.Random(3L)
    val base = (0 until 120).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    (base ++ base.take(10).map { case (i, v) => (1000L + i, v) })
      .toDF("vec_id", "embedding")
  }

  test("exact semantic copies are dropped, originals kept") {
    val out = SimilarityOps.semDedup(corpus, threshold = 0.999, nlist = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    (0 until 10).foreach { i =>
      assert(out(i.toLong)._1 == 1L, s"original $i must be kept")
      assert(out(1000L + i) == ((0L, Some(i.toLong))),
        s"copy of $i must point at it, got ${out(1000L + i)}")
    }
    // vectors with no near-identical twin survive
    assert(out.count(_._2._1 == 1L) == 120)
  }

  test("threshold gates the dup decision") {
    val all = SimilarityOps.semDedup(corpus, threshold = -1.0, nlist = 1)
      .filter($"keep" === 1).count()
    // with cos >= -1 inside one cell, only the global smallest id survives
    assert(all == 1L)
  }
}
