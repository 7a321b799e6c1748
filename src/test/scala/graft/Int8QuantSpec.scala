package graft

import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

class Int8QuantSpec extends SparkSpec {
  import spark.implicits._

  /** 200 deterministic random 16-dim vectors: pairwise cosines are
    * well-separated (gaps >> int8 quantization error), so the exact
    * top-k is stable under coarse-quantized candidate selection. */
  lazy val corpus = {
    val rnd = new scala.util.Random(7L)
    (0 until 200).map { i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("quantization is bounded, sign-preserving, and near-lossless") {
    val q = SimilarityOps.quantizeInt8(corpus).select("embedding", "qvec", "scale")
      .collect()
    q.foreach { r =>
      val v = r.getSeq[Float](0)
      val qv = r.getSeq[Byte](1)
      val s = r.getDouble(2)
      assert(qv.forall(b => b >= -127 && b <= 127))
      v.zip(qv).foreach { case (x, b) =>
        assert(math.abs(b * s - x) <= s / 2 + 1e-6,
          s"dequantized $b*$s vs $x")
      }
    }
  }

  test("zero vectors quantize to zeros with scale 0") {
    val z = Seq((1L, Seq.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val r = SimilarityOps.quantizeInt8(z).select("qvec", "scale").head()
    assert(r.getSeq[Byte](0).forall(_ == 0) && r.getDouble(1) == 0.0)
  }

  test("int8 top-k with overfetch recovers the exact brute-force top-k") {
    val queries = corpus.filter($"vec_id" < 4)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val exact = SimilarityOps.bruteForceTopK(corpus, queries, k = 5)
      .select("q_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val approx = SimilarityOps.int8TopK(corpus, queries, k = 5, overfetch = 4)
      .select("q_id", "vec_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(approx === exact)
  }

  test("plan gate: coarse stage has no Sort and no vector shuffle") {
    val queries = corpus.filter($"vec_id" < 4)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val df = SimilarityOps.int8TopK(corpus, queries, k = 5)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("collect_top_k"), s"heap top-k expected in: $p")
    assert(!p.contains("Window"), "coarse/re-rank must not use window sort")
    assert(p.contains("dot_product_i8"), s"int8 kernel expected in: $p")
  }
}
