package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterEach

import graft.ops.SimilarityOps

/** The ANN family's query-batch broadcast guard (the GraphIvmGuardSpec
  * pattern applied to `SimilarityOps.guardedQ`): with
  * `spark.graft.graphIvm.broadcastRowLimit = 0` every query-batch
  * broadcast is dropped and the planner falls back to a shuffle join
  * (equi-keyed probes) or a shuffle cartesian (brute-force scans) — the
  * posture a corpus-sized "query batch" gets instead of a driver OOM.
  * Both regimes must be BIT-IDENTICAL across every ANN entry point; the
  * default regime is the one the q29/q30/q53/q64/q78/q79/q88/q121
  * oracles already pin. */
class AnnGuardSpec extends SparkSpec with BeforeAndAfterEach {
  import spark.implicits._

  private val LimitKey = "spark.graft.graphIvm.broadcastRowLimit"

  override def afterEach(): Unit = {
    spark.conf.unset(LimitKey)
    super.afterEach()
  }

  /** 10 clusters × 30 members, deterministic — the SimilarityOpsSpec
    * fixture, small enough that a forced shuffle regime stays fast. */
  private lazy val corpus = {
    val rnd = new scala.util.Random(11)
    val dim = 64
    val centers = Seq.fill(10)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    (0 until 300).map { i =>
      val c = centers(i % 10)
      val v = c.map(x => x + rnd.nextGaussian().toFloat * 0.1f)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  private lazy val queries = corpus.filter($"vec_id" < 8)
    .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))

  private def rows(df: DataFrame): Set[(Long, Long, Double, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet

  /** Runs `path` under the default regime and under limit=0 (every
    * guardedQ falls back to the unhinted join) and asserts equality. */
  private def bothRegimes(name: String)(path: => DataFrame): Unit = {
    spark.conf.unset(LimitKey)
    val hinted = rows(path)
    spark.conf.set(LimitKey, "0")
    val shuffled = rows(path)
    assert(hinted == shuffled,
      s"$name: guarded-broadcast and shuffle-fallback regimes diverge")
    assert(hinted.nonEmpty, s"$name: empty result can't pin regimes")
  }

  test("brute-force top-k is bit-identical with the broadcast dropped") {
    bothRegimes("bruteForceTopK") {
      SimilarityOps.bruteForceTopK(corpus, queries, k = 5)
    }
  }

  test("LSH top-k (single and multi-probe) is bit-identical with the broadcast dropped") {
    bothRegimes("lshTopK") {
      SimilarityOps.lshTopK(corpus, queries, k = 5, bits = 4)
    }
    bothRegimes("lshTopKMultiProbe") {
      SimilarityOps.lshTopKMultiProbe(corpus, queries, k = 5, bits = 4, probes = 2)
    }
  }

  test("IVF top-k is bit-identical with the broadcast dropped") {
    bothRegimes("ivfTopK") {
      SimilarityOps.ivfTopK(corpus, queries, k = 5, nlist = 8, nprobe = 3)
    }
  }

  test("int8 rerank top-k is bit-identical with the broadcast dropped") {
    bothRegimes("int8TopK") {
      SimilarityOps.int8TopK(corpus, queries, k = 5)
    }
  }

  test("PQ and IVF-PQ top-k are bit-identical with the broadcast dropped") {
    bothRegimes("pqTopK") {
      SimilarityOps.pqTopK(corpus, queries, k = 5, m = 8, ksub = 8)
    }
    bothRegimes("ivfPqTopK") {
      SimilarityOps.ivfPqTopK(corpus, queries, k = 5,
        nlist = 8, nprobe = 3, m = 8, ksub = 8)
    }
  }
}
