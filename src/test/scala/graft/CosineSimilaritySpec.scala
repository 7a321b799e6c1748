package graft

import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity
import graft.ops.SimilarityOps

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches declarative form bit-for-bit on real vectors") {
    CosineSimilarity.register(spark)
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = emb.select($"vec_id".as("id1"), $"embedding".as("v1")).limit(50)
    val b = emb.select($"vec_id".as("id2"), $"embedding".as("v2")).limit(50)
    val pairs = a.crossJoin(b).filter($"id1" < $"id2")
    val diff = pairs.select(
        SimilarityOps.cosine($"v1", $"v2").as("decl"),
        CosineSimilarity($"v1", $"v2").as("fast"))
      .filter($"decl" =!= $"fast") // bitwise double equality
      .count()
    assert(diff == 0)
  }

  test("GraftExtensions exposes the functions without explicit register") {
    // SharedSpark is built via GraftSession.builder → extensions active
    assert(spark.sql("SELECT cosine_similarity(array(1.0f, 0.0f), array(1.0f, 0.0f))")
      .head().getDouble(0) == 1.0)
    assert(spark.sql("SELECT dot_product_f(array(2.0f, 3.0f), array(4.0f, 5.0f))")
      .head().getDouble(0) == 23.0)
  }

  test("SQL surface works and nulls on mismatch / zero vectors") {
    CosineSimilarity.register(spark)
    Seq((Seq(1f, 0f), Seq(1f, 0f))).toDF("a", "b").createOrReplaceTempView("vv")
    assert(spark.sql("SELECT cosine_similarity(a, b) FROM vv").head().getDouble(0) == 1.0)
    val r = Seq((Seq(1f, 2f), Seq(1f, 2f, 3f), Seq(0f, 0f)))
      .toDF("a", "b", "z")
      .select(CosineSimilarity($"a", $"b").as("mismatch"),
        CosineSimilarity($"a", $"z".cast("array<float>")).as("zeroRight"))
      .head()
    assert(r.isNullAt(0))
    // zero vector against 2-dim a: lengths match (both 2) → zero-norm null
    assert(r.isNullAt(1))
  }

  test("codegen path is active (no fallback) and faster than declarative") {
    CosineSimilarity.register(spark)
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val pairs = emb.select($"vec_id".as("id1"), $"embedding".as("v1"))
      .crossJoin(emb.select($"vec_id".as("id2"), $"embedding".as("v2")))
    def timeIt(c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      pairs.select(sum(c)).collect()
      (System.nanoTime() - t0) / 1e9
    }
    timeIt(CosineSimilarity($"v1", $"v2")) // warm
    timeIt(SimilarityOps.cosine($"v1", $"v2"))
    val fast = timeIt(CosineSimilarity($"v1", $"v2"))
    val decl = timeIt(SimilarityOps.cosine($"v1", $"v2"))
    info(f"fused=$fast%.2fs declarative=$decl%.2fs (250k pairs)")
    assert(fast < decl, s"fused $fast not faster than declarative $decl")
  }
}
