package graft

import org.apache.spark.sql.functions._

import graft.ops.VocabOps

class VocabOpsSpec extends SparkSpec {
  import spark.implicits._

  test("buildVocab ranks by count desc then token; ids are 1-based") {
    val docs = Seq((1L, "b b b a a c"), (2L, "a b zz")).toDF("id", "text")
    val vocab = VocabOps.buildVocab(docs, "text", topN = 3)
      .as[(String, Int)].collect().toSeq.sortBy(_._2)
    // counts: b=4, a=3, c=1, zz=1 — the c/zz tie breaks on token order
    assert(vocab == Seq(("b", 1), ("a", 2), ("c", 3)))
  }

  test("encode preserves token order, maps OOV to 0, passes nulls through") {
    val docs = Seq((1L, "b b b a a c"), (2L, "a b zz"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val enc = VocabOps.encode(docs, "text", topN = 3).orderBy($"id")
      .select($"ids").as[Option[Seq[Int]]].collect().toSeq
    assert(enc == Seq(Some(Seq(1, 1, 1, 2, 2, 3)), Some(Seq(2, 1, 0)),
      None))
  }

  test("encode is a shuffle-free scan projection (no join, no exchange)") {
    // file-backed so ConvertToLocalRelation can't fold the projection away
    val dir = tmpDir("vocabenc")
    Seq((1L, "a b"), (2L, "b c")).toDF("id", "text")
      .write.mode("overwrite").parquet(dir)
    val vocab = Seq("a" -> 1, "b" -> 2)
    val plan = spark.read.parquet(dir).withColumn("ids",
        VocabOps.encodeColumn($"text", vocab))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"encode must not join:\n$plan")
    assert(plan.contains("vocab_encode"))
  }

  test("tokenization parity: normalize handles case and whitespace runs") {
    val docs = Seq((1L, "  The   THE the  ")).toDF("id", "text")
    val got = VocabOps.encode(docs, "text", topN = 1)
      .select($"ids").as[Seq[Int]].head()
    assert(got == Seq(1, 1, 1), "case/whitespace variants share one id")
  }

  test("encode refuses a vocab too large to collect to the driver") {
    val df = Seq("a b c").toDF("text")
    val e = intercept[IllegalArgumentException] {
      graft.ops.VocabOps.encode(df, "text", topN = graft.ops.VocabOps.MaxDriverVocab + 1)
    }
    assert(e.getMessage.contains("driver"), e.getMessage)
  }
}
