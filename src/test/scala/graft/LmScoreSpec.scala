package graft

import graft.ops.TextOps

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("typical-transition docs outscore garbled ones; short docs excluded") {
    val common = (1 to 30).map(i =>
      (i.toLong, "the cat sat on the mat and the dog sat on the rug"))
    val docs = (common :+
      (100L, "rug mat zyx dog qpv the on cat wvu sat") :+ // atypical order
      (101L, "hi")).toDF("doc_id", "text")                // < 2 tokens
    val out = TextOps.bigramLmScores(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(!out.contains(101L))
    assert(out.contains(100L) && out.contains(1L))
    assert(out(1L) > out(100L),
      s"common-phrasing doc ${out(1L)} should beat garbled ${out(100L)}")
  }

  test("scores are partitioning-invariant (sequential fold, not float sum)") {
    val docs = (1 to 50).map(i =>
      (i.toLong, s"alpha beta gamma delta epsilon zeta eta theta word$i end"))
      .toDF("doc_id", "text")
    val a = TextOps.bigramLmScores(docs.repartition(1), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = TextOps.bigramLmScores(docs.repartition(13), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a === b)
  }
}
