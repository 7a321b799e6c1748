package graft

import graft.ops.DedupOps

/** Benchmark decontamination: n-gram overlap against an eval set. */
class DecontaminationSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "completely different words about spark query planning today"),
    (3L, "we embed the quick brown fox jumps inside a longer training doc"),
    (4L, "short doc")).toDF("doc_id", "text")

  private val bench = Seq(
    "the quick brown fox jumps over a fence").toDF("bench_text")

  test("flags docs sharing an n-gram with the benchmark, leaves the rest") {
    val got = DedupOps.contaminationFlags(corpus, "text", "doc_id",
        bench, "bench_text", n = 5)
      .select($"doc_id", $"is_contaminated").as[(Long, Boolean)]
      .collect().toMap
    // docs 1 and 3 contain "the quick brown fox jumps"; 2 shares nothing;
    // 4 is shorter than n (whole-text fallback, no match)
    assert(got == Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
  }

  test("decontaminate drops flagged docs and keeps original columns") {
    val clean = DedupOps.decontaminate(corpus, "text", "doc_id",
      bench, "bench_text", n = 5)
    assert(clean.columns.toSeq == corpus.columns.toSeq)
    assert(clean.select($"doc_id").as[Long].collect().toSet == Set(2L, 4L))
  }

  test("sub-n benchmark text falls back to whole-string membership") {
    val tinyBench = Seq("short doc").toDF("bench_text")
    val got = DedupOps.contaminationFlags(corpus, "text", "doc_id",
        tinyBench, "bench_text", n = 5)
      .filter($"is_contaminated").select($"doc_id").as[Long].collect().toSet
    assert(got == Set(4L)) // exact whole-text collision on the short doc
  }
}
