package graft

import org.apache.spark.sql.functions._

import graft.ops.{IncrementalTextIndex, TextOps}

/** Maintained inverted index + BM25 serving: equality with the batch
  * recompute over the net corpus through insert / takedown / edit /
  * replay / compaction, plus the serve-probe pruning gate. */
class IncrementalTextIndexSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("spark", "fast")

  private def corpus = Seq(
    1L -> "spark is fast and spark is neat",
    2L -> "ducks row the boat",
    3L -> "fast queries need fast plans",
    4L -> "",
    5L -> "spark spark spark",
    6L -> "plain words only here").toDF("doc_id", "text")

  private def idx() =
    IncrementalTextIndex.stores(spark, tmpDir("textidx"), "doc_id")

  /** e6-quantized (id, dl, score) set from a serve frame. */
  private def served(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_id", $"doc_len",
        floor($"score" * 1e6 + 0.5).cast("long").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def batchBm25(docs: org.apache.spark.sql.DataFrame) =
    served(TextOps.bm25(docs, "text", "doc_id", terms))

  test("insert/takedown/edit/replay/compact all equal the batch recompute") {
    val st = idx()
    val docs = corpus
    IncrementalTextIndex.appendDelta(st, docs.filter($"doc_id" <= 3), "text", 0L)
    IncrementalTextIndex.appendDelta(st, docs.filter($"doc_id" > 3), "text", 1L)
    assert(served(IncrementalTextIndex.bm25(st, terms)) == batchBm25(docs))
    // takedown of doc 5 (a pure-'spark' doc): df(spark), N, avgdl all move
    val takedown = docs.filter($"doc_id" === 5)
      .withColumn("__delta", lit(-1L))
    IncrementalTextIndex.appendDelta(st, takedown, "text", 2L, Some("__delta"))
    val after5 = docs.filter($"doc_id" =!= 5)
    assert(served(IncrementalTextIndex.bm25(st, terms)) == batchBm25(after5))
    // replay of the takedown batch id: no-op
    IncrementalTextIndex.appendDelta(st, takedown, "text", 2L, Some("__delta"))
    assert(served(IncrementalTextIndex.bm25(st, terms)) == batchBm25(after5))
    // edit doc 6: gains the term 'spark' (−old +new, one batch)
    val oldRow = docs.filter($"doc_id" === 6)
    val edit = oldRow.select($"doc_id", $"text", lit(-1L).as("__delta"))
      .unionByName(oldRow.select($"doc_id",
        concat($"text", lit(" spark")).as("text"), lit(1L).as("__delta")))
    IncrementalTextIndex.appendDelta(st, edit, "text", 3L, Some("__delta"))
    val netDocs = after5.withColumn("text",
      when($"doc_id" === 6, concat($"text", lit(" spark")))
        .otherwise($"text"))
    assert(served(IncrementalTextIndex.bm25(st, terms)) == batchBm25(netDocs))
    // whole-index compaction: result-invariant
    IncrementalTextIndex.compact(st)
    assert(served(IncrementalTextIndex.bm25(st, terms)) == batchBm25(netDocs))
    // a REAL post-compaction batch (the r7 hole): late insert still lands
    IncrementalTextIndex.appendDelta(st,
      Seq(7L -> "spark arrives late").toDF("doc_id", "text"), "text", 4L)
    assert(served(IncrementalTextIndex.bm25(st, terms)) ==
      batchBm25(netDocs.unionByName(
        Seq(7L -> "spark arrives late").toDF("doc_id", "text"))))
  }

  test("postings state nets takedowns out; doc lengths follow") {
    val st = idx()
    IncrementalTextIndex.appendDelta(st, corpus, "text", 0L)
    IncrementalTextIndex.appendDelta(st,
      corpus.filter($"doc_id" === 1).withColumn("__delta", lit(-1L)),
      "text", 1L, Some("__delta"))
    val post = IncrementalTextIndex.currentPostings(st)
    assert(post.filter($"doc_id" === 1).count() == 0)
    assert(post.filter($"term" === "spark").select($"doc_id")
      .collect().map(_.getLong(0)).toSet == Set(5L))
    val dls = IncrementalTextIndex.currentDocs(st)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dls == Map(2L -> 4L, 3L -> 5L, 4L -> 0L, 5L -> 3L, 6L -> 4L))
  }

  test("the serve probe partition-prunes the postings store by term key") {
    val st = idx()
    IncrementalTextIndex.appendDelta(st, corpus, "text", 0L)
    val plan = IncrementalTextIndex.bm25(st, terms)
      .queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*prefix[^\\]]*\\]".r
    assert(pf.findFirstIn(plan).isDefined,
      s"expected a non-empty prefix partition filter on the postings scan")
  }

  test("top-k equals the full ranking's quantized head, pad included") {
    val st = idx()
    IncrementalTextIndex.appendDelta(st, corpus, "text", 0L)
    def fullHead(k: Int): Seq[(Long, Long, Long)] =
      IncrementalTextIndex.bm25(st, terms)
        .select($"doc_id", $"doc_len",
          floor($"score" * 1e4 + 0.5).cast("long").as("score_e4"))
        .orderBy($"score_e4".desc, $"doc_id").limit(k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    def topK(k: Int): Seq[(Long, Long, Long)] =
      IncrementalTextIndex.bm25TopK(st, terms, k).orderBy($"rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // k=2: inside the matched tier. k=5: crosses into the zero-score pad
    // (only 3 docs match 'spark'/'fast'). k=10 > corpus: everything.
    assert(topK(2) == fullHead(2))
    assert(topK(5) == fullHead(5))
    assert(topK(10) == fullHead(6)) // 6 live docs in total
    // ranks are 1..n on the same order
    assert(IncrementalTextIndex.bm25TopK(st, terms, 5)
      .orderBy($"rank").select($"rank").as[Long].collect().toSeq ==
      (1L to 5L))
  }

  test("top-k scoring never joins the full doc-length state") {
    val st = idx()
    IncrementalTextIndex.appendDelta(st, corpus, "text", 0L)
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val exec = IncrementalTextIndex.bm25TopK(st, terms, 3)
      .queryExecution.executedPlan
    // the candidate→doc-length join must be INNER (candidate-bounded),
    // never the full-ranking LeftOuter that scores every live doc
    val outer = exec.toString.contains("LeftOuter")
    assert(!outer, s"top-k serve plans a corpus-wide outer join:\n$exec")
  }
}
