package graft

import org.apache.spark.sql.functions._

import graft.pipeline.CorpusPipeline

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("corpus pipeline curates documents end-to-end with near-dup removal") {
    val root = tmpDir("corpus")
    // seed the standard documents table into a custom sfDir, with planted
    // near-dups and a junk doc that must fail the quality gate
    val base = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(100).select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    val nearDup = base.filter($"doc_id" === 0)
      .select(($"doc_id" + 100000).as("doc_id"),
        concat($"text", lit(" tailword")).as("text"), $"lang", $"source", $"n_chars")
    val junk = Seq((200000L, "!!! ## !!", "en", "junk", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    base.unionByName(nearDup).unionByName(junk)
      .coalesce(1).write.parquet(s"$root/sf/documents.parquet")

    val cfg = CorpusPipeline.Config(s"$root/sf", s"$root/lake",
      minQuality = 0.2, minTokens = 5, nearDupThreshold = 0.5)
    val result = CorpusPipeline.build(spark, cfg).run(spark, _ => ())
    assert(result.ok, result.stages.map(s => s"${s.name}:${s.error}").mkString(";"))

    val deduped = new graft.sinks.SnapshotTable(spark, s"$root/lake/corpus/deduped").read()
    val ids = deduped.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(0L) && !ids.contains(100000L)) // near-dup dropped, original kept
    assert(!ids.contains(200000L)) // junk failed quality gate
    // the tiny-vocab synthetic corpus contains a few genuine intra-corpus
    // near-dup pairs at this threshold — every dropped base doc must be
    // the higher id of a verified pair, nothing else may be dropped
    val pairs = graft.ops.DedupOps.minhashNearDups(
        base.unionByName(nearDup), "text", "doc_id", threshold = 0.5)
      .select("id2").collect().map(_.getLong(0)).toSet
    val droppedBase = (0L until 100L).toSet -- ids
    assert(droppedBase.subsetOf(pairs), s"unexpected drops: ${droppedBase -- pairs}")
    assert(deduped.count() == 100 - droppedBase.size)

    val chunks = new graft.sinks.SnapshotTable(spark, s"$root/lake/corpus/chunks").read()
    assert(chunks.count() >= deduped.count()) // every doc yields >=1 chunk
    assert(chunks.columns.contains("lang")) // partition column readable
    val stats = new graft.sinks.SnapshotTable(spark, s"$root/lake/corpus/stats").read().head()
    assert(stats.getAs[Long]("n_docs") == deduped.count())
    assert(stats.getAs[Long]("n_chunks") == chunks.count())
    // the LM gate annotated every surviving doc (default: drop none)
    assert(deduped.columns.contains("avg_logp"))
    // every surviving doc carries a split; all three splits materialize
    assert(deduped.columns.contains("split"))
    assert(deduped.filter(col("split").isNull).count() == 0)
    // gopher gate annotated its rule flags on every surviving doc
    assert(deduped.columns.contains("gopher_pass"))
    assert(deduped.columns.contains("r_stopwords"))
    // terminal export: shard dirs on disk + snapshotted manifest whose
    // totals reconcile with the deduped table
    val shardDirs = new java.io.File(s"$root/lake/corpus/shards")
      .listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    val manifest = new graft.sinks.SnapshotTable(spark,
      s"$root/lake/corpus/shard_manifest").read()
    assert(manifest.agg(sum(col("n_rows"))).head().getLong(0)
      == deduped.count())
    val shardRows = spark.read
      .option("basePath", s"$root/lake/corpus/shards")
      .parquet(s"$root/lake/corpus/shards")
    assert(shardRows.count() == deduped.count())
  }

  test("lm gate drops the lowest-scoring fraction when enabled") {
    val root = tmpDir("corpus-lm")
    val docs = ((1 to 30).map(i =>
        (i.toLong, s"the cat sat on the mat and the dog sat on the rug $i",
          "en", "good", 50L)) :+
      (500L, "rug zz mat qq dog vv the on cat ww sat xx mat yy dog uu cat",
        "en", "garbled", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$root/sf/documents.parquet")

    val cfg = CorpusPipeline.Config(s"$root/sf", s"$root/lake",
      minQuality = 0.0, minTokens = 2, nearDupThreshold = 0.99,
      lmDropFraction = 0.04) // bottom ~4% of 31 docs = the worst one
    val result = CorpusPipeline.build(spark, cfg).run(spark, _ => ())
    assert(result.ok, result.stages.map(s => s"${s.name}:${s.error}").mkString(";"))
    val ids = new graft.sinks.SnapshotTable(spark, s"$root/lake/corpus/deduped")
      .read().select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(500L), "garbled doc must fail the LM gate")
    assert((1L to 30L).forall(ids.contains), s"over-dropped: $ids")
  }

  test("a gate that empties the corpus FAILS the run instead of warning") {
    // regression: RowCountBetween defaults to Warn severity — a filter
    // wiping the corpus used to sail through and crash a later stage;
    // the corpus gates now carry Error severity explicitly
    val root = tmpDir("corpus-empty")
    val docs = (1 to 20).map(i =>
        (i.toLong, s"## ### #### $i", "en", "symbols", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$root/sf/documents.parquet")
    val cfg = CorpusPipeline.Config(s"$root/sf", s"$root/lake",
      minQuality = 0.0, minTokens = 1)
    val result = CorpusPipeline.build(spark, cfg).run(spark, _ => ())
    assert(!result.ok, "symbol-soup corpus must fail the gopher gate")
    val failed = result.stages.filter(!_.ok).map(_.name)
    assert(failed == Seq("corpus_gopher_gate"), failed.toString)
  }
}
