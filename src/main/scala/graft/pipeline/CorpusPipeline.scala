package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checks.Checks.{Error, NotNull, RowCountBetween, Unique}
import graft.ops.{CurationOps, DedupOps, TextOps}
import graft.sinks.SnapshotTable
import graft.sources.Tables

/** End-to-end LLM training-corpus curation pipeline: the LLM-scale
  * operators composed through the same DAG/WAP machinery as the CDC
  * pipeline — clean → quality-gate → exact dedup → near dedup → chunk →
  * corpus stats. Every stage is a snapshot table (auditable, time
  * travel), every filter is declarative (one projection/shuffle per
  * stage), and nothing collects to the driver except final stats rows.
  *
  * This is the 100 TB shape: per-doc work (clean, metrics, chunk) is
  * embarrassingly parallel projections; the only shuffles are the two
  * dedup key-exchanges and the chunk write's date/lang partitioning.
  */
object CorpusPipeline {

  final case class Config(
      sfDir: String,
      lakeRoot: String,
      minQuality: Double = 0.3,
      minTokens: Long = 10,
      nearDupThreshold: Double = 0.5,
      /** Drop the lowest-scoring fraction of docs by bigram-LM avg_logp
        * (0.0 = annotate only — every doc still gains the score column). */
      lmDropFraction: Double = 0.0,
      /** Deterministic split assignment written on every surviving doc
        * (md5-keyed; growth-stable — see CurationOps.hashSplit). */
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01),
      /** Gopher word-count lower bound for the structural-rule gate
        * (the published 50 assumes web documents; size to corpus). */
      gopherMinWords: Long = 10L,
      /** Terminal training-shard export count. */
      exportShards: Int = 4)

  def build(spark: SparkSession, cfg: Config): Pipeline = {
    val cleanTable = new SnapshotTable(spark, s"${cfg.lakeRoot}/corpus/clean")
    val dedupTable = new SnapshotTable(spark, s"${cfg.lakeRoot}/corpus/deduped")
    val chunkTable = new SnapshotTable(spark, s"${cfg.lakeRoot}/corpus/chunks")
    val statsTable = new SnapshotTable(spark, s"${cfg.lakeRoot}/corpus/stats")

    val manifestTable =
      new SnapshotTable(spark, s"${cfg.lakeRoot}/corpus/shard_manifest")
    new Pipeline(Seq(
      Stage(
        name = "corpus_clean",
        tags = Set("corpus", "clean"),
        build = (s, _) => {
          // canonicalize BEFORE redaction/fingerprinting: NFC + control
          // strip (TextOps.cleanText) so canonically-equivalent variants
          // of the same document can never split a duplicate class or
          // dodge a PII pattern via a decomposed accent
          val docs = Tables.load(s, cfg.sfDir, "documents")
            .withColumn("text",
              TextOps.redactPii(TextOps.cleanText(col("text"))))
          TextOps.withMetrics(docs, "text", includeLang = true)
        },
        checks = Seq(NotNull("doc_id"), Unique(Seq("doc_id"))),
        sink = Some(Overwrite(cleanTable))),
      Stage(
        name = "corpus_quality_gate",
        deps = Seq("corpus_clean"),
        tags = Set("corpus", "filter"),
        build = (_, ctx) => ctx("corpus_clean")
          .filter(col("quality") >= cfg.minQuality &&
            col("n_tokens") >= cfg.minTokens),
        checks = Seq(RowCountBetween(min = 1, severity = Error))),
      Stage(
        // Gopher rule gate (Rae et al. 2021): enforce the
        // domain-independent rules (word count, symbol ratio, alpha
        // ratio); mean-word-length and stopwords are ANNOTATED, not
        // enforced — both assume English web prose (wrong to
        // hard-require on code, CJK, or synthetic corpora). All five
        // flags stay on the rows for filterFunnel-style attribution.
        name = "corpus_gopher_gate",
        deps = Seq("corpus_quality_gate"),
        tags = Set("corpus", "filter"),
        build = (_, ctx) => TextOps.gopherQualityFlags(
            ctx("corpus_quality_gate"), "text",
            minWords = cfg.gopherMinWords)
          .filter(col("r_word_count") && col("r_symbol_ratio") &&
            col("r_alpha_ratio")),
        checks = Seq(RowCountBetween(min = 1, severity = Error))),
      Stage(
        // CCNet-style LM filter: score every doc's token transitions
        // under the corpus's own bigram model; drop the configured
        // bottom fraction (exact quantile — one driver scalar). Docs too
        // short to score (< 2 tokens) carry a null score and are kept.
        name = "corpus_lm_gate",
        deps = Seq("corpus_gopher_gate"),
        tags = Set("corpus", "filter"),
        build = (_, ctx) => {
          val docs = ctx("corpus_gopher_gate")
          val scores = TextOps.bigramLmScores(docs, "text", "doc_id")
            .select(col("doc_id"), col("avg_logp"))
          val annotated = docs.join(scores, Seq("doc_id"), "left")
          if (cfg.lmDropFraction <= 0.0) annotated
          else {
            // approxQuantile returns an EMPTY array on an empty input —
            // an upstream gate may legitimately pass zero scoreable docs
            val cuts = annotated.filter(col("avg_logp").isNotNull)
              .stat.approxQuantile("avg_logp", Array(cfg.lmDropFraction), 0.0)
            if (cuts.isEmpty) annotated
            else annotated.filter(
              col("avg_logp").isNull || col("avg_logp") >= cuts(0))
          }
        },
        checks = Seq(RowCountBetween(min = 1, severity = Error))),
      Stage(
        name = "corpus_exact_dedup",
        deps = Seq("corpus_lm_gate"),
        tags = Set("corpus", "dedup"),
        build = (_, ctx) => DedupOps.exactDedup(
          ctx("corpus_lm_gate"), "text", "doc_id"),
        checks = Seq(Unique(Seq("fingerprint")))),
      Stage(
        name = "corpus_near_dedup",
        deps = Seq("corpus_exact_dedup"),
        tags = Set("corpus", "dedup"),
        build = (_, ctx) => {
          val docs = ctx("corpus_exact_dedup")
          val pairs = DedupOps.minhashNearDups(docs, "text", "doc_id",
            threshold = cfg.nearDupThreshold)
          // survivorship: drop the higher id of each near-dup pair;
          // then stamp the reproducible train/val/test assignment —
          // AFTER all filters/dedup so no split leaks into another via
          // a near-duplicate surviving in a different split
          CurationOps.hashSplit(
            docs.join(pairs.select(col("id2").as("doc_id")).distinct(),
              Seq("doc_id"), "left_anti"),
            "doc_id", cfg.splits, seed = "corpus")
        },
        checks = Seq(Unique(Seq("doc_id")),
          RowCountBetween(min = 1, severity = Error)),
        sink = Some(Overwrite(dedupTable))),
      Stage(
        name = "corpus_chunks",
        deps = Seq("corpus_near_dedup"),
        tags = Set("corpus", "chunk"),
        build = (_, ctx) => ctx("corpus_near_dedup")
          .select(col("doc_id"), col("lang"),
            posexplode(TextOps.chunk(col("text"), chunkTokens = 64, overlap = 16))
              .as(Seq("chunk_idx", "chunk")))
          .withColumn("chunk_tokens", TextOps.tokenCount(col("chunk"))),
        checks = Seq(NotNull("chunk")),
        sink = Some(Overwrite(chunkTable, partitionBy = Seq("lang")))),
      Stage(
        // terminal export: deterministic md5-mod training shards with an
        // aggregate-built manifest (sinks/ShardedExport); the manifest
        // is also snapshotted so the export is auditable/time-travelable
        name = "corpus_export",
        deps = Seq("corpus_near_dedup"),
        tags = Set("corpus", "export"),
        build = (s, ctx) => graft.sinks.ShardedExport.write(
          ctx("corpus_near_dedup"), s"${cfg.lakeRoot}/corpus/shards",
          cfg.exportShards, idCol = "doc_id", tokenCol = "n_tokens",
          seed = "corpus"),
        checks = Seq(RowCountBetween(min = 1, severity = Error),
          Unique(Seq("shard"))),
        sink = Some(Overwrite(manifestTable))),
      Stage(
        name = "corpus_stats",
        deps = Seq("corpus_near_dedup", "corpus_chunks"),
        tags = Set("corpus", "stats"),
        build = (_, ctx) => {
          val docs = ctx("corpus_near_dedup")
          val chunks = ctx("corpus_chunks")
          docs.agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            round(avg(col("quality")), 4).as("avg_quality"),
            round(avg(TextOps.compressionRatio(col("text"))), 4)
              .as("avg_compression"))
            .crossJoin(chunks.agg(
              count(lit(1)).as("n_chunks"),
              sum(col("chunk_tokens")).as("total_chunk_tokens")))
        },
        sink = Some(Overwrite(statsTable)))))
  }
}
