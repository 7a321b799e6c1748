package graft

import graft.pipeline.CorpusPipeline

/** CLI entry: run the LLM corpus-curation pipeline (clean → quality gate →
  * exact+near dedup → chunk → stats) on the driver's documents table.
  *
  * Usage: `runMain graft.RunCorpus [sfDir] [lakeRoot] [--parallel]`
  */
object RunCorpus {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val pos = args.filterNot(_.startsWith("--"))
    val sfDir = pos.headOption.getOrElse("/root/testdata/sf0.01")
    val lake = pos.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-corpus").toString)
    val spark = GraftSession.getOrCreate("graft-corpus")

    val pipeline = CorpusPipeline.build(spark, CorpusPipeline.Config(sfDir, lake))
    val result =
      if (flags.contains("--parallel")) pipeline.runParallel(spark)
      else pipeline.run(spark)
    result.stages.foreach { st =>
      println(f"[stage] ${st.name}%-22s ok=${st.ok} ${st.durationMs}ms" +
        st.error.map(e => s" error=$e").getOrElse(""))
    }
    if (!result.ok) { println("[done] CORPUS PIPELINE FAILED"); sys.exit(1) }
    val stats = new graft.sinks.SnapshotTable(spark, s"$lake/corpus/stats").read()
    val row = stats.head()
    println(s"[done] docs=${row.getAs[Long]("n_docs")} " +
      s"tokens=${row.getAs[Long]("total_tokens")} " +
      s"chunks=${row.getAs[Long]("n_chunks")} " +
      s"avg_quality=${row.getAs[Double]("avg_quality")} lake=$lake")
    result.writeReport(s"$lake/run_report.json")

    // incrementally-maintained token ranking per source: one SpaceSaving
    // fold of the curated docs into the heavy-hitter store, answered
    // from the summaries alone (the corpus-stats twin of `wc | sort`)
    locally {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val spec = graft.ops.HeavyHitterAgg.Spec(Seq("source"), "token",
        capacity = 256)
      val store = new graft.sinks.AppendOnlyStore(spark,
        s"$lake/corpus/token_hh", prefixCol = "__agg_key", prefixChars = 1)
      val tokens = new graft.sinks.SnapshotTable(spark, s"$lake/corpus/deduped")
        .read().select($"source",
          explode(split(lower($"text"), "[^a-z0-9]+")).as("token"))
        .where(length($"token") >= 3)
      graft.ops.HeavyHitterAgg.appendBatch(store, tokens, spec, batchId = 0L)
      graft.ops.HeavyHitterAgg.current(store, spec, k = 3)
        .orderBy($"source", $"rk").collect()
        .foreach(r => println(s"[tokens] ${r.getAs[String]("source")} " +
          s"#${r.getAs[Long]("rk")} ${r.getAs[String]("item")} " +
          s"(${r.getAs[Long]("est_count")})"))
    }
    spark.stop()
  }
}
