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
    spark.stop()
  }
}
