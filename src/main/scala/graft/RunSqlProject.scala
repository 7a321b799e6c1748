package graft

import graft.pipeline.SqlProject

/** CLI entry for declarative SQL projects — the engine-native `app.py`:
  * load models → run (WAP: build, audit, publish) → write the run report.
  *
  * Usage:
  * {{{
  * runMain graft.RunSqlProject <modelsDir> <lakeRoot>
  *   [--sources file]      # default <modelsDir>/sources.conf
  *   [--seeds dir]         # dbt seeds: CSVs published as ref-able tables
  *                         # (default <modelsDir>/seeds when present)
  *   [--vars k=v,k2=v2]    # dbt run vars for {{ var('k') }} — the
  *                         # backfill knob (e.g. --vars ds=2026-08-01)
  *   [--select sel] [--exclude sel]   # dbt selectors: name, name+, tag:t, tag:t+
  *   [--parallel]          # dependency-parallel stage execution
  *   [--report path.json]  # Elementary-style run report (+ .html twin)
  *   [--metrics dir]       # append per-run volume metrics (Elementary history)
  *   [--alerts path.jsonl] # file-notifier alert delivery on failed checks
  *   [--docs dir]          # dbt `docs generate`: write manifest.json +
  *                         # lineage.html (DAG + tests) for the project
  * }}}
  *
  * Exit code 1 on any failed stage (fail-fast like `app.py:61-64`).
  */
object RunSqlProject {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("graft-sql-project")
    val result = run(args, spark)
    spark.stop()
    if (!result.ok) sys.exit(1)
  }

  /** The CLI body, callable in-process (q154 drives the full arg-parse →
    * sources.conf → load → run path from the driver gate without the
    * session stop / exit-code side effects `main` adds). */
  def run(args: Array[String],
          spark: org.apache.spark.sql.SparkSession)
      : graft.pipeline.PipelineResult = {
    val pos = scala.collection.mutable.ArrayBuffer[String]()
    val opts = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--parallel" => opts("parallel") = "true"; i += 1
        case f if f.startsWith("--") =>
          require(i + 1 < args.length, s"$f needs a value")
          opts(f.stripPrefix("--")) = args(i + 1); i += 2
        case p => pos += p; i += 1
      }
    }
    require(pos.size == 2, "usage: RunSqlProject <modelsDir> <lakeRoot> [flags]")
    val Seq(modelsDir, lakeRoot) = pos.toSeq
    val sourcesPath = opts.getOrElse("sources", s"$modelsDir/sources.conf")
    val sources =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(sourcesPath)))
        SqlProject.parseSources(new String(
          java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(sourcesPath)), "UTF-8"))
      else Map.empty[String, org.apache.spark.sql.SparkSession =>
        org.apache.spark.sql.DataFrame]

    val seedsDir = opts.get("seeds").orElse(
      Some(s"$modelsDir/seeds").filter(d =>
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d))))

    // split on ',' only where a new k= pair starts, so values may contain
    // commas (list literals, CSV date ranges: --vars ds=2026-01-01,2026-01-02
    // is ONE var unless followed by another key=)
    val vars: Map[String, String] = opts.get("vars")
      .map(_.split(",(?=[A-Za-z_][A-Za-z0-9_]*=)")
        .filter(_.nonEmpty).map { kv =>
          val i = kv.indexOf('=')
          require(i > 0, s"--vars entry '$kv' is not k=v")
          kv.take(i) -> kv.drop(i + 1)
        }.toMap).getOrElse(Map.empty)

    opts.get("docs").foreach { dir =>
      SqlProject.writeDocs(modelsDir, dir, seedsDir)
      println(s"[docs] $dir/manifest.json $dir/lineage.html")
    }

    var p = SqlProject.load(spark, modelsDir, lakeRoot, sources, seedsDir, vars)
    opts.get("select").foreach(sel => p = p.select(sel))
    opts.get("exclude").foreach(sel => p = p.exclude(sel))
    opts.get("metrics").foreach { dir =>
      p = p.withMetrics(new graft.checks.MetricsStore(spark, dir),
        java.util.UUID.randomUUID().toString.take(8))
    }
    opts.get("alerts").foreach { path =>
      p = p.withAlerts(new graft.checks.Alerts.AlertManager(
        new graft.checks.Alerts.FileNotifier(path)))
    }

    val result =
      if (opts.contains("parallel")) p.runParallel(spark) else p.run(spark)
    result.stages.foreach { st =>
      println(f"[model] ${st.name}%-28s ok=${st.ok} " +
        f"version=${st.publishedVersion.getOrElse(-1L)} ${st.durationMs}ms" +
        st.error.map(e => s" error=${e.takeWhile(_ != '\n')}").getOrElse(""))
      st.checks.foreach(c => println(
        f"  [test] ${c.check}%-24s ${c.column}%-16s " +
          s"${if (c.passed) "pass" else s"FAIL (${c.violations} violations)"}"))
    }
    opts.get("report").foreach { path =>
      result.writeReport(path)
      result.writeReportHtml(path.stripSuffix(".json") + ".html")
      println(s"[report] $path")
    }
    result
  }
}
