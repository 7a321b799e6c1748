package graft

import org.apache.spark.sql.DataFrame

/** Driver-run benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR plus the 2M-event CDC pipeline, printing ONE JSON
  * line. Materialization uses the `noop` sink — unlike `count()`, it
  * cannot let the optimizer prune away the projections being measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // same full engine session as Verify (extensions + AQE)
    val spark = GraftSession.builder("graft-bench", cores = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Host-noise-immune signal: wall seconds on a shared VM vary ~8× on
    // IO-heavy queries across boots (round-5 adjudication), so every
    // sample also records executor CPU time and shuffle-write bytes via
    // a job-group-scoped listener — figures the page cache and
    // neighboring tenants cannot touch. They ride the committed artifact
    // only; the stdout line stays the driver's fixed median contract.
    val stageGroup = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val groupCpu = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.AtomicLong]()
    val groupShuffle = new java.util.concurrent.ConcurrentHashMap[
      String, java.util.concurrent.atomic.AtomicLong]()
    def acc(m: java.util.concurrent.ConcurrentHashMap[
        String, java.util.concurrent.atomic.AtomicLong], g: String) =
      m.computeIfAbsent(g,
        _ => new java.util.concurrent.atomic.AtomicLong)
    // Streaming attribution: foreachBatch / stream-drain micro-batches
    // run on StreamExecution threads under the QUERY's own job group,
    // never the bench group — keyed on group alone their CPU lands
    // nowhere (the r6 artifact under-reported exactly the IO-heavy
    // streaming queries the signal was built to adjudicate). Samples run
    // strictly serially, so ANY job that starts while a sample is active
    // belongs to that sample: jobs without a bench group fall back to
    // the currently-active one.
    @volatile var activeGroup: String = null
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val g0 = Option(js.properties)
            .map(_.getProperty("spark.jobGroup.id")).orNull
          val g = if (g0 != null && g0.startsWith("bench-")) g0
                  else activeGroup
          if (g != null)
            js.stageIds.foreach(id => stageGroup.put(id, g))
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val g = stageGroup.get(sc.stageInfo.stageId)
          if (g != null) {
            acc(groupCpu, g).addAndGet(sc.stageInfo.taskMetrics.executorCpuTime)
            acc(groupShuffle, g)
              .addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
          }
        }
      })
    var groupSeq = 0
    // per-query per-sample (cpu seconds, shuffle bytes, GC seconds),
    // parallel to raw
    val rawCpu = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val rawShuffle = scala.collection.mutable.LinkedHashMap[String, Seq[Long]]()
    val rawGc = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    var currentQuery: String = ""
    def recordSample(cpuS: Double, shufB: Long, gcS: Double): Unit = {
      rawCpu(currentQuery) = rawCpu.getOrElse(currentQuery, Seq.empty) :+ cpuS
      rawShuffle(currentQuery) =
        rawShuffle.getOrElse(currentQuery, Seq.empty) :+ shufB
      rawGc(currentQuery) = rawGc.getOrElse(currentQuery, Seq.empty) :+ gcS
    }
    // Whole-JVM GC wall-time during a sample: the r7 q175 adjudication
    // needed exactly this signal — [302 s, 11 s, 310 s] reps on
    // byte-identical code+data are a GC storm if gc_samples tracks the
    // inflation, a plan flip if it doesn't. Collector-wide and
    // local[n]-accurate (one JVM); costs one MXBean poll per sample.
    def gcMillis: Long = {
      var t = 0L
      val it = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.iterator()
      while (it.hasNext) t += math.max(0L, it.next().getCollectionTime)
      t
    }

    def time(f: => Unit): Double = {
      // Drop cached frames + GC first: several ops return `.cache()`d
      // results (the caller owns unpersist — here, nobody), so across
      // ~460 samples the CacheManager registry grows and every later
      // query's plan-lookup walks it; and iterative queries'
      // localCheckpoint blocks stay pinned until their RDDs are
      // collected — without this, run N's storage memory and registry
      // are charged to run N+1 (the round-4 in-sweep inflation). Each
      // sample measures real work, never a prior sample's cache hit.
      spark.catalog.clearCache()
      System.gc()
      groupSeq += 1
      val group = s"bench-$groupSeq"
      spark.sparkContext.setJobGroup(group, group)
      activeGroup = group
      val gc0 = gcMillis
      val t0 = System.nanoTime()
      try f catch { case e: Throwable =>
        activeGroup = null
        spark.sparkContext.clearJobGroup()
        System.err.println(s"[bench] failed: ${e.getMessage}")
        // a failed sample still records a placeholder, keeping the
        // samples / cpu_samples / shuffle arrays per-query parallel
        recordSample(-1.0, -1L, -1.0)
        return -1.0 }
      val wall = (System.nanoTime() - t0) / 1e9
      val gcS = (gcMillis - gc0) / 1e3
      // a stream the query leaked past its own materialization would
      // keep spawning micro-batch jobs AFTER this sample ends; with the
      // active-group fallback those jobs would be charged to the NEXT
      // sample (the r7 cpu-attribution ambiguity). Stop and drain them
      // while THIS group is still the active fallback: their CPU lands
      // on the query that started them, and wall (captured above) stays
      // the query's own contract.
      spark.streams.active.foreach { s =>
        try { s.stop(); s.awaitTermination() }
        catch { case _: Throwable => () }
      }
      activeGroup = null
      spark.sparkContext.clearJobGroup()
      // listener events are async: spin until the group's CPU figure is
      // stable across THREE consecutive polls (a lagging bus can hold a
      // figure — including 0 — flat for one poll and then move)
      var last = -1L
      var stable = 0
      var spins = 0
      def cpuNow = Option(groupCpu.get(group)).map(_.get).getOrElse(0L)
      while (stable < 3 && spins < 80) {
        val now = cpuNow
        if (now == last) stable += 1 else { stable = 0; last = now }
        spins += 1; Thread.sleep(25)
      }
      recordSample(cpuNow / 1e9,
        Option(groupShuffle.get(group)).map(_.get).getOrElse(0L), gcS)
      wall
    }

    // warmup: pay JVM/codegen/scan-init once, outside any query's timing
    graft.sources.Tables.names.foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }

    // Optional args = query names: run ONLY those (isolated-measurement
    // mode, used to separate real regressions from full-sweep JVM/IO
    // accumulation). No args = the full sweep + the CDC pipeline.
    val selected =
      if (args.nonEmpty) SparkEntry.queries.toSeq.filter(q => args.contains(q._1))
      else SparkEntry.queries.toSeq
    if (args.nonEmpty) {
      // isolated mode: 3 samples each, all reported — cold-vs-warm
      // visible. "cdc_pipeline_2m" is accepted by name so the sweep-only
      // pipeline is A/B-able against its in-sweep figure (the r7
      // 10.5→66.3 s adjudication had no isolated twin to compare).
      val cdcSel = args.contains("cdc_pipeline_2m")
      val cdcSamples = if (!cdcSel) Seq.empty[String] else {
        val cdcDir =
          java.nio.file.Files.createTempDirectory("cdc-bench").toString
        graft.queries.CdcBench.envelopes(spark, 2000000L)
          .write.mode("overwrite").parquet(cdcDir)
        currentQuery = "cdc_pipeline_2m"
        val ts = (1 to 3).map(_ => time(materialize(
          graft.queries.CdcBench.curatedFromEnvelopes(
            spark.read.parquet(cdcDir)))))
        Seq(s"\"cdc_pipeline_2m\":[" + ts.mkString(",") + "]")
      }
      val samples = cdcSamples ++ selected.sortBy(_._1).map { case (name, fn) =>
        currentQuery = name
        val ts = (1 to 3).map(_ => time(materialize(fn(spark, sfDir))))
        s"\"" + name + "\":[" + ts.mkString(",") + "]"
      }
      val cpuS = rawCpu.map { case (k, v) =>
        s"\"" + k + "\":[" + v.map(x => f"$x%.3f").mkString(",") + "]"
      }.mkString("{", ",", "}")
      val gcS = rawGc.map { case (k, v) =>
        s"\"" + k + "\":[" + v.map(x => f"$x%.3f").mkString(",") + "]"
      }.mkString("{", ",", "}")
      println(s"""{"metric":"isolated","samples":${
        samples.mkString("{", ",", "}")},"cpu_samples":$cpuS,"gc_samples":$gcS,"sf":"$sfDir"}""")
      spark.stop()
      return
    }
    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    // EVERY query is the median of 3 runs. Round 4 recorded q77 at 55 s
    // in-sweep where isolated warm runs measure 5-7 s: after ~450 query
    // executions in one JVM, the FIRST sample of a late-alphabet heavy
    // query absorbs accumulated codegen/GC/page-cache state — and the old
    // "median-of-3 only under 3 s" rule excluded exactly those inflated
    // samples from re-measurement. Uniform re-runs (plus a GC between
    // queries to stop one query's garbage billing the next) make the
    // recorded figure the query's own cost, not the sweep's history.
    val raw = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    // reference-scale CDC pipeline: 2M change events → curated. Envelopes
    // are materialized to parquet OUTSIDE the timed window so the metric
    // measures the engine's parse/merge/join path, not the JSON generator.
    // The figure is the MEDIAN of 3 timed runs after one untimed warm-up.
    // This block runs BEFORE the query sweep, right after its input is
    // written: measured at the END of the ~460-sample sweep, the ~1 GB
    // envelope parquet has been evicted from the page cache by hundreds
    // of intervening shuffles and the same pipeline recorded 11-25 s
    // where a fresh JVM measures ~3 s — sweep history, not engine cost
    // (round-2 README documented the 10-19 s band; this ordering removes
    // the artifact instead of documenting it).
    val cdcDir = java.nio.file.Files.createTempDirectory("cdc-bench").toString
    graft.queries.CdcBench.envelopes(spark, 2000000L)
      .write.mode("overwrite").parquet(cdcDir)
    def cdcRun(): Unit =
      materialize(graft.queries.CdcBench.curatedFromEnvelopes(
        spark.read.parquet(cdcDir)))
    cdcRun() // warm-up: page cache + codegen, untimed
    currentQuery = "cdc_pipeline_2m"
    val cdcTimes = (1 to 3).map(_ => time(cdcRun()))
    raw("cdc_pipeline_2m") = cdcTimes
    results("cdc_pipeline_2m") = cdcTimes.sorted.apply(1)
    selected.sortBy(_._1).foreach { case (name, fn) =>
      currentQuery = name
      val first = time(materialize(fn(spark, sfDir)))
      results(name) =
        if (first < 0) { raw(name) = Seq(first); first }
        else {
          val again = Seq.fill(2)(time(materialize(fn(spark, sfDir))))
          raw(name) = first +: again
          // a failed re-run returns the -1 sentinel; a median over mixed
          // sentinel/real values is meaningless — keep the good first
          // sample instead of letting -1 shadow a real failure mode
          if (again.exists(_ < 0)) first
          else (first +: again).sorted.apply(1)
        }
    }

    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // The driver captures only the tail of stdout, which truncates this
    // one line mid-JSON and loses every timing sorting lexically early —
    // also persist the FULL result as a committed artifact per round
    // (bench/bench_r<N>.json, N = 1 + the latest driver BENCH_r*.json).
    try {
      val out = sys.env.get("GRAFT_BENCH_OUT").map(java.nio.file.Paths.get(_))
        .getOrElse {
          val cwd = java.nio.file.Paths.get(".")
          val pat = "BENCH_r(\\d+)\\.json".r
          val prev = java.nio.file.Files.list(cwd).iterator()
          var maxR = 0
          while (prev.hasNext) {
            prev.next().getFileName.toString match {
              case pat(n) => maxR = math.max(maxR, n.toInt)
              case _ => ()
            }
          }
          cwd.resolve(f"bench/bench_r${maxR + 1}%02d.json")
        }
      Option(out.getParent).foreach(java.nio.file.Files.createDirectories(_))
      // the committed artifact additionally carries every RAW sample, so
      // a future "is this figure real or a cold outlier?" question is
      // answerable from the artifact alone (the stdout line stays medians
      // only — it is the driver's fixed one-line contract)
      val rawJson = raw.map { case (k, v) =>
        s"\"" + k + "\":[" + v.mkString(",") + "]" }.mkString("{", ",", "}")
      // per-query median executor-CPU seconds and shuffle-write bytes —
      // the cross-boot-stable signal (wall time on this VM is not); raw
      // per-sample CPU rides along for outlier forensics
      def medianCpu(xs: Seq[Double]): Double =
        if (xs.isEmpty) -1.0 else xs.sorted.apply(xs.size / 2)
      val cpuJson = rawCpu.map { case (k, v) =>
        s"\"" + k + "\":" + f"${medianCpu(v)}%.3f" }.mkString("{", ",", "}")
      val shufJson = rawShuffle.map { case (k, v) =>
        s"\"" + k + "\":" + (if (v.isEmpty) -1L else v.sorted.apply(v.size / 2))
      }.mkString("{", ",", "}")
      val cpuRawJson = rawCpu.map { case (k, v) =>
        s"\"" + k + "\":[" + v.map(x => f"$x%.3f").mkString(",") + "]"
      }.mkString("{", ",", "}")
      val gcRawJson = rawGc.map { case (k, v) =>
        s"\"" + k + "\":[" + v.map(x => f"$x%.3f").mkString(",") + "]"
      }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(out,
        json.dropRight(1) + s""","cpu_s":$cpuJson,"shuffle_bytes":$shufJson""" +
          s""","samples":$rawJson,"cpu_samples":$cpuRawJson""" +
          s""","gc_samples":$gcRawJson}""" + "\n")
      System.err.println(s"[bench] full results written to $out")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] artifact write failed: ${e.getMessage}") }
    spark.stop()
  }
}
