package graft

import org.apache.spark.sql.DataFrame

/** Dev-loop profiler: `runMain graft.ProfileOne <sfDir> <name> [reps]` —
  * runs one query like [[BenchOne]] but additionally attributes the wall
  * to scheduler-visible work vs driver-side gaps:
  *
  *  - jobs / stages / tasks launched by the run,
  *  - Σ job wall (first-task-submitted → job-end) vs the query's wall —
  *    the difference is pure DRIVER time (planning, codegen, file
  *    listing, commit protocol) that no executor ever sees,
  *  - Σ executor task time, cpu time, GC, shuffle bytes,
  *  - the top stages by task time (with task counts), to find the
  *    hot operators without a UI.
  *
  * Measurement-only utility; not part of the driver contract.
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder("graft-profile", cores = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var jobWallMs = 0L
    val stageTaskMs = new java.util.concurrent.atomic.AtomicLong
    val stageCpuNs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    @volatile var stages = 0
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val topStages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]()

    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1; jobStart.put(js.jobId, js.time)
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(je.jobId)).foreach(t0 => jobWallMs += (je.time - t0))
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages += 1
        val m = sc.stageInfo.taskMetrics
        stageTaskMs.addAndGet(m.executorRunTime)
        stageCpuNs.addAndGet(m.executorCpuTime)
        gcMs.addAndGet(m.jvmGCTime)
        shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        tasks.addAndGet(sc.stageInfo.numTasks)
        topStages.add((f"in=${m.inputMetrics.bytesRead / 1e6}%.0fMB " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.0fMB " +
          f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0fMB " +
          f"cpu=${m.executorCpuTime / 1e9}%.1fs deser=${m.executorDeserializeTime / 1e3}%.1fs " +
          sc.stageInfo.name.takeWhile(_ != '\n').take(70),
          m.executorRunTime, sc.stageInfo.numTasks))
      }
    })

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    graft.sources.Tables.names.foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    Thread.sleep(500) // let warmup listener events drain
    jobs = 0; jobWallMs = 0; stageTaskMs.set(0); stageCpuNs.set(0)
    gcMs.set(0); shuffleBytes.set(0); tasks.set(0); stages = 0
    topStages.clear()

    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      materialize(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // drain async listener events
      println(f"[profile] $name rep $i: wall=$wall%.2f s  jobs=$jobs  " +
        f"stages=$stages  tasks=${tasks.get}")
      println(f"[profile]   sum(jobWall)=${jobWallMs / 1e3}%.2f s  " +
        f"driverGaps=${wall - jobWallMs / 1e3}%.2f s")
      println(f"[profile]   sum(taskRun)=${stageTaskMs.get / 1e3}%.2f s  " +
        f"sum(taskCpu)=${stageCpuNs.get / 1e9}%.2f s  " +
        f"taskGc=${gcMs.get / 1e3}%.2f s  shuffleMB=${shuffleBytes.get / 1e6}%.1f")
      import scala.jdk.CollectionConverters._
      val top = topStages.asScala.toSeq.sortBy(-_._2).take(12)
      top.foreach { case (n, ms, nt) =>
        println(f"[profile]   stage ${ms / 1e3}%8.2f s  $nt%4d tasks  $n")
      }
      val cg = org.apache.spark.metrics.source.CodegenMetrics
      println(f"[profile]   codegenCompiles=${cg.METRIC_COMPILATION_TIME.getCount}" +
        f"  compileMeanMs=${cg.METRIC_COMPILATION_TIME.getSnapshot.getMean}%.1f" +
        f"  (cumulative since JVM start)")
      PhaseTimer.drain(name).foreach { case (p, s) =>
        println(f"[profile]   phase $p%-22s $s%8.2f s")
      }
      jobs = 0; jobWallMs = 0; stageTaskMs.set(0); stageCpuNs.set(0)
      gcMs.set(0); shuffleBytes.set(0); tasks.set(0); stages = 0
      topStages.clear()
    }
    spark.stop()
  }
}
