package graft

import org.apache.spark.sql.DataFrame

/** Dev-loop single-query timer: `runMain graft.BenchOne <sfDir> <name> [reps]`
  * — same session/materialization as [[Bench]], per-rep timings printed. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val (sfDir, name) = (args(0), args(1))
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder("graft-bench-one", cores = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    graft.sources.Tables.names.foreach { t =>
      try graft.sources.Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      materialize(fn(spark, sfDir))
      println(f"[benchone] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      // phase-instrumented scenarios (q189, q203, …) print their
      // per-wave breakdown — the same figures Bench embeds as
      // phase_samples
      PhaseTimer.drain(name).foreach { case (p, s) =>
        println(f"[benchone]   phase $p%-22s $s%8.2f s")
      }
    }
  }
}
