package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Periodic pipeline trigger — the engine-native form of the reference's
  * Airflow scheduling layer (`infra/airflow/`, DAG order + schedule in
  * `README.md:107-118`). The reference declares the model graph as an
  * Airflow DAG with a cron `schedule_interval`; here the [[Pipeline]] IS
  * the DAG, and this class supplies the missing trigger: fire the whole
  * run every `intervalMs`, aligned to the interval grid.
  *
  * Semantics (mirroring the Airflow knobs a dbt user relies on):
  *   - `max_active_runs=1`: runs never overlap — a run that outlasts its
  *     interval delays the next tick, it is never run concurrently with it
  *     (concurrent WAP merges of the same tables would interleave badly).
  *   - `catchup=false`: ticks missed while a run was executing (or while
  *     the scheduler was down) COLLAPSE into one next run — a pipeline
  *     whose sources are read-latest is idempotent per tick, so replaying
  *     N stale ticks does N-1 useless table rewrites.
  *   - Failure policy: a failed run does not stop the schedule (transient
  *     source outages heal on the next tick); `onResult` sees every
  *     result, and consecutive-failure counts are exposed so an
  *     [[graft.checks.Alerts.AlertManager]] hook can page on sustained
  *     breakage while single blips stay quiet.
  *
  * Scale note: the scheduler is one driver thread that sleeps between
  * runs — all distributed work happens inside `Pipeline.run`, so this
  * adds nothing to the cluster's critical path. Clock and sleep are
  * injectable for deterministic tests (virtual time, no wall-clock
  * flakiness).
  */
final class Scheduler(
    pipeline: Pipeline,
    spark: SparkSession,
    intervalMs: Long,
    onResult: PipelineResult => Unit = _ => (),
    clock: () => Long = () => System.currentTimeMillis(),
    sleep: Long => Unit = Thread.sleep,
    log: String => Unit = s => println(s"[scheduler] $s")) {

  require(intervalMs > 0, "intervalMs must be positive")

  @volatile private var stopped = false
  @volatile private var failStreak = 0
  @volatile private var runsDone = 0L

  /** Consecutive failed runs (0 after any clean run) — the alerting
    * signal for sustained breakage. */
  def consecutiveFailures: Int = failStreak
  def completedRuns: Long = runsDone

  def stop(): Unit = { stopped = true }

  /** Run the schedule on the CALLING thread until `stop()` or `maxRuns`.
    * The first run fires immediately; each subsequent run fires at the
    * next grid point `start + k*intervalMs` strictly after the previous
    * run finished (missed grid points collapse — catchup=false). */
  def runLoop(maxRuns: Long = Long.MaxValue): Unit = {
    val start = clock()
    while (!stopped && runsDone < maxRuns) {
      val t0 = clock()
      val res =
        try pipeline.run(spark, log)
        catch { // a driver-side crash must not kill the schedule thread
          case e: Exception =>
            log(s"run crashed: $e")
            PipelineResult(Seq(StageResult(
              "<scheduler>", ok = false, Nil, None, clock() - t0, Some(e.toString))))
        }
      runsDone += 1
      failStreak = if (res.ok) 0 else failStreak + 1
      log(s"run ${runsDone} ${if (res.ok) "ok" else s"FAILED (streak=$failStreak)"}")
      onResult(res)
      if (!stopped && runsDone < maxRuns) {
        // next grid point strictly in the future; overdue ticks collapse
        val now = clock()
        val k = ((now - start) / intervalMs) + 1
        val wait = start + k * intervalMs - now
        if (wait > 0) sleep(wait)
      }
    }
  }

  /** Fire the schedule on a daemon thread; returns after the thread
    * starts. Use `stop()` to end it (takes effect at the next tick). */
  def start(maxRuns: Long = Long.MaxValue): Thread = {
    val t = new Thread(() => runLoop(maxRuns), "graft-scheduler")
    t.setDaemon(true)
    t.start()
    t
  }
}
