package graft

import org.apache.spark.sql.functions.lit

import graft.pipeline.{Pipeline, Scheduler, Stage}

/** Virtual-time scheduler tests — no wall-clock sleeps, no flakiness:
  * the injected clock only advances when the pipeline "works" or the
  * scheduler sleeps. */
class SchedulerSpec extends SparkSpec {
  import spark.implicits._

  test("grid alignment: overdue ticks collapse (catchup=false), runs never overlap") {
    var now = 0L
    val fires = scala.collection.mutable.ArrayBuffer[Long]()
    val runCost = 250L
    val p = new Pipeline(Seq(Stage(name = "s", build = (s, _) => {
      fires += now
      now += runCost // the run consumes virtual time beyond two intervals
      Seq(1).toDF("x")
    })))
    val sched = new Scheduler(p, spark, intervalMs = 100L,
      clock = () => now, sleep = ms => now += ms, log = _ => ())
    sched.runLoop(maxRuns = 3)
    // first run at t=0 ends at 250; ticks 100 and 200 collapse; the next
    // runs fire at the 300 and 600 grid points — never mid-run
    assert(fires.toSeq == Seq(0L, 300L, 600L))
    assert(sched.completedRuns == 3 && sched.consecutiveFailures == 0)
  }

  test("failed runs keep the schedule alive and count a streak; success resets") {
    var now = 0L
    var failTimes = 2
    val results = scala.collection.mutable.ArrayBuffer[Boolean]()
    val streaks = scala.collection.mutable.ArrayBuffer[Int]()
    val p = new Pipeline(Seq(Stage(name = "s", build = (s, _) => {
      now += 10
      if (failTimes > 0) { failTimes -= 1; sys.error("transient source outage") }
      Seq(1).toDF("x")
    })))
    lazy val s2: Scheduler = new Scheduler(p, spark, intervalMs = 100L,
      onResult = r => { results += r.ok; streaks += s2.consecutiveFailures },
      clock = () => now, sleep = ms => now += ms, log = _ => ())
    s2.runLoop(maxRuns = 4)
    assert(results.toSeq == Seq(false, false, true, true))
    // the streak climbs through the outage and re-arms on recovery —
    // exactly the signal an AlertManager hook needs to page once
    assert(streaks.toSeq == Seq(1, 2, 0, 0))
  }

  test("stop() ends the loop at the next tick") {
    var now = 0L
    var runs = 0
    lazy val sched: Scheduler = new Scheduler(
      new Pipeline(Seq(Stage(name = "s", build = (s, _) => {
        runs += 1; now += 10
        if (runs == 2) sched.stop()
        Seq(1).toDF("x")
      }))),
      spark, intervalMs = 100L,
      clock = () => now, sleep = ms => now += ms, log = _ => ())
    sched.runLoop()
    assert(runs == 2 && sched.completedRuns == 2)
  }
}
