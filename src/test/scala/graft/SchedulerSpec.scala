package graft

import graft.pipeline.Scheduler

/** Scheduler kernel: interval-aligned ticks, no pile-up on overrun,
  * bounded failure tolerance — all spec'd against an injected clock, no
  * real sleeps.
  */
class SchedulerSpec extends SparkSpec {

  /** A fake clock: `sleeper` advances it, `body` can add work time. */
  private final class FakeTime(var now: Long) {
    def clock(): Long = now
    def sleep(ms: Long): Unit = { now += ms }
  }

  test("ticks fire interval-aligned and carry the boundary timestamp") {
    val t = new FakeTime(1037L)
    val sched = new Scheduler(1000L, clock = t.clock _, sleeper = t.sleep _)
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val fired = sched.runTicks(3) { ts => seen += ts }
    assert(fired == Seq(2000L, 3000L, 4000L) && seen == fired)
  }

  test("a run overshooting its interval skips missed ticks (no pile-up)") {
    val t = new FakeTime(0L)
    val sched = new Scheduler(1000L, clock = t.clock _, sleeper = t.sleep _)
    val fired = sched.runTicks(3) { _ => t.now += 2500L } // 2.5 intervals
    // 1000 fires, work ends at 3500 → next boundary 4000 (2000/3000
    // skipped), then 6500 → 7000
    assert(fired == Seq(1000L, 4000L, 7000L))
  }

  test("consecutive failures stop the loop; recovery resets the count") {
    val t = new FakeTime(0L)
    val failures = scala.collection.mutable.ArrayBuffer[Long]()
    val sched = new Scheduler(100L, maxConsecutiveFailures = 2,
      onFailure = (ts, _) => failures += ts,
      clock = t.clock _, sleeper = t.sleep _)
    var calls = 0
    val fired = sched.runTicks(10) { _ =>
      calls += 1
      // fail on calls 2 and 4-5: the isolated failure recovers, the
      // consecutive pair kills the loop
      if (calls == 2 || calls >= 4) sys.error("boom")
    }
    assert(calls == 5, s"expected stop after 2nd consecutive failure, got $calls")
    assert(failures.size == 3)
    assert(fired.size == 5, "failed ticks still count as fired (no retry-storm)")
  }

  test("drives a real Pipeline run per tick") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = new graft.sinks.SnapshotTable(spark, tmpDir("sched-out"))
    val t = new FakeTime(0L)
    val sched = new Scheduler(1000L, clock = t.clock _, sleeper = t.sleep _)
    val runs = scala.collection.mutable.ArrayBuffer[Long]()
    sched.runTicks(2) { ts =>
      runs += ts
      out.overwrite((1 to 10).map(i => (i.toLong, ts)).toDF("id", "run_ts"))
    }
    assert(runs == Seq(1000L, 2000L))
    assert(out.read().select(countDistinct($"run_ts")).head.getLong(0) == 1)
    assert(out.read().head.getLong(1) == 2000L, "latest run's snapshot wins")
  }
}
