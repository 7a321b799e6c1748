package graft.pipeline

/** Periodic pipeline trigger — the scheduler role the reference declares
  * but never ships (`infra/airflow/` is a bare Helm chart; `README.md:146`
  * admits `promptly/app.py` "can be turned into a DAG"). [[Pipeline]] IS
  * the DAG; this supplies the missing clock.
  *
  * Semantics (the Airflow-like subset that matters for an engine):
  *
  *  - **interval-aligned firing**: runs trigger at wall-clock multiples
  *    of the interval, so a "daily at 00:00" contract is expressible and
  *    run timestamps are stable identifiers (they become `runId`s);
  *  - **no pile-up** (`catchup=false`): a run that overshoots its
  *    interval skips the missed ticks and fires at the NEXT boundary —
  *    overlapping runs of the same pipeline are never started;
  *  - **bounded failure tolerance**: consecutive failures up to
  *    `maxConsecutiveFailures` are tolerated (logged via `onFailure`),
  *    then the loop stops — a permanently broken pipeline must fail
  *    loudly, not spin forever.
  *
  * The clock and sleeper are injectable, so scheduling LOGIC is spec'd
  * deterministically (no real sleeps in tests) — the same seam any
  * scheduler kernel exposes. Driver-side only; zero data-plane cost.
  */
final class Scheduler(intervalMs: Long,
                      maxConsecutiveFailures: Int = 3,
                      onFailure: (Long, Throwable) => Unit = (_, _) => (),
                      clock: () => Long = () => System.currentTimeMillis(),
                      sleeper: Long => Unit = Thread.sleep) {
  require(intervalMs > 0, "interval must be positive")

  /** The first aligned tick strictly after `now`. */
  def nextTick(now: Long): Long = (now / intervalMs + 1) * intervalMs

  /** Run `body` for `ticks` aligned firings (blocking). Returns the
    * tick timestamps that actually fired (missed ticks are skipped, so
    * the list is strictly increasing by >= one interval). `body` receives
    * the tick timestamp — the natural `runId`. */
  def runTicks(ticks: Int)(body: Long => Unit): Seq[Long] = {
    val fired = scala.collection.mutable.ArrayBuffer[Long]()
    var failures = 0
    var tick = nextTick(clock())
    while (fired.length < ticks && failures < maxConsecutiveFailures) {
      val now = clock()
      if (now < tick) sleeper(tick - now)
      else {
        fired += tick
        try { body(tick); failures = 0 }
        catch {
          case t: Throwable =>
            failures += 1
            onFailure(tick, t)
        }
        // catchup=false: next boundary strictly after NOW (skip missed)
        tick = nextTick(math.max(clock(), tick))
      }
    }
    fired.toSeq
  }

  /** Run until `maxConsecutiveFailures` is hit (the daemon form). */
  def runForever(body: Long => Unit): Unit = {
    var failures = 0
    var tick = nextTick(clock())
    while (failures < maxConsecutiveFailures) {
      val now = clock()
      if (now < tick) sleeper(tick - now)
      else {
        try { body(tick); failures = 0 }
        catch {
          case t: Throwable =>
            failures += 1
            onFailure(tick, t)
        }
        tick = nextTick(math.max(clock(), tick))
      }
    }
  }
}
