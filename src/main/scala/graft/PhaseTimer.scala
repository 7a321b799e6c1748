package graft

import scala.collection.mutable.ArrayBuffer

/** Per-phase wall-clock instrumentation for multi-phase scenario
  * queries (IVM lifecycles: append waves, compaction, serve). The r8
  * judge flagged q189's 3.5× sample spread as unadjudicable because the
  * bench artifact held only the total — with per-phase figures the
  * variance localizes to a named phase instead of a 75-second mystery.
  *
  * Zero-dependency by design: queries call [[time]] around each phase;
  * [[graft.Bench]] drains the buffer after every sample and embeds the
  * breakdown in the committed artifact (`phase_samples`). Outside the
  * bench the buffer just accumulates a bounded handful of tuples per
  * query run and is dropped with the JVM — no behavior change.
  */
object PhaseTimer {

  private val buf =
    new java.util.concurrent.ConcurrentHashMap[String, ArrayBuffer[(String, Double)]]()

  /** Time one phase of `query`. Phases of one run append in order; a
    * phase name may repeat (e.g. two append waves) — the drain keeps
    * the sequence, it does not key on the name. */
  def time[T](query: String, phase: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val secs = (System.nanoTime() - t0) / 1e9
    buf.computeIfAbsent(query, _ => ArrayBuffer.empty)
      .synchronized {
        buf.get(query) += ((phase, secs))
      }
    r
  }

  /** Remove and return everything recorded for `query` (one sample's
    * phases when called per-sample, as the bench does). */
  def drain(query: String): Seq[(String, Double)] =
    Option(buf.remove(query)).map(_.toSeq).getOrElse(Nil)
}
