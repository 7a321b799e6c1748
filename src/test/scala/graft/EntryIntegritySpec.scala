package graft

/** Artifact-integrity guard: EVERY query registered in
  * `SparkEntry.queries` must execute against sf0.001 without throwing
  * (or sit on the explicit exclusion list below, with a reason).
  *
  * Round 7 shipped two registered queries (q177/q179) that threw
  * `AnalysisException` at runtime — and because the correctness driver
  * dropped throwing queries from its report instead of recording an
  * `err` row, the round's artifact silently read as full coverage. This
  * spec makes a broken registered query a RED suite, never an invisible
  * artifact gap: registration is a promise that the query runs.
  *
  * `limit(1)` keeps the per-query cost to a prefix execution at the
  * smallest scale factor; the IVM scenario queries run their appends
  * and compactions as side effects of building the frame, so their
  * whole store lifecycle executes under this gate too.
  */
class EntryIntegritySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries excused from this gate, each with a reason. Empty today —
    * keep it that way unless a query's preconditions genuinely cannot
    * exist in the test environment (and then say why here). */
  private val excluded: Map[String, String] = Map.empty

  test("every registered query executes at sf0.001 (or is explicitly excluded)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => excluded.contains(name) }
      .flatMap { case (name, fn) =>
        try { fn(spark, sfDir).limit(1).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator
              .take(3).mkString(" | "))
        }
      }
    assert(failures.isEmpty,
      s"${failures.size} registered queries throw at sf0.001 — a broken " +
        "registration must fail HERE, not vanish from the round artifact:\n" +
        failures.mkString("\n"))
  }
}
