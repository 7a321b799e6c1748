package graft

import graft.checks.IncrementalChecks
import org.apache.spark.sql.functions._

/** The dbt test trio as maintained views: violation counts track signed
  * waves exactly — orphans appear when the parent retracts and heal when
  * it returns, null-FK updates move rows between monitors, duplicate
  * parents count as excess rows, replays and compactions are no-ops. */
class IncrementalChecksSpec extends SparkSpec {
  import spark.implicits._

  private def counts(st: IncrementalChecks.Stores): (Long, Long, Long) = {
    val r = IncrementalChecks.current(st).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("orphans, null FKs, and duplicate PKs track signed waves exactly") {
    val st = IncrementalChecks.stores(spark, tmpDir("ichk"))
    IncrementalChecks.appendParent(st,
      Seq(1L, 2L, 3L).toDF("k"), "k", 0L)
    IncrementalChecks.appendChild(st,
      Seq(1L, 1L, 2L, 3L).toDF("k"), "k", 1L)
    assert(counts(st) == (0L, 0L, 0L))
    // delete parent 2: its child row orphans
    val pdel = Seq(2L).toDF("k").withColumn("__delta", lit(-1L))
    IncrementalChecks.appendParent(st, pdel, "k", 2L, Some("__delta"))
    assert(counts(st) == (1L, 0L, 0L))
    IncrementalChecks.compact(st)
    IncrementalChecks.appendParent(st, pdel, "k", 2L, Some("__delta")) // replay
    assert(counts(st) == (1L, 0L, 0L))
    // child update: one of key 1's rows nulls its FK
    IncrementalChecks.appendChild(st,
      Seq((Some(1L), -1L), (None, 1L)).toDF("k", "__delta"),
      "k", 3L, Some("__delta"))
    assert(counts(st) == (1L, 1L, 0L))
    // duplicate parent 3 (insert again): one excess row
    IncrementalChecks.appendParent(st, Seq(3L).toDF("k"), "k", 4L)
    assert(counts(st) == (1L, 1L, 1L))
    // parent 2 returns: the orphan heals
    IncrementalChecks.appendParent(st, Seq(2L).toDF("k"), "k", 5L)
    assert(counts(st) == (0L, 1L, 1L))
  }

  test("a consistent empty state serves zeros, not an empty frame") {
    val st = IncrementalChecks.stores(spark, tmpDir("ichk"))
    IncrementalChecks.appendParent(st, Seq(9L).toDF("k"), "k", 0L)
    IncrementalChecks.appendChild(st, Seq(9L).toDF("k"), "k", 1L)
    // full takedown of both sides
    IncrementalChecks.appendParent(st,
      Seq(9L).toDF("k").withColumn("__delta", lit(-1L)), "k", 2L,
      Some("__delta"))
    IncrementalChecks.appendChild(st,
      Seq(9L).toDF("k").withColumn("__delta", lit(-1L)), "k", 3L,
      Some("__delta"))
    assert(counts(st) == (0L, 0L, 0L))
  }
}
