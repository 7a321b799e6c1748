package graft

import org.apache.spark.sql.functions._

import graft.ops.BloomOps

class BloomOpsSpec extends SparkSpec {
  import spark.implicits._

  /** 20k probe rows, keys 0..1999; build side keeps 40 selective keys. */
  lazy val probe = (1 to 20000).map(i => (i % 2000L, i.toLong))
    .toDF("k", "rowid")
  lazy val build = (0 until 2000 by 50).map(k => (k.toLong, s"dim$k"))
    .toDF("bk", "name")

  test("pruned inner join result equals the plain join exactly") {
    val plain = probe.join(build, $"k" === $"bk").select($"rowid", $"name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val pruned = BloomOps.prunedEquiJoin(probe, build, $"k", $"bk",
        expectedItems = 100L)
      .select($"rowid", $"name")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(pruned === plain)
    assert(plain.nonEmpty)
  }

  test("no false negatives: every build key passes its own bloom") {
    val bloom = BloomOps.buildBloom(build, $"bk", expectedItems = 100L)
    val kept = build.filter(BloomOps.mightContain(bloom, $"bk")).count()
    assert(kept === build.count())
  }

  test("bloom actually prunes: non-matching probe rows are mostly rejected") {
    val bloom = BloomOps.buildBloom(build, $"bk", expectedItems = 100L,
      fpp = 0.01)
    val kept = probe.filter(BloomOps.mightContain(bloom, $"k")).count()
    // 40/2000 keys match → 400 true rows; 1% fpp on the rest ≈ 196 rows.
    // Generous bound: well under half the non-matching volume survives.
    assert(kept >= 400L && kept < 2000L, s"kept=$kept")
  }

  test("empty build side yields an all-rejecting bloom and an empty join") {
    val none = build.filter($"bk" < 0)
    val out = BloomOps.prunedEquiJoin(probe, none, $"k", $"bk",
      expectedItems = 10L)
    assert(out.count() === 0L)
  }

  test("outer/anti join types are rejected") {
    intercept[IllegalArgumentException] {
      BloomOps.prunedEquiJoin(probe, build, $"k", $"bk", joinType = "left_anti")
    }
  }

  test("plan gate: might_contain filters the probe side before the join") {
    // A parquet-backed probe: over a LocalRelation, Catalyst constant-folds
    // the whole filter at optimization time, which hides the plan shape
    // this gate exists to pin down (a file scan is also the real topology).
    val dir = tmpDir("bloomplan")
    probe.write.mode("overwrite").parquet(s"$dir/probe")
    val probeFs = spark.read.parquet(s"$dir/probe")
    val df = BloomOps.prunedEquiJoin(probeFs, build, $"k", $"bk",
      expectedItems = 100L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"), s"expected might_contain in: $p")
    // The predicate must be a plain Filter on the probe scan (pre-exchange),
    // not inside the join condition.
    val filterIdx = p.linesIterator.indexWhere(l =>
      l.contains("Filter") && l.contains("might_contain"))
    assert(filterIdx >= 0, "might_contain must appear in a Filter node")
  }
}
