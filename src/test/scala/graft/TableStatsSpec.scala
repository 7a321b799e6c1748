package graft

import org.apache.spark.sql.functions._

import graft.catalog.TableStats

/** Cost-based-optimizer evidence: ANALYZE statistics turn a filtered
  * dimension join from sort-merge into broadcast — the decision that
  * matters most at fact scale. */
class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  private def withCbo[A](on: Boolean)(f: => A): A = {
    spark.conf.set("spark.sql.cbo.enabled", on.toString)
    try f finally spark.conf.set("spark.sql.cbo.enabled", "false")
  }

  test("ANALYZE exposes exact row counts to the optimizer as metadata") {
    val t = s"stats_rc_${System.nanoTime}"
    (1 to 1234).toDF("v").write.saveAsTable(t)
    try {
      TableStats.analyze(spark, t)
      // plan-visible row counts are a CBO-mode feature; size estimates
      // are always available
      withCbo(on = true) {
        assert(TableStats.rowCount(spark, t).contains(BigInt(1234)))
      }
      assert(TableStats.sizeInBytes(spark, t) > 0)
    } finally spark.sql(s"DROP TABLE $t")
  }

  test("CBO + column stats shrink a filtered dim below the broadcast bar") {
    val fact = s"stats_fact_${System.nanoTime}"
    val dim = s"stats_dim_${System.nanoTime}"
    (1 to 50000).map(i => (i.toLong % 1000, s"payload$i"))
      .toDF("k", "payload").write.saveAsTable(fact)
    // dim: 20k rows, `kind` has 100 distinct values → an equality filter
    // keeps an ESTIMATED rows/ndv = 200-row slice, far under the
    // size-only estimate (which inherits the unfiltered scan size)
    (1 to 20000).map(i => (i.toLong % 1000, s"kind${i % 100}", s"attr-$i-$i"))
      .toDF("k", "kind", "attr").write.saveAsTable(dim)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      TableStats.analyze(spark, fact)
      TableStats.analyze(spark, dim, columns = Seq("k", "kind"))
      // the join's build side as the optimizer sees it (post-pruning)
      def buildSide = spark.table(dim).where($"kind" === "kind37").select($"k")
        .queryExecution.optimizedPlan.stats
      val sizeOnly = withCbo(on = false)(buildSide.sizeInBytes)
      val withStats = withCbo(on = true)(buildSide.sizeInBytes)
      // the whole point: column stats shrink the post-filter estimate
      // (rows/ndv ≈ 1/100th); size-only inherits the unfiltered size
      assert(withStats * 2 < sizeOnly,
        s"expected stats to shrink the estimate: $withStats vs $sizeOnly")
      withCbo(on = true) {
        assert(buildSide.rowCount.exists(rc => rc > 50 && rc < 1000))
      }
      // bar between the two estimates → the SAME query flips join
      // strategy purely on statistics
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        ((withStats + sizeOnly) / 2).toString)
      def planOf(cbo: Boolean): String = withCbo(cbo) {
        spark.table(fact)
          .join(spark.table(dim).where($"kind" === "kind37"), "k")
          .agg(count(lit(1))).queryExecution.executedPlan.toString
      }
      assert(!planOf(cbo = false).contains("BroadcastHashJoin"))
      assert(planOf(cbo = true).contains("BroadcastHashJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql(s"DROP TABLE $fact")
      spark.sql(s"DROP TABLE $dim")
    }
  }
}
