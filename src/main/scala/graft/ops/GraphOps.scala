package graft.ops

import graft.ops.Lineage.LineageSyntax
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics on edge DataFrames.
  *
  * Companion to the label-propagation connected components in
  * [[DedupOps.connectedComponents]]; this module holds rank-style
  * iterative algorithms. Everything operates on a plain `(src, dst)`
  * edge DataFrame — no graph library, no driver-side adjacency.
  */
object GraphOps {

  /** Fixed-iteration PageRank in exact integer ("nano-rank") arithmetic.
    *
    * Ranks are `BIGINT` multiples of `1/unit` (default nano: 10⁻⁹). Each
    * iteration computes, per node v:
    *
    * {{{ r(v) = base + damp · Σ_{u→v} (r(u) div deg(u))  div  dampDen }}}
    *
    * entirely in 64-bit integers. Because integer addition is exactly
    * associative/commutative, the result is bit-identical regardless of
    * partitioning, parallelism, or engine — unlike float PageRank, whose
    * per-node sums differ in the last ulp between any two summation
    * orders. That makes this variant hash-exact against a SQL oracle
    * (q89) while keeping the standard semantics to within 1/unit per
    * term (the floor in `div` loses < deg/unit of mass per node — at
    * unit=10⁹ that is ~10⁻⁶ after 3 iterations, far below ranking
    * resolution).
    *
    * Dangling nodes: every node that appears only as a destination gets
    * rank `base` and contributes nothing (standard lost-mass
    * simplification); with a symmetrized edge list there are none.
    *
    * Scale shape: the edge list (with out-degree joined on once,
    * checkpointed) is the only large dataset. Each iteration is one join
    * of ranks onto edges by `src` (ranks ≪ edges; broadcast when small,
    * shuffle-on-src otherwise — Catalyst/AQE decides) and ONE shuffle of
    * per-edge contributions keyed on `dst` with map-side partial sums.
    * Nothing is collected to the driver; lineage is cut per iteration so
    * the plan stays iteration-deep, not corpus-deep.
    *
    * @param edges   directed edges as columns `src`, `dst` (BIGINT-like)
    * @param iters   fixed iteration count (no convergence collect)
    * @param dampNum damping numerator (default 85)
    * @param dampDen damping denominator (default 100); `unit·(dampDen-dampNum)`
    *                must divide exactly by `dampDen` so `base` is integral
    * @param unit    integer scale of rank 1.0
    * @return (node, r) — r is the nano-rank after `iters` iterations
    */
  def pageRankQuantized(edges: DataFrame, iters: Int,
                        dampNum: Long = 85L, dampDen: Long = 100L,
                        unit: Long = 1000000000L): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require((unit * (dampDen - dampNum)) % dampDen == 0,
      s"unit·(dampDen-dampNum) must divide by dampDen for an integral base")
    val base = unit * (dampDen - dampNum) / dampDen
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // one edge pass materialized once; reused by every iteration
    val withDeg = e.join(deg, Seq("src")).cutLineage()
    val nodes = withDeg.select(col("src").as("node"))
      .union(withDeg.select(col("dst").as("node")))
      .distinct().cutLineage()
    var ranks = nodes.withColumn("r", lit(unit))
    (1 to iters).foreach { _ =>
      val contrib = withDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(
            s"($dampNum * coalesce(s, CAST(0 AS BIGINT))) div $dampDen"))
            .as("r"))
        .cutLineage(eager = false) // lazy: cut lineage, materialize on demand
    }
    ranks
  }
}
