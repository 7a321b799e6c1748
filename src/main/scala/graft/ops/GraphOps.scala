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
    * Scale shape: the edge list (checkpointed once, on entry) is the
    * only large dataset. Nodes and out-degrees come from ONE map-side-
    * combined aggregation over (src→1, dst→0) tags — node-sized partials
    * reach the exchange, where a degree window would sort the full edge
    * list — and the static degree then rides the rank frame, so no
    * per-iteration degree join exists. Each iteration is one join of
    * ranks onto the edge checkpoint by `src` (broadcast below
    * `maxBroadcastNodes`, shuffled otherwise), the per-edge contributions
    * unioned with a zero seed per node, and ONE shuffle — the dst-keyed
    * sum with map-side partials — which also applies the damping update
    * (the seeded 0 replaces a rank-update left join). Nothing is
    * collected to the driver but a node count; lineage is cut every
    * `cutEvery` iterations so the plan stays bounded, not corpus-deep.
    *
    * @param edges   directed edges as columns `src`, `dst` (BIGINT-like)
    * @param iters   fixed iteration count (no convergence collect)
    * @param dampNum damping numerator (default 85)
    * @param dampDen damping denominator (default 100); `unit·(dampDen-dampNum)`
    *                must divide exactly by `dampDen` so `base` is integral
    * @param unit    integer scale of rank 1.0
    * @param maxBroadcastNodes rank rows are two BIGINTs, so up to this
    *                many nodes the per-iteration joins broadcast the rank
    *                table (contribution join) and the contribution sums
    *                (rank update) — each iteration then costs exactly ONE
    *                exchange, the dst-keyed contribution agg. Above it,
    *                both joins fall back to Catalyst/AQE-planned
    *                distributed joins. Hints only: values are identical.
    * @param cutEvery lineage-cut cadence in iterations. A checkpointed
    *                rank frame is only load-bearing for fault recovery
    *                and plan-depth control, not correctness; cutting
    *                every k-th iteration keeps the plan ≤ k joins deep
    *                while scheduling k× fewer materialization jobs.
    * @return (node, r) — r is the nano-rank after `iters` iterations
    */
  def pageRankQuantized(edges: DataFrame, iters: Int,
                        dampNum: Long = 85L, dampDen: Long = 100L,
                        unit: Long = 1000000000L,
                        maxBroadcastNodes: Long = 2000000L,
                        cutEvery: Int = 1): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(cutEvery >= 1, "cutEvery must be positive")
    require((unit * (dampDen - dampNum)) % dampDen == 0,
      s"unit·(dampDen-dampNum) must divide by dampDen for an integral base")
    val base = unit * (dampDen - dampNum) / dampDen
    // materialize the caller's edge plan once; the degree pass and every
    // iteration's contribution join re-read the checkpoint, never the
    // (possibly join-shaped) upstream plan
    val eCut = edges.select(col("src"), col("dst")).cutLineage()
    // nodes AND out-degree from ONE map-side-combined aggregation: tag
    // src occurrences 1 and dst occurrences 0, sum per node. Kilobytes
    // per partition reach the exchange (node-sized partials), where the
    // previous src-partitioned window SORTED the full edge list to count
    // — the sort was q89's single largest stage. Dangling nodes (only
    // ever a dst) come out with deg=0 and contribute nothing, exactly
    // the old semantics. The static degree then RIDES the rank frame, so
    // no per-iteration degree join exists at all.
    val nodeDeg = eCut.select(col("src").as("node"), lit(1L).as("d"))
      .unionByName(eCut.select(col("dst").as("node"), lit(0L).as("d")))
      .groupBy(col("node")).agg(sum(col("d")).as("deg"))
      .cutLineage()
    // one count over the checkpointed node list decides the join strategy
    // for EVERY iteration — a checkpoint-backed frame has no stats, so
    // without the hint Catalyst would shuffle the edge list each round
    val small = nodeDeg.count() <= maxBroadcastNodes
    // On a broadcast-small graph every per-iteration stage is tiny and
    // pre-hinted, so AQE's runtime re-planning is pure job overhead
    // (measured: 20 jobs → 13, ~20% wall). The eager checkpoint cuts
    // execute INSIDE this scope; only the last (lazy) iteration runs
    // under the caller's conf. Large graphs keep AQE for skew/coalesce.
    val sess = edges.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val aqeWas = sess.conf.get(aqeKey, "true")
    if (small) sess.conf.set(aqeKey, "false")
    var ranks = nodeDeg.select(col("node"), lit(unit).as("r"), col("deg"))
    try {
      (1 to iters).foreach { i =>
        val rsrc = ranks.select(col("node").as("src"), col("r"), col("deg"))
        // fused update: per-edge contributions UNIONed with a zero seed
        // per node, then ONE dst-keyed agg — `base + damp·sum div dampDen`
        // with a seeded 0 is exactly the old left-join's coalesce(s, 0),
        // so one exchange replaces the contribution agg + rank-update
        // join pair. The seed rows also re-assert the static degree
        // (contribution rows carry null), so `max(deg)` restores it
        // without a join: every node has exactly one seed row.
        val contribIn = eCut
          .join(if (small) broadcast(rsrc) else rsrc, Seq("src"))
          .select(col("dst").as("node"), expr("r div deg").as("c"),
            lit(null).cast("long").as("deg"))
          // ranks always carries every node, so it doubles as the seed
          .unionByName(ranks.select(col("node"), lit(0L).as("c"), col("deg")))
        val next = contribIn.groupBy(col("node"))
          .agg(sum(col("c")).as("s"), max(col("deg")).as("deg"))
          .select(col("node"),
            (lit(base) + expr(s"($dampNum * s) div $dampDen")).as("r"),
            col("deg"))
        // lazy on the last iteration: the caller may only sample the result
        ranks =
          if (i % cutEvery == 0 || i == iters) next.cutLineage(eager = i != iters)
          else next
      }
    } finally if (small) sess.conf.set(aqeKey, aqeWas)
    ranks.select(col("node"), col("r"))
  }

  /** Exact global triangle count by degree-ordered edge orientation
    * (Schank–Wagner / Suri–Vassilvitskii "node-iterator++" as joins).
    *
    * The naive wedge join (every path u–v–w probed against the edge list)
    * generates `Σ_v deg(v)²` wedges — quadratic in the hub degree, which
    * is exactly what a power-law graph maximizes. Orienting every edge
    * from its lower-(degree, id) endpoint to its higher one caps each
    * node's OUT-degree at O(√m), so the wedge count is bounded by
    * O(m^{3/2}) regardless of skew, and each triangle is generated
    * exactly once (from its lowest-rank corner, with the other two
    * corners in rank order).
    *
    * Plan shape: canonicalize+distinct (one shuffle), a node-sized degree
    * aggregate joined back onto both endpoints (node-keyed shuffles, or
    * broadcast when Catalyst sees the stats), the wedge self-join on the
    * shared low corner, and one equi-join of wedges against oriented
    * edges on BOTH endpoints. No cartesian anywhere; every join is
    * equi-keyed, so AQE can re-split a residual hub block.
    *
    * @param edges undirected edge list as `src`, `dst` (orderable ids;
    *              duplicates, self-loops, and both orientations tolerated)
    * @return one row, `n_triangles` BIGINT
    */
  def triangleCount(edges: DataFrame): DataFrame =
    triangles(edges).agg(count(lit(1)).as("n_triangles"))

  /** Canonical undirected edge list (u < v, no self-loops, deduped) —
    * shared by [[triangles]] and [[clusteringCoefficient]]. */
  private def canonicalEdges(edges: DataFrame): DataFrame = edges
    .select(least(col("src"), col("dst")).as("u"),
      greatest(col("src"), col("dst")).as("v"))
    .where(col("u") =!= col("v"))
    .distinct()

  private def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** Every triangle, one row each, as `(a, b, c)` — the mechanics (and
    * scale bound) documented on [[triangleCount]]. Corner order is the
    * orientation's (deg, id) rank: `a` lowest. */
  def triangles(edges: DataFrame): DataFrame = {
    // canonical undirected form, checkpointed: degrees and both join
    // sides re-read it.
    val e = canonicalEdges(edges).cutLineage()
    val deg = degrees(e)
    // attach both endpoint degrees, then orient low-rank → high-rank
    // where rank = (deg, id): `a` is the triangle corner that owns the
    // wedge, and ties fall back to the id order the canonical form gives.
    val withDeg = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
    val fwd = col("du") <= col("dv") // tie: u < v already holds
    val oriented = withDeg.select(
      when(fwd, col("u")).otherwise(col("v")).as("a"),
      when(fwd, col("v")).otherwise(col("u")).as("b"),
      when(fwd, col("dv")).otherwise(col("du")).as("db"))
      .cutLineage()
    // wedges from the low corner: unordered high-pair (b, c) canonicalized
    // by the SAME (deg, id) rank the orientation uses, so the closing edge
    // is oriented b → c by construction and ONE equi-join probe finds it.
    val o1 = oriented.select(col("a"), col("b"), col("db"))
    val o2 = oriented.select(col("a"), col("b").as("c"), col("db").as("dc"))
    val wedges = o1.join(o2, Seq("a"))
      .where((col("db") < col("dc")) ||
        (col("db") === col("dc") && col("b") < col("c")))
    wedges
      .join(oriented.select(col("a").as("b"), col("b").as("c")), Seq("b", "c"))
      .select(col("a"), col("b"), col("c"))
  }

  /** Per-node local clustering coefficient in exact integer arithmetic.
    *
    * `cc(v) = 2·T(v) / (deg(v)·(deg(v)−1))` — reported as the
    * micro-unit floor `cc_e6 = (2·T·10⁶) div (deg·(deg−1))` so the
    * value is bit-portable (no float division). Each triangle row from
    * [[triangles]] is exploded to its three corners (bounded 3× fan-out
    * of triangle count, not edges) and counted per node; nodes of
    * degree < 2 report 0 triangles and cc 0 (the standard convention),
    * and every node appears — the degree frame, not the triangle set,
    * drives the output.
    *
    * @return (node, deg, n_tri, cc_e6), one row per node
    */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val e = canonicalEdges(edges).cutLineage()
    val perNode = triangles(e.select(col("u").as("src"), col("v").as("dst")))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    degrees(e)
      .join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
      .withColumn("cc_e6",
        // the numerator in DECIMAL(38,0): 2·T·10⁶ wraps Int64 silently
        // once a node corners ~4.6·10¹² triangles (deg ≳ 3·10⁶ in a
        // dense neighborhood); 128-bit exact keeps the division right at
        // any real degree (deg² ≤ ~10³⁸ ⇒ deg up to ~10¹⁹)
        when(col("deg") < 2, lit(0L)).otherwise(
          expr("cast((2 * cast(n_tri as decimal(38,0)) * 1000000)" +
            " div (deg * (deg - 1)) as bigint)")))
  }

  /** k-core subgraph by iterative peeling: repeatedly drop every node of
    * degree < k (with its edges) until the survivor set is stable — the
    * standard dense-region extractor (and the graph-side spam/quality
    * filter a link-graph curation pipeline runs before PageRank).
    *
    * Each round is the same two shuffles as one CC round: a node-sized
    * degree aggregate and a two-sided semi-join of the edge list against
    * the survivor set, lineage-cut per round. Convergence is decided by
    * edge-count fixpoint — ONE driver scalar per round, carrying the
    * previous count so each round pays exactly one count job. Peeling is
    * monotone (the survivor set only shrinks), so a converged result is
    * THE k-core regardless of round order; if `maxIter` rounds don't
    * reach the fixpoint the op REFUSES rather than returning a
    * part-peeled graph (same contract as the CC iteration guard).
    *
    * @return (node, deg) — nodes of the k-core with their degree WITHIN
    *         the core (all ≥ k)
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 20): DataFrame = {
    require(k >= 1, "k must be positive")
    require(maxIter >= 1, "maxIter must be positive")
    var e = canonicalEdges(edges).cutLineage()
    var prevCount = e.count()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      val keep = degrees(e).where(col("deg") >= k).select(col("node"))
      val next = e
        .join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .cutLineage()
      val n = next.count()
      converged = n == prevCount
      prevCount = n
      e = next
    }
    require(converged,
      s"k-core peeling did not converge within $maxIter rounds — raise " +
        s"maxIter (each round is two shuffles; rounds needed are bounded " +
        s"by the longest peel chain, not graph size)")
    degrees(e)
  }

  /** Multi-source BFS: assign every reachable node to its NEAREST seed
    * (hop distance; ties at equal distance broken by MINIMUM seed id) —
    * the influence/partition-assignment primitive (nearest hub, nearest
    * canonical document, Voronoi-ish graph cells).
    *
    * Same frontier shape as [[bfsDistances]] with a label riding along:
    * each round expands the frontier through the edge list, takes
    * `min(seed)` per newly-reached node, and anti-joins the visited set.
    * min-of-mins equals the global minimum over all seeds reaching the
    * node at that distance — each seed's shortest path runs through
    * SOME frontier neighbor whose label is ≤ that seed — so the
    * per-round local reduction reproduces the global tie-break exactly
    * (q168's oracle recomputes it from the full path set).
    *
    * @param edges   directed edges `src`, `dst`
    * @param seeds   (node, seed) — duplicate nodes collapse to min seed
    * @param maxHops inclusive distance cap
    * @return (node, seed, dist) for every node within `maxHops` of a seed
    */
  def nearestSeeds(edges: DataFrame, seeds: DataFrame,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val eCut = edges.select(col("src"), col("dst")).cutLineage()
    // a null seed id would silently vanish through every min(); drop it
    // at the door so "no label" can't masquerade as a labeled node
    var visited = seeds
      .where(col("node").isNotNull && col("seed").isNotNull)
      .groupBy(col("node")).agg(min(col("seed")).as("seed"))
      .select(col("node"), col("seed"), lit(0L).as("dist"))
      .cutLineage()
    var frontier = visited
    var hop = 0L
    var exhausted = false
    while (hop < maxHops && !exhausted) {
      hop += 1
      val next = eCut
        .join(frontier.select(col("node").as("src"), col("seed")), Seq("src"))
        .select(col("dst").as("node"), col("seed"))
        .groupBy(col("node")).agg(min(col("seed")).as("seed"))
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .select(col("node"), col("seed"), lit(hop).as("dist"))
        .cutLineage()
      if (next.isEmpty) exhausted = true
      else {
        visited = visited.unionByName(next).cutLineage()
        frontier = next
      }
    }
    visited
  }

  /** Hop-bounded single-source WEIGHTED shortest paths (distributed
    * Bellman-Ford): after round h, `cost(v)` is the exact minimum total
    * weight over all walks from the source to v using ≤ h edges.
    *
    * Each round is one relaxation — the cost frame joins the edge list
    * on `src`, candidate costs `cost + w` union the standing frame, and
    * ONE node-keyed min collapses them — so a round is one edge-keyed
    * join plus one node-keyed aggregate, lineage-cut, nothing driver-
    * side at all. The hop bound IS the iteration count (no convergence
    * collect), which also makes the semantics well-defined for negative
    * weights: min over ≤ maxHops-edge WALKS, exactly what the q170
    * oracle's recursive enumeration computes. Integer weights keep the
    * min exact and engine-portable.
    *
    * @param edges   directed weighted edges `src`, `dst`, `w` (integral)
    * @param source  start node id
    * @param maxHops relaxation rounds (= max edges per walk)
    * @return (node, cost) for nodes reachable within `maxHops` edges
    */
  def ssspBounded(edges: DataFrame, source: Long, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val spark = edges.sparkSession
    import spark.implicits._
    val eCut = edges.select(col("src"), col("dst"), col("w")).cutLineage()
    var dist = Seq((source, 0L)).toDF("node", "cost")
    (1 to maxHops).foreach { h =>
      val cand = eCut
        .join(dist.select(col("node").as("src"), col("cost")), Seq("src"))
        .select(col("dst").as("node"), (col("cost") + col("w")).as("cost"))
      dist = dist.unionByName(cand)
        .groupBy(col("node")).agg(min(col("cost")).as("cost"))
        .cutLineage(eager = h != maxHops)
    }
    dist
  }

  /** Single-source BFS distances by frontier iteration (capped hops).
    *
    * Per round: the frontier (nodes first reached last round) joins the
    * edge list on `src`, the reached `dst`s are anti-joined against the
    * visited set, and the survivors — min'd per node, because one round
    * can reach a node through many frontier edges — become the next
    * frontier at `dist+1`. Each round is therefore one edge-keyed join
    * plus two node-keyed shuffles over FRONTIER-sized data; the visited
    * set only ever grows to |V| rows of two BIGINTs.
    *
    * Contrast with the recursive-CTE form (q133's engine feature): the
    * CTE's UNION dedups against the whole accumulated history every
    * round and re-walks nodes at every distance they're reachable at
    * (|V|·maxHops rows); the frontier form touches each node once. The
    * CTE is the right tool for chain-walks; this is the right shape for
    * a 100 TB graph.
    *
    * Unreachable nodes are absent from the output (standard BFS
    * contract); `maxHops` bounds both the row count and the round count,
    * and an empty frontier short-circuits (one count per round — the
    * same driver-scalar-per-iteration budget PageRank's strategy pick
    * spends once).
    *
    * @param edges   directed edges `src`, `dst`
    * @param source  start node id
    * @param maxHops inclusive distance cap (≥ 0)
    * @return (node, dist) — BFS distance ≤ maxHops from `source`
    */
  def bfsDistances(edges: DataFrame, source: Long, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val spark = edges.sparkSession
    import spark.implicits._
    val eCut = edges.select(col("src"), col("dst")).cutLineage()
    var visited = Seq((source, 0L)).toDF("node", "dist")
    var frontier = visited
    var hop = 0L
    var exhausted = false
    while (hop < maxHops && !exhausted) {
      hop += 1
      val next = eCut
        .join(frontier.select(col("node").as("src")), Seq("src"))
        .select(col("dst").as("node"))
        // one round reaches a node via many edges; collapse BEFORE the
        // anti-join so the visited probe is node-distinct
        .distinct()
        .join(visited, Seq("node"), "left_anti")
        .select(col("node"), lit(hop).as("dist"))
        .cutLineage()
      if (next.isEmpty) exhausted = true
      else {
        visited = visited.unionByName(next).cutLineage()
        frontier = next
      }
    }
    visited
  }
}
