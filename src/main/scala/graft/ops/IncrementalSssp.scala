package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Lineage.LineageSyntax
import graft.sinks.AppendOnlyStore

/** Incrementally-maintained hop-bounded single-source shortest paths
  * under SIGNED weighted-edge deltas — the maintained twin of
  * [[GraphOps.ssspBounded]] (q170), exact (min-plus over integers has
  * no tolerance to hide behind).
  *
  * Same locality as [[IncrementalPageRank]]: level-i distances
  * `d_i(v) = min(d_{i-1}(v), min over live in-edges (u,v,w) of
  * d_{i-1}(u) + w)` depend on in-edges and in-neighbor level-(i−1)
  * values only, so a batch's effect is confined to the k-hop
  * OUT-closure of its touched endpoints ([[GraphIvmKit]]). Each batch
  * re-solves that closure with boundary distances read from the store
  * (provably unchanged outside the closure), and emits only changed
  * per-node distance vectors.
  *
  * State: `edges` — signed (src, dst, w) multiset (net > 0 = live;
  * parallel edges with distinct weights coexist, the relax takes the
  * min); `dists` — one row per node REACHABLE within k hops, key =
  * (node, d1..dk), unreachable-at-level encoded as the INF sentinel
  * (never null — the diff's anti-joins must match exactly). The
  * source's own row is never stored (constant 0) and is appended at
  * serve time, so a graph that never touches the source still serves
  * it — matching the batch op's unconditional seed.
  *
  * Weight contract: non-negative longs with `max path sum < INF/2`
  * (the relax filters `d < INF` before adding, so the sentinel never
  * participates in arithmetic). Node-existence: a node serves exactly
  * while it is reachable within k hops of the source over LIVE edges —
  * a takedown that severs a subtree removes the subtree's rows. */
object IncrementalSssp {

  /** Sentinel for "not reachable at this level". */
  val INF: Long = Long.MaxValue / 4

  /** Must be identical across every call against one store root. */
  final case class Config(source: Long, maxHops: Int) {
    require(maxHops >= 1, "need at least one hop")
    def distCols: Seq[String] = (1 to maxHops).map(i => s"d$i")
  }

  final case class Stores(dists: AppendOnlyStore, edges: AppendOnlyStore,
                          cfg: Config)

  private val edgeSpec = IncrementalAgg.Spec(Seq("src", "dst", "w"), Nil)
  private def distSpec(cfg: Config) =
    IncrementalAgg.Spec("node" +: cfg.distCols, Nil)
  private def vecCols(cfg: Config) = "node" +: cfg.distCols

  def stores(spark: SparkSession, root: String, cfg: Config): Stores =
    Stores(
      new AppendOnlyStore(spark, s"$root/dists",
        prefixCol = "__agg_key", prefixChars = 1),
      new AppendOnlyStore(spark, s"$root/edges",
        prefixCol = "__agg_key", prefixChars = 1),
      cfg)

  import GraphIvmKit.fresh

  private def emptyVec(s: SparkSession, cfg: Config): DataFrame =
    s.range(0).select(vecCols(cfg).map(c => col("id").as(c)): _*)

  private def sourceRow(s: SparkSession, cfg: Config): DataFrame =
    s.range(1).select(
      (lit(cfg.source).as("node") +:
        cfg.distCols.map(c => lit(0L).as(c))): _*)

  /** Live (node, cost) — cost = the k-hop-bounded shortest distance;
    * the source is always served at 0, like the batch op's seed. */
  def currentDists(st: Stores): DataFrame = {
    val cfg = st.cfg
    val stored =
      if (st.dists.hasSchema)
        IncrementalAgg.current(st.dists, distSpec(cfg))
          .select(vecCols(cfg).map(col): _*)
      else emptyVec(st.dists.session, cfg)
    stored.unionByName(sourceRow(st.dists.session, cfg))
      .select(col("node"), col(s"d${cfg.maxHops}").as("cost"))
  }

  /** Apply one SIGNED batch of DIRECTED weighted edges (`deltaCol` ±1
    * per row; a weight update is −old +new). Exactly-once per
    * `batchId` under crash-replay, same contract as the family. */
  def appendDelta(st: Stores, batch: DataFrame, batchId: Long,
                  srcCol: String = "src", dstCol: String = "dst",
                  wCol: String = "w", deltaCol: String = "__delta"): Unit = {
    // a batch committed to BOTH stores is a replay (e.g. after a
    // compaction folded its rows past the read-side exclusion) — skip
    // the re-solve; the appendOnce manifests would discard it anyway
    if (st.dists.hasApplied(batchId) && st.edges.hasApplied(batchId)) return
    val cfg = st.cfg
    val sess = st.dists.session
    val d = fresh(batch.select(
        col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(wCol).cast("long").as("w"),
        col(deltaCol).cast("long").as("__delta"))
      .where(col("src").isNotNull && col("dst").isNotNull &&
        col("w").isNotNull)
      .groupBy(col("src"), col("dst"), col("w"))
      .agg(sum(col("__delta")).as("__delta"))
      .where(col("__delta") =!= 0).cutLineage())
    // min-plus over non-negative weights is the operator's contract
    // (the batch twin GraphOps.ssspBounded shares it); an invalid batch
    // must fail LOUDLY here, not silently diverge from the batch op by
    // dropping rows — family convention for contract violations
    require(d.filter(col("w") < 0).isEmpty,
      "IncrementalSssp: batch contains negative edge weights — the " +
        "hop-bounded min-plus relax is only defined for w >= 0")

    // pin the raw partial scans for this batch (family posture — see
    // IncrementalKCore's note; cache of a scan, not a state shuffle)
    val ep =
      if (st.edges.hasSchema)
        st.edges.read().filter(col("__batch_id") =!= lit(batchId)).persist()
      else null
    val dp =
      if (st.dists.hasSchema)
        st.dists.read().filter(col("__batch_id") =!= lit(batchId)).persist()
      else null
    try {

    // closure discovery with the wide-region cutover: a hub component
    // can make the touched closure graph-sized, at which point the
    // batch recompute is cheaper — affected becomes every post-batch
    // node (live endpoints ∪ batch endpoints so dead subtrees still
    // retract), the boundary empties out, and the relax loop over all
    // nodes IS ssspBounded. Results identical either way.
    val (closure, wide) = GraphIvmKit.kHopOutClosure(d, ep, edgeSpec,
      cfg.maxHops, GraphIvmKit.cutoverRows(ep))
    val affected =
      if (wide) GraphIvmKit.allTouchedNodes(d, ep, edgeSpec, "src", "dst")
      else closure
    // live in-edges of the closure; re-joined once per relax level
    val liveIn = fresh(GraphIvmKit.postBatchLive(d, ep, edgeSpec, "dst",
      affected).cutLineage())

    // boundary: stored vectors of in-neighbors OUTSIDE the closure,
    // plus the source's constant vector (never stored; duplicates are
    // harmless under min but the anti-join removes an in-closure source
    // anyway — its distances are recomputed like any node's)
    val inSrcs = fresh(liveIn.select(col("src").as("node")).distinct()
      .cutLineage())
    val storedBoundary =
      if (dp == null) emptyVec(sess, cfg)
      else IncrementalAgg.currentFrom(
          dp.join(GraphIvmKit.guarded(inSrcs), Seq("node"), "left_semi"),
          distSpec(cfg))
        .select(vecCols(cfg).map(col): _*)
    val boundary = fresh(storedBoundary
      .unionByName(sourceRow(sess, cfg))
      .join(GraphIvmKit.guarded(affected), Seq("node"), "left_anti")
      .cutLineage())

    // re-solve the closure: k relax levels over liveIn, sources drawn
    // from the recomputed frame ∪ boundary; d0 = 0 at source, INF else
    var cur = fresh(affected.select(col("node"),
      when(col("node") === cfg.source, 0L).otherwise(INF).as("d0"))
      .cutLineage())
    (1 to cfg.maxHops).foreach { i =>
      val prev = s"d${i - 1}"
      def level(df: DataFrame) =
        if (i == 1) when(df("node") === cfg.source, 0L).otherwise(INF)
        else df(prev)
      val srcState = cur.select(col("node").as("src"), col(prev).as("rp"))
        .unionByName(boundary.select(col("node").as("src"),
          level(boundary).as("rp")))
      val mins = liveIn.join(srcState, Seq("src"))
        .filter(col("rp") < INF)
        .select(col("dst").as("node"), (col("rp") + col("w")).as("c"))
        .groupBy(col("node")).agg(min(col("c")).as("__m"))
      cur = fresh(cur.join(mins, Seq("node"), "left")
        .withColumn(s"d$i", least(col(prev), col("__m")))
        .drop("__m").cutLineage())
    }

    // only CHANGES append; the source row is constant and never stored
    val newVec = fresh(cur
      .filter(col(s"d${cfg.maxHops}") < INF && col("node") =!= cfg.source)
      .select(vecCols(cfg).map(col): _*).cutLineage())
    val oldVec =
      if (dp == null) emptyVec(sess, cfg)
      else fresh(IncrementalAgg.currentFrom(
          dp.join(GraphIvmKit.guarded(affected), Seq("node"), "left_semi"),
          distSpec(cfg))
        .select(vecCols(cfg).map(col): _*).cutLineage())
    val emit = GraphIvmKit.diffEmit(newVec, oldVec, vecCols(cfg))
    IncrementalAgg.appendDelta(st.dists, emit, distSpec(cfg), batchId)
    IncrementalAgg.appendDelta(st.edges, d, edgeSpec, batchId)
    } finally {
      if (ep != null) ep.unpersist(blocking = false)
      if (dp != null) dp.unpersist(blocking = false)
    }
  }

  /** Compact both stores (quiescence, single-writer). */
  def compact(st: Stores): Unit = {
    IncrementalAgg.compact(st.dists, distSpec(st.cfg))
    IncrementalAgg.compact(st.edges, edgeSpec)
  }
}
