package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Lineage.LineageSyntax
import graft.sinks.AppendOnlyStore

/** Incrementally-maintained k-iteration PageRank under SIGNED edge
  * deltas — the maintained twin of [[GraphOps.pageRankQuantized]]
  * (q89), exact to the bit.
  *
  * The insight that makes iterated PageRank maintainable at all: after
  * a fixed number of iterations k, a batch of edge inserts/deletes can
  * only change the rank of nodes within the k-hop OUT-closure of the
  * touched endpoints. Level-1 ranks depend on in-edges and source
  * out-degrees; both change only at the batch's endpoints, so level-1
  * changes live in `outNbr(T0)`; inductively level-i changes live in
  * `C_i = C_{i-1} ∪ outNbr(C_{i-1})` with `C_0 = T0` (changes
  * propagate one hop per iteration, the same locality that makes the
  * power iteration converge). Each batch therefore re-solves ONLY that
  * closure, reading two kinds of boundary state from the stores:
  * surviving edges into the closure, and the STORED rank vectors of
  * in-neighbors outside it (provably unchanged — they sit outside
  * `C_{i-1}` at the level that consumes them).
  *
  * Exactness rides on the quantized integer arithmetic
  * ([[GraphOps.pageRankQuantized]]'s nano-rank contract): every
  * per-node sum is order-independent, so the re-solved closure merged
  * with untouched state is row-identical to a from-scratch run over
  * the net edge set — q201's DuckDB oracle hash-gates exactly that.
  *
  * State: two signed multiset stores ([[IncrementalAgg]] — manifest
  * replays, compaction, generation swap inherited):
  *  - `edges`: (src, dst) net multiplicity; net > 0 = live
  *    (simple-graph contract, same as the CC/triangle family);
  *  - `ranks`: one row per LIVE node, key = the full vector
  *    (node, deg, r1..rk) — only CHANGED vectors append (−old +new),
  *    so per-batch rank IO ∝ |closure|, never |graph|.
  *
  * Both stores are scanned, never shuffled whole: every state read
  * semi-joins raw partials (size-guarded broadcast, on key columns —
  * key-complete per [[IncrementalAgg.currentFrom]]'s contract) to
  * closure-sized key sets BEFORE the refold's groupBy, so per-batch
  * shuffle bytes are bounded by the touched neighborhood and stay flat
  * while untouched state grows (ShuffleBytesSpec gate). Per-batch cost
  * ∝ the k-hop closure's incident edges — the exact-IVM floor: a
  * changed rank cannot be served without recomputing it. A hub that
  * makes the closure graph-sized trips [[GraphIvmKit]]'s broadcast
  * guard (shuffle fallback) and wide-region cutover (batch recompute),
  * both result-identical (GraphIvmGuardSpec).
  *
  * Node-existence semantics match the batch op: a node exists while it
  * has a live in- OR out-edge; deleting a node's last edge removes its
  * vector entirely (the right-to-be-forgotten contract at the rank
  * layer). Dangling nodes (deg = 0) hold rank and contribute nothing,
  * exactly as the batch op and the q89 oracle treat them. */
object IncrementalPageRank {

  /** Must be identical across every call against one store root (the
    * rank-vector schema is derived from it). Defaults match q89. */
  final case class Config(iters: Int = 3, dampNum: Long = 85L,
                          dampDen: Long = 100L, unit: Long = 1000000000L) {
    require(iters >= 1, "need at least one iteration")
    require((unit * (dampDen - dampNum)) % dampDen == 0,
      "unit·(dampDen-dampNum) must divide by dampDen for an integral base")
    def base: Long = unit * (dampDen - dampNum) / dampDen
    def rankCols: Seq[String] = (1 to iters).map(i => s"r$i")
  }

  final case class Stores(ranks: AppendOnlyStore, edges: AppendOnlyStore,
                          cfg: Config)

  private val edgeSpec = IncrementalAgg.Spec(Seq("src", "dst"), Nil)
  private def rankSpec(cfg: Config) =
    IncrementalAgg.Spec(Seq("node", "deg") ++ cfg.rankCols, Nil)
  private def vecCols(cfg: Config) = "node" +: "deg" +: cfg.rankCols

  def stores(spark: SparkSession, root: String,
             cfg: Config = Config()): Stores = Stores(
    new AppendOnlyStore(spark, s"$root/ranks",
      prefixCol = "__agg_key", prefixChars = 1),
    new AppendOnlyStore(spark, s"$root/edges",
      prefixCol = "__agg_key", prefixChars = 1),
    cfg)

  import GraphIvmKit.fresh

  private def emptyVec(s: SparkSession, cfg: Config): DataFrame =
    s.range(0).select(vecCols(cfg).map(c => col("id").as(c)): _*)

  /** Live (node, deg, r1..rk) — rk is THE k-iteration PageRank. */
  def currentRanks(st: Stores): DataFrame =
    if (st.ranks.hasSchema)
      IncrementalAgg.current(st.ranks, rankSpec(st.cfg))
        .select(vecCols(st.cfg).map(col): _*)
    else emptyVec(st.ranks.session, st.cfg)

  /** Apply one SIGNED batch of DIRECTED edges (`deltaCol` ±1 per row;
    * symmetrize upstream for an undirected graph, like q89 does).
    * Exactly-once per `batchId`: every state read excludes this batch
    * id, so a crash-replay recomputes the identical emit and the
    * (key, batch) dedup absorbs it. */
  def appendDelta(st: Stores, batch: DataFrame, batchId: Long,
                  srcCol: String = "src", dstCol: String = "dst",
                  deltaCol: String = "__delta"): Unit = {
    // a batch committed to BOTH stores is a replay (e.g. after a
    // compaction folded its rows past the read-side exclusion) — the
    // appendOnce manifests would discard the emit anyway, so skip the
    // whole closure re-solve
    if (st.ranks.hasApplied(batchId) && st.edges.hasApplied(batchId)) return
    val cfg = st.cfg
    val sess = st.ranks.session
    val d = fresh(batch.select(
        col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(deltaCol).cast("long").as("__delta"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(sum(col("__delta")).as("__delta"))
      .where(col("__delta") =!= 0).cutLineage())

    // pin the raw partial scans for this batch: the closure loop and
    // every state read below re-scan them (a cache of a scan — the
    // shuffle posture is unchanged; see IncrementalKCore's note)
    val ep =
      if (st.edges.hasSchema)
        st.edges.read().filter(col("__batch_id") =!= lit(batchId)).persist()
      else null
    val rp =
      if (st.ranks.hasSchema)
        st.ranks.read().filter(col("__batch_id") =!= lit(batchId)).persist()
      else null
    try {

    // ---- k-hop out-closure of the touched endpoints, over old ∪ new
    // edges; one semi-joined store scan per hop (GraphIvmKit posture).
    // When the closure crosses the cutover bound (a hub component made
    // the touched region graph-sized) switch to the batch recompute:
    // affected = every post-batch node, boundary empties out below, and
    // the re-solve loop over all nodes IS pageRankQuantized — identical
    // results at the cost the closure path was about to exceed.
    val (closure, wide) = GraphIvmKit.kHopOutClosure(d, ep, edgeSpec,
      cfg.iters, GraphIvmKit.cutoverRows(ep))
    val affected =
      if (wide) GraphIvmKit.allTouchedNodes(d, ep, edgeSpec, "src", "dst")
      else closure

    // edges INTO closure nodes (drive every contribution sum below);
    // materialized: re-joined once per iteration level
    val liveIn = fresh(GraphIvmKit.postBatchLive(d, ep, edgeSpec, "dst",
      affected).cutLineage())
    // new out-degrees of closure nodes (sources of live out-edges)
    val degNew = fresh(GraphIvmKit.postBatchLive(d, ep, edgeSpec, "src",
        affected)
      .groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg")).cutLineage())
    // a closure node is LIVE iff it kept an in- or out-edge
    val rLive = fresh(liveIn.select(col("dst").as("node"))
      .unionByName(degNew.select(col("node"))).distinct().cutLineage())

    // ---- boundary: stored vectors of in-neighbors OUTSIDE the
    // closure — unchanged by this batch (they sit outside C_{i-1} at
    // the level that consumes them), so their stored (deg, r_i) are
    // current. Semi-join on `node` (a key column) before the refold.
    val inSrcs = fresh(liveIn.select(col("src").as("node")).distinct()
      .cutLineage())
    val boundary =
      if (rp == null) emptyVec(sess, cfg)
      else fresh(IncrementalAgg.currentFrom(
          rp.join(GraphIvmKit.guarded(inSrcs), Seq("node"), "left_semi"),
          rankSpec(cfg))
        .select(vecCols(cfg).map(col): _*)
        .join(GraphIvmKit.guarded(affected), Seq("node"), "left_anti")
        .cutLineage())

    // ---- re-solve the closure: k quantized levels, sources drawn
    // from the recomputed frame (closure) ∪ the boundary vectors
    var cur = fresh(rLive.join(degNew, Seq("node"), "left")
      .select(col("node"), coalesce(col("deg"), lit(0L)).as("deg"))
      .cutLineage())
    (1 to cfg.iters).foreach { i =>
      def prevRank(df: DataFrame) =
        if (i == 1) lit(cfg.unit) else df(s"r${i - 1}")
      val srcState = cur.select(col("node").as("src"),
          prevRank(cur).as("rp"), col("deg"))
        .unionByName(boundary.select(col("node").as("src"),
          prevRank(boundary).as("rp"), col("deg")))
      val sums = liveIn.join(srcState, Seq("src"))
        .select(col("dst").as("node"), expr("rp div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("__s"))
      cur = fresh(cur.join(sums, Seq("node"), "left")
        .withColumn(s"r$i", lit(cfg.base) +
          expr(s"(${cfg.dampNum} * coalesce(__s, 0)) div ${cfg.dampDen}"))
        .drop("__s").cutLineage())
    }

    // ---- only CHANGES append: new/changed vectors insert, stale and
    // dead-node vectors retract (a takedown removing a node's last
    // edge removes it from the served ranks entirely)
    val newVec = fresh(cur.select(vecCols(cfg).map(col): _*).cutLineage())
    val oldVec =
      if (rp == null) emptyVec(sess, cfg)
      else fresh(IncrementalAgg.currentFrom(
          rp.join(GraphIvmKit.guarded(affected), Seq("node"), "left_semi"),
          rankSpec(cfg))
        .select(vecCols(cfg).map(col): _*).cutLineage())
    val emit = GraphIvmKit.diffEmit(newVec, oldVec, vecCols(cfg))
    IncrementalAgg.appendDelta(st.ranks, emit, rankSpec(cfg), batchId)
    IncrementalAgg.appendDelta(st.edges, d, edgeSpec, batchId)
    } finally {
      if (ep != null) ep.unpersist(blocking = false)
      if (rp != null) rp.unpersist(blocking = false)
    }
  }

  /** Compact both stores (quiescence, single-writer). */
  def compact(st: Stores): Unit = {
    IncrementalAgg.compact(st.ranks, rankSpec(st.cfg))
    IncrementalAgg.compact(st.edges, edgeSpec)
  }
}
