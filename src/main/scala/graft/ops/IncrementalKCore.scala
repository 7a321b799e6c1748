package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Lineage.LineageSyntax
import graft.sinks.AppendOnlyStore

/** Incrementally-maintained k-CORE under SIGNED edge deltas — the
  * maintained twin of [[GraphOps.kCore]] (q167).
  *
  * Unlike rank/distance propagation, core membership is not k-hop
  * bounded: one deleted edge can unravel an arbitrarily long peel
  * cascade. The maintained form is instead CASCADE-bounded, the exact
  * cost floor for this operator — per batch it touches the nodes that
  * actually change state plus their immediate frontier, never the
  * graph:
  *
  *  - **Deletion cascade** (phase A): core endpoints of edges that
  *    transitioned live→dead are re-checked against the kept core;
  *    nodes dropping below k leave, their kept core neighbors are
  *    re-checked, to fixpoint. Removal is sound because the kept set
  *    always contains the true new core restricted to the old core, so
  *    a node measured below k against it cannot be core. Pure-deletion
  *    batches converge to the exact core this way.
  *
  *  - **Insertion region** (phase B): nodes that can JOIN are confined
  *    to the region reachable from born-edge endpoints via non-core
  *    nodes of full post-batch degree ≥ k (any new-member component
  *    with no born edge incident would have been a valid min-degree-k
  *    subgraph before the batch, contradicting the old core's
  *    maximality — the same argument re-admits phase-A over-removals
  *    whose support was new joiners). The region is peeled ANCHORED on
  *    the kept core (insertions never evict members), and the
  *    survivors are exactly the new members.
  *
  * State: `edges` — signed canonical (u < v) multiset, net > 0 = live;
  * `core` — one row per member, key = (node, deg) with deg = the
  * node's degree INSIDE the core (q167's served shape); only changed
  * rows append. Every state read semi-joins raw partials to
  * frontier-sized key sets before the refold (family posture; gated by
  * ShuffleBytesSpec), so per-batch shuffle is cascade-bounded while
  * untouched core/edge state grows freely. */
object IncrementalKCore {

  final case class Config(k: Int, maxRounds: Int = 200) {
    require(k >= 1, "k must be positive")
    require(maxRounds >= 1, "maxRounds must be positive")
  }

  final case class Stores(core: AppendOnlyStore, edges: AppendOnlyStore,
                          cfg: Config)

  private val edgeSpec = IncrementalAgg.Spec(Seq("u", "v"), Nil)
  private val coreSpec = IncrementalAgg.Spec(Seq("node", "deg"), Nil)

  import GraphIvmKit.fresh

  def stores(spark: SparkSession, root: String, cfg: Config): Stores =
    Stores(
      new AppendOnlyStore(spark, s"$root/core",
        prefixCol = "__agg_key", prefixChars = 1),
      new AppendOnlyStore(spark, s"$root/edges",
        prefixCol = "__agg_key", prefixChars = 1),
      cfg)

  /** Live (node, deg) — deg is the node's degree within the core. */
  def currentCore(st: Stores): DataFrame =
    if (st.core.hasSchema)
      IncrementalAgg.current(st.core, coreSpec)
        .select(col("node"), col("deg"))
    else st.core.session.range(0)
      .select(col("id").as("node"), col("id").as("deg"))

  /** Apply one SIGNED batch of UNDIRECTED edges (`deltaCol` ±1 per
    * row). Exactly-once per `batchId` under crash-replay, same
    * contract as the family. */
  def appendDelta(st: Stores, batch: DataFrame, batchId: Long,
                  srcCol: String = "src", dstCol: String = "dst",
                  deltaCol: String = "__delta"): Unit = {
    // fully-committed replay (e.g. post-compaction): skip the peel
    if (st.core.hasApplied(batchId) && st.edges.hasApplied(batchId))
      return
    val d = fresh(batch.select(
        least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"),
        col(deltaCol).cast("long").as("__delta"))
      .where(col("u").isNotNull && col("v").isNotNull &&
        col("u") =!= col("v"))
      .groupBy(col("u"), col("v")).agg(sum(col("__delta")).as("__delta"))
      .where(col("__delta") =!= 0).cutLineage())

    // the cascade/region loops below re-read both stores once per
    // frontier hop — pin the raw partial scans for the duration of this
    // batch so hop N doesn't re-pay hop 1's parquet read. This is a
    // cache of a SCAN (partition-lazy, spills, evicts under pressure),
    // not a shuffle of state — the per-batch shuffle stays
    // frontier-bounded (ShuffleBytesSpec) and at cluster scale an
    // evicted partition just re-reads its file.
    val ep =
      if (st.edges.hasSchema)
        st.edges.read().filter(col("__batch_id") =!= lit(batchId)).persist()
      else null
    val cp =
      if (st.core.hasSchema)
        st.core.read().filter(col("__batch_id") =!= lit(batchId)).persist()
      else null
    try appendDeltaPinned(st, batchId, d, ep, cp)
    finally {
      if (ep != null) ep.unpersist(blocking = false)
      if (cp != null) cp.unpersist(blocking = false)
    }
  }

  private def appendDeltaPinned(st: Stores, batchId: Long, d: DataFrame,
                                ep: DataFrame, cp: DataFrame): Unit = {
    val k = st.cfg.k.toLong
    val sess = st.core.session

    def emptyNodes: DataFrame = sess.range(0).select(col("id").as("node"))
    def emptyCore: DataFrame =
      sess.range(0).select(col("id").as("node"), col("id").as("deg"))

    // oriented (node, nbr) views: the canonical (u, v) rows doubled to
    // both directions BEFORE the semi-join + refold, so one incident
    // read costs ONE scan and ONE shuffle where the naive
    // per-side probe pays two of each — the loops below run this once
    // per frontier hop, so the constant matters
    val oriSpec = IncrementalAgg.Spec(Seq("node", "nbr"), Nil)
    def orient2(df: DataFrame, a: String, b: String): DataFrame = {
      val rest = df.columns.filterNot(c => c == a || c == b).map(col)
      df.select(col(a).as("node") +: col(b).as("nbr") +: rest.toSeq: _*)
        .unionByName(
          df.select(col(b).as("node") +: col(a).as("nbr") +: rest.toSeq: _*))
    }

    /** Live post-batch incident edges ORIENTED from each key node:
      * (node, nbr) — a key-incident edge appears once per key end. */
    def orientedFrom(keys: DataFrame): DataFrame = {
      val dOri = orient2(d, "u", "v")
        .join(GraphIvmKit.guarded(keys), Seq("node"), "left_semi")
      val merged =
        if (ep == null) dOri
        else IncrementalAgg.currentFrom(
            orient2(ep, "u", "v")
              .join(GraphIvmKit.guarded(keys), Seq("node"), "left_semi"), oriSpec)
          .select(col("node"), col("nbr"), col("n_rows").as("__delta"))
          .unionByName(dOri)
      merged.groupBy(col("node"), col("nbr"))
        .agg(sum(col("__delta")).as("__net"))
        .filter(col("__net") > 0).select(col("node"), col("nbr"))
    }

    /** Stored (pre-batch) core rows for a node set. */
    def coreRows(keys: DataFrame): DataFrame =
      if (cp == null) emptyCore
      else IncrementalAgg.currentFrom(
          cp.join(GraphIvmKit.guarded(keys), Seq("node"), "left_semi"), coreSpec)
        .select(col("node"), col("deg"))

    // ---- edge transitions restricted to the batch's keys
    val oldNet =
      if (ep == null) null
      else IncrementalAgg.currentFrom(
          ep.join(GraphIvmKit.guarded(d.select(col("u"), col("v"))), Seq("u", "v"),
            "left_semi"), edgeSpec)
        .select(col("u"), col("v"), col("n_rows").as("__old"))
    val trans = fresh({
        val withOld =
          if (oldNet == null) d.withColumn("__old", lit(0L))
          else d.join(oldNet, Seq("u", "v"), "left")
            .withColumn("__old", coalesce(col("__old"), lit(0L)))
        withOld.select(col("u"), col("v"), col("__old").as("o"),
          (col("__old") + col("__delta")).as("n"))
      }.cutLineage())
    val dead = trans.filter(col("o") > 0 && col("n") <= 0)
      .select(col("u"), col("v"))
    val born = trans.filter(col("o") <= 0 && col("n") > 0)
      .select(col("u"), col("v"))

    def endpoints(e: DataFrame): DataFrame =
      e.select(col("u").as("node"))
        .unionByName(e.select(col("v").as("node"))).distinct()

    // ---- phase A: deletion cascade over the stored core. One oriented
    // incident read per round, materialized once and reused for both
    // the degree check and the next round's frontier.
    var gone = fresh(emptyNodes.cutLineage())
    var recheck = fresh(coreRows(fresh(endpoints(dead).cutLineage()))
      .select(col("node")).cutLineage())
    var rounds = 0
    var converged = recheck.isEmpty
    while (!converged && rounds < st.cfg.maxRounds) {
      rounds += 1
      // degree of recheck nodes into the kept core (stored core \ gone)
      val ori = fresh(orientedFrom(recheck).cutLineage())
      val nbrKeys = fresh(ori.select(col("nbr").as("node")).distinct()
        .cutLineage())
      val keptNbr = coreRows(nbrKeys).select(col("node").as("nbr"))
        .join(GraphIvmKit.guarded(gone.select(col("node").as("nbr"))), Seq("nbr"),
          "left_anti")
      val degNow = ori.join(keptNbr, Seq("nbr"), "left_semi")
        .groupBy(col("node")).agg(count(lit(1)).as("dg"))
      val removeNow = fresh(recheck.join(degNow, Seq("node"), "left")
        .filter(coalesce(col("dg"), lit(0L)) < k)
        .select(col("node")).cutLineage())
      if (removeNow.isEmpty) converged = true
      else {
        gone = fresh(gone.unionByName(removeNow).distinct().cutLineage())
        // next frontier from the SAME materialized read: kept core
        // neighbors of the just-removed nodes
        val remNbrs = fresh(ori.join(GraphIvmKit.guarded(removeNow),
            Seq("node"), "left_semi")
          .select(col("nbr").as("node")).distinct().cutLineage())
        recheck = fresh(coreRows(remNbrs).select(col("node"))
          .join(GraphIvmKit.guarded(gone), Seq("node"), "left_anti").cutLineage())
        converged = recheck.isEmpty
      }
    }
    require(converged,
      s"k-core deletion cascade unconverged after ${st.cfg.maxRounds} " +
        "rounds — raise Config.maxRounds")

    /** Restrict to nodes NOT in the kept core (stored \ gone). */
    def nonCore(keys: DataFrame): DataFrame = {
      val kept = coreRows(keys).select(col("node"))
        .join(GraphIvmKit.guarded(gone), Seq("node"), "left_anti")
      keys.join(GraphIvmKit.guarded(fresh(kept.cutLineage())), Seq("node"),
        "left_anti")
    }

    /** Full post-batch degree of the key nodes, as (node, fd). */
    def fullDeg(keys: DataFrame): DataFrame =
      orientedFrom(keys).groupBy(col("node")).agg(count(lit(1)).as("fd"))

    def qualifying(keys: DataFrame): DataFrame = {
      val nc = fresh(nonCore(keys).cutLineage())
      nc.join(fullDeg(nc), Seq("node"), "left")
        .filter(coalesce(col("fd"), lit(0L)) >= k).select(col("node"))
    }

    // ---- phase B: insertion region (reachable from born endpoints via
    // non-core full-degree-≥k nodes), then the anchored peel.
    //
    // Discovery is ADAPTIVE: a few hop-paced crawl rounds (reads
    // bounded by the frontier — the common small-delta case costs only
    // what it touches), and if the frontier is still live after
    // `maxCrawlHops` the region is provably wide, so we switch to ONE
    // full pass — global qualifying shell + connected components — and
    // take the components containing the discovered seeds. The
    // fallback's full refold is the documented price of a large
    // re-admission region: total discovery cost is min(region crawl,
    // one pass over the graph), never a diameter-many-round crawl.
    val maxCrawlHops = 4
    var x = fresh(qualifying(fresh(endpoints(born).cutLineage()))
      .cutLineage())
    var frontier = x
    rounds = 0
    while (!frontier.isEmpty && rounds < maxCrawlHops) {
      rounds += 1
      val nbrs = fresh(orientedFrom(frontier)
        .select(col("nbr").as("node")).distinct()
        .join(GraphIvmKit.guarded(x), Seq("node"), "left_anti").cutLineage())
      frontier = fresh(qualifying(nbrs).cutLineage())
      x = fresh(x.unionByName(frontier).distinct().cutLineage())
    }
    if (!frontier.isEmpty) {
      // global fallback: post-batch live edges, their degrees, the
      // non-core qualifying shell, CC over the shell-induced subgraph,
      // then every component holding an already-discovered seed
      val liveAll = fresh({
          val merged =
            if (ep == null) d
            else IncrementalAgg.currentFrom(ep, edgeSpec)
              .select(col("u"), col("v"), col("n_rows").as("__delta"))
              .unionByName(d)
          merged.groupBy(col("u"), col("v"))
            .agg(sum(col("__delta")).as("__net"))
            .filter(col("__net") > 0).select(col("u"), col("v"))
        }.cutLineage())
      val degAll = orient2(liveAll, "u", "v")
        .groupBy(col("node")).agg(count(lit(1)).as("fd"))
      val keptAll =
        if (cp == null) emptyNodes
        else IncrementalAgg.currentFrom(cp, coreSpec).select(col("node"))
          .join(GraphIvmKit.guarded(gone), Seq("node"), "left_anti")
      val shellNodes = fresh(degAll.filter(col("fd") >= k)
        .select(col("node"))
        .join(keptAll, Seq("node"), "left_anti").cutLineage())
      val shellEdges = fresh(liveAll
        .join(shellNodes.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(shellNodes.select(col("node").as("v")), Seq("v"), "left_semi")
        .cutLineage())
      val labels = fresh(DedupOps.connectedComponentsAlternating(
          shellEdges, srcCol = "u", dstCol = "v")
        .select(col("node"), col("label")).cutLineage())
      val seedLabels = fresh(labels
        .join(GraphIvmKit.guarded(x), Seq("node"), "left_semi")
        .select(col("label")).distinct().cutLineage())
      x = fresh(x.unionByName(
          labels.join(GraphIvmKit.guarded(seedLabels), Seq("label"), "left_semi")
            .select(col("node")))
        .distinct().cutLineage())
    }

    // anchored peel of X: degree counts edges into keptCore ∪ X
    var xs = x
    var peeled = false
    rounds = 0
    while (!peeled && rounds < st.cfg.maxRounds) {
      rounds += 1
      if (xs.isEmpty) peeled = true
      else {
        val ori = fresh(orientedFrom(xs).cutLineage())
        val nbrKeys = fresh(ori.select(col("nbr").as("node")).distinct()
          .cutLineage())
        val keptNbr = coreRows(nbrKeys).select(col("node"))
          .join(GraphIvmKit.guarded(gone), Seq("node"), "left_anti")
        val memberNbr = keptNbr.unionByName(
            nbrKeys.join(GraphIvmKit.guarded(xs), Seq("node"), "left_semi"))
          .distinct().select(col("node").as("nbr"))
        val degIn = ori.join(memberNbr, Seq("nbr"), "left_semi")
          .groupBy(col("node")).agg(count(lit(1)).as("dg"))
        val removeNow = fresh(xs.join(degIn, Seq("node"), "left")
          .filter(coalesce(col("dg"), lit(0L)) < k)
          .select(col("node")).cutLineage())
        if (removeNow.isEmpty) peeled = true
        else xs = fresh(xs.join(GraphIvmKit.guarded(removeNow), Seq("node"),
          "left_anti").cutLineage())
      }
    }
    require(peeled,
      s"k-core anchored peel unconverged after ${st.cfg.maxRounds} " +
        "rounds — raise Config.maxRounds")
    val joiners = xs

    // ---- scope: every node whose membership or core-degree may have
    // changed — leavers, joiners, kept-core neighbors of either, and
    // kept-core endpoints of transitioned edges
    val changedNbrs = fresh(orientedFrom(
        fresh(gone.unionByName(joiners).distinct().cutLineage()))
      .select(col("nbr").as("node")).distinct().cutLineage())
    val transEnds = fresh(endpoints(dead).unionByName(endpoints(born))
      .distinct().cutLineage())
    val scope = fresh(gone.unionByName(joiners)
      .unionByName(coreRows(changedNbrs).select(col("node")))
      .unionByName(coreRows(transEnds).select(col("node")))
      .distinct().cutLineage())

    // new-core members within scope: kept ∪ joined
    val newCoreScope = fresh(coreRows(scope).select(col("node"))
      .join(GraphIvmKit.guarded(gone), Seq("node"), "left_anti")
      .unionByName(joiners).distinct().cutLineage())
    // their core-degree, counting edges whose other end is in the NEW
    // core globally (kept stored members ∪ joiners)
    val oriScope = orientedFrom(newCoreScope)
    val nbrKeys = fresh(oriScope.select(col("nbr").as("node")).distinct()
      .cutLineage())
    val newMemberNbr = fresh(coreRows(nbrKeys).select(col("node"))
      .join(GraphIvmKit.guarded(gone), Seq("node"), "left_anti")
      .unionByName(nbrKeys.join(GraphIvmKit.guarded(joiners), Seq("node"),
        "left_semi"))
      .distinct().select(col("node").as("nbr")).cutLineage())
    val newVec = fresh(oriScope
      .join(GraphIvmKit.guarded(newMemberNbr), Seq("nbr"), "left_semi")
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .cutLineage())
    val oldVec = fresh(coreRows(scope).cutLineage())
    val emit = GraphIvmKit.diffEmit(newVec, oldVec, Seq("node", "deg"))
    IncrementalAgg.appendDelta(st.core, emit, coreSpec, batchId)
    IncrementalAgg.appendDelta(st.edges, d, edgeSpec, batchId)
  }

  /** Compact both stores (quiescence, single-writer). */
  def compact(st: Stores): Unit = {
    IncrementalAgg.compact(st.core, coreSpec)
    IncrementalAgg.compact(st.edges, edgeSpec)
  }
}
