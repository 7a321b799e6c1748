package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Lineage.LineageSyntax
import graft.sinks.AppendOnlyStore

/** Incrementally-maintained CONNECTED COMPONENTS (insert-only) — live
  * dup-cluster labels as near-dup edges stream in, without re-running
  * CC over the accumulated graph per batch.
  *
  * The streaming-dedup pipelines this serves (`DedupOps.dupClusters`
  * consumers) only ever ADD pair edges — a discovered duplicate relation
  * is never retracted — so the maintained form exploits the insert-only
  * contract: component labels only MERGE (a node's label is the min
  * node id of its component, and min is monotone under union).
  *
  * State: a signed (node, label) membership multiset ([[IncrementalAgg]]
  * store — manifest replays, compaction inherited); exactly one live
  * label per node. Per batch:
  *
  *  1. the batch's endpoints look up their current labels — the set of
  *     TOUCHED components;
  *  2. every member of a touched component joins the batch edges as a
  *     STAR edge (member → its label): components are re-solved as
  *     single-hop stars, so the CC work is `batch ∪ touched members`,
  *     never the graph (untouched components are provably unaffected:
  *     no new edge reaches them);
  *  3. [[DedupOps.connectedComponentsAlternating]] labels the affected
  *     subgraph; only CHANGED memberships append (−old +new per moved
  *     node, +new for first-seen nodes).
  *
  * Merge cost ∝ Σ|touched components| + |batch| — the amortized
  * union-find bound's distributed analog; a batch touching nothing big
  * costs its own size. The label store is SCANNED per batch but never
  * shuffled whole: both state lookups semi-join the raw partials to
  * delta-sized key sets (batch nodes, then touched labels) BEFORE the
  * refold's groupBy, so per-batch shuffle bytes are bounded by the
  * touched membership, flat while untouched state grows (gated by
  * ShuffleBytesSpec). Serve cost: one state scan (∝ nodes).
  *
  * The one-label-per-node invariant also makes this the maintained form
  * of `dupClusters`' canonical-survivor rule: `node == label` IS the
  * cluster canonical. */
object IncrementalCc {

  final case class Stores(labels: AppendOnlyStore)

  private val spec = IncrementalAgg.Spec(Seq("node", "label"), Nil)

  def stores(spark: SparkSession, root: String): Stores = Stores(
    new AppendOnlyStore(spark, s"$root/labels",
      prefixCol = "__agg_key", prefixChars = 1))

  /** Live (node, label) — label = min node id of the component. */
  def currentLabels(st: Stores): DataFrame =
    if (st.labels.hasSchema)
      IncrementalAgg.current(st.labels, spec)
        .select(col("node"), col("label"))
    else st.labels.session.range(0)
      .select(col("id").as("node"), col("id").as("label"))

  /** A checkpointed frame REBUILT from its RDD: same rows and schema,
    * but none of the origin plan's constraints — the checkpoint carries
    * those verbatim, and when two such frames (one derived from the
    * other's subplan) later meet in a Union, constraint rewriting looks
    * up pre-checkpoint attribute ids and throws. The RDD of a
    * checkpointed frame replays its materialized blocks, so this costs
    * no recompute. */
  private def fresh(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** Apply one batch of UNDIRECTED edges (insert-only). Exactly-once per
    * `batchId` via the store manifest. */
  def appendEdges(st: Stores, edges: DataFrame, batchId: Long,
                  srcCol: String = "src", dstCol: String = "dst"): Unit = {
    val e = fresh(edges.select(
        col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull)
      .distinct().cutLineage())
    val batchNodes = e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node"))).distinct().cutLineage()
    // Delta-bounded state access: the label store is SCANNED, never
    // shuffled whole. Raw partials are semi-joined (size-guarded
    // broadcast — GraphIvmKit.guarded falls back to a shuffle semi-join
    // past the row limit, so a hub component can't OOM the driver) to
    // the batch's node set BEFORE the refold, so the refold's groupBy
    // exchanges only the matched partials; a second key-complete
    // semi-join on the touched labels widens to full component
    // membership. Soundness: `node` and `label` are both key columns of
    // the store spec, so either semi-join keeps all-or-none of a key's
    // partials (IncrementalAgg.currentFrom's contract).
    //
    // The emit is computed FROM the store it writes TO, so a crashed
    // append's retry must not see its own partial rows (a half-applied
    // −old/+new pair would drop the node from the re-solve): excluding
    // THIS batch id reconstructs the exact pre-batch state, making the
    // retry's emit row-identical — which the (key, batch) dedup absorbs.
    val partials0 =
      if (st.labels.hasSchema)
        st.labels.read().filter(col("__batch_id") =!= lit(batchId))
      else null
    def live(restrict: DataFrame => DataFrame): DataFrame =
      if (partials0 == null)
        st.labels.session.range(0)
          .select(col("id").as("node"), col("id").as("label"))
      else IncrementalAgg.currentFrom(restrict(partials0), spec)
        .select(col("node"), col("label"))
    val touched = live(_.join(GraphIvmKit.guarded(batchNodes), Seq("node"),
        "left_semi"))
      .select(col("label")).distinct().cutLineage()
    // all members of touched components, as star edges member → label.
    // Materialized: referenced by the star build and both emit
    // anti-joins, and the self-join lineage back to the shared scan
    // otherwise trips Union constraint rewriting (shared attribute ids)
    val memberNarrow = fresh(live(_.join(GraphIvmKit.guarded(touched),
        Seq("label"), "left_semi"))
      .select(col("node"), col("label")).cutLineage())
    // wide-region cutover: when the touched membership is a large
    // fraction of the label state (a hub component), the star re-solve
    // is already graph-sized — take ALL memberships so the run is the
    // plain batch recompute (identical labels; min is global)
    val member =
      if (partials0 != null && GraphIvmKit.sizeOf(memberNarrow) >=
            GraphIvmKit.cutoverRows(partials0))
        fresh(live(identity).select(col("node"), col("label")).cutLineage())
      else memberNarrow
    val stars = member.where(col("node") =!= col("label"))
      .select(col("node").as("u"), col("label").as("v"))
    // the affected subgraph handed to CC constraint-free: the union's
    // own constraints reference its children's attribute ids, and CC's
    // star-union iterations re-derive the input enough times that the
    // optimizer's Union constraint rewriting hits them and throws
    val graph = fresh(e.unionByName(stars).cutLineage())
    // materialized: referenced by both emit anti-joins
    val solved = fresh(DedupOps.connectedComponentsAlternating(
        graph, srcCol = "u", dstCol = "v")
      .select(col("node"), col("label")).cutLineage())
    // only CHANGES append: moved members retract their old row
    val emit = solved.join(member, Seq("node", "label"), "left_anti")
      .withColumn("__delta", lit(1L))
      .unionByName(member.join(solved, Seq("node", "label"), "left_anti")
        .withColumn("__delta", lit(-1L)))
    IncrementalAgg.appendDelta(st.labels, emit, spec, batchId, "__delta")
  }

  /** Compact the label state (quiescence, single-writer). */
  def compact(st: Stores): Unit = IncrementalAgg.compact(st.labels, spec)

  // ------------------------------------------------------- SIGNED CC
  // The right-to-be-forgotten closure the insert-only form cannot give:
  // edge DELETES flow through, so a takedown that removes a document's
  // near-dup edges also removes the document from served cluster labels,
  // and a component a deleted bridge SPLITS relabels exactly as a
  // recompute would. The price of retractability is an EDGE store next
  // to the label store (a split can only be re-solved from surviving
  // edges — labels alone cannot un-merge), and the touched components
  // are re-solved from those raw surviving edges rather than label
  // stars (a deletion invalidates the transitive shortcuts stars
  // encode). Per-batch cost ∝ touched components' members + their live
  // edges + batch; both stores are scanned, never shuffled whole (the
  // same semi-join-before-refold posture as the insert-only form).
  //
  // Node-existence semantics: a node exists exactly while it has a live
  // edge — deleting a node's last edge removes it from the labels
  // entirely (no singleton ghost), which IS the takedown contract.
  // Edge multiplicities follow the simple-graph signed contract of the
  // IVM family: net > 0 means live; retracting more copies than were
  // inserted is a caller error that stays visible as a negative net in
  // the edge store.

  /** Signed-CC state under one root: `<root>/labels` + `<root>/edges`. */
  final case class SignedStores(labels: AppendOnlyStore,
                                edges: AppendOnlyStore)

  private val edgeSpec = IncrementalAgg.Spec(Seq("u", "v"), Nil)

  def signedStores(spark: SparkSession, root: String): SignedStores =
    SignedStores(
      new AppendOnlyStore(spark, s"$root/labels",
        prefixCol = "__agg_key", prefixChars = 1),
      new AppendOnlyStore(spark, s"$root/edges",
        prefixCol = "__agg_key", prefixChars = 1))

  /** Live (node, label) under the signed contract. */
  def currentLabels(st: SignedStores): DataFrame =
    if (st.labels.hasSchema)
      IncrementalAgg.current(st.labels, spec)
        .select(col("node"), col("label"))
    else st.labels.session.range(0)
      .select(col("id").as("node"), col("id").as("label"))

  /** Apply one SIGNED batch of undirected edges (`deltaCol` ±1 per
    * row; a takedown wave re-presents the removed doc's edges at −1).
    * Exactly-once per `batchId` across crash-replays: both state reads
    * exclude this batch id, so a retry recomputes the identical emit
    * and the (key, batch) dedup absorbs the duplicates. */
  def appendDelta(st: SignedStores, batch: DataFrame, batchId: Long,
                  srcCol: String = "src", dstCol: String = "dst",
                  deltaCol: String = "__delta"): Unit = {
    // fully-committed replay (e.g. post-compaction): skip the re-solve
    if (st.labels.hasApplied(batchId) && st.edges.hasApplied(batchId))
      return
    val d = fresh(batch.select(
        least(col(srcCol), col(dstCol)).cast("long").as("u"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("v"),
        col(deltaCol).cast("long").as("__delta"))
      .where(col("u").isNotNull && col("v").isNotNull &&
        col("u") =!= col("v"))
      .groupBy(col("u"), col("v")).agg(sum(col("__delta")).as("__delta"))
      .where(col("__delta") =!= 0).cutLineage())
    val batchNodes = d.select(col("u").as("node"))
      .unionByName(d.select(col("v").as("node"))).distinct().cutLineage()
    // delta-bounded label lookup: batch nodes → touched components →
    // full membership (all semi-joins on key columns before the refold)
    val lp =
      if (st.labels.hasSchema)
        st.labels.read().filter(col("__batch_id") =!= lit(batchId))
      else null
    def liveLabels(restrict: DataFrame => DataFrame): DataFrame =
      if (lp == null)
        st.labels.session.range(0)
          .select(col("id").as("node"), col("id").as("label"))
      else IncrementalAgg.currentFrom(restrict(lp), spec)
        .select(col("node"), col("label"))
    val touched = liveLabels(_.join(GraphIvmKit.guarded(batchNodes), Seq("node"),
        "left_semi"))
      .select(col("label")).distinct().cutLineage()
    val memberNarrow = fresh(liveLabels(_.join(GraphIvmKit.guarded(touched),
        Seq("label"), "left_semi"))
      .select(col("node"), col("label")).cutLineage())
    // wide-region cutover: a hub component makes the touched membership
    // graph-sized, at which point the "restricted" re-solve IS the
    // batch recompute — take all memberships and all live edges
    // directly instead of semi-joining state to a graph-sized key set
    val wide = lp != null && GraphIvmKit.sizeOf(memberNarrow) >=
      GraphIvmKit.cutoverRows(lp)
    val member =
      if (wide)
        fresh(liveLabels(identity).select(col("node"), col("label"))
          .cutLineage())
      else memberNarrow
    // pre-batch live edges of the touched components: an intra-component
    // edge's `u` is a member, so one key-complete semi-join on `u`
    // captures them all; net > 0 = live (simple-graph signed contract)
    val memberNodes = member.select(col("node")).cutLineage()
    val ep =
      if (st.edges.hasSchema)
        st.edges.read().filter(col("__batch_id") =!= lit(batchId))
      else null
    val oldEdges =
      if (ep == null)
        st.edges.session.range(0)
          .select(col("id").as("u"), col("id").as("v"),
            col("id").as("__delta"))
      else if (wide)
        IncrementalAgg.currentFrom(ep, edgeSpec)
          .filter(col("n_rows") > 0)
          .select(col("u"), col("v"), col("n_rows").as("__delta"))
      else IncrementalAgg.currentFrom(
          ep.join(GraphIvmKit.guarded(memberNodes), col("u") === col("node"),
            "left_semi"), edgeSpec)
        .filter(col("n_rows") > 0)
        .select(col("u"), col("v"), col("n_rows").as("__delta"))
    // surviving edges after the batch: old ⊎ δ netted positive — the
    // graph the touched components re-solve from (plus wholly-new
    // batch components)
    val graph = fresh(oldEdges.unionByName(d)
      .groupBy(col("u"), col("v")).agg(sum(col("__delta")).as("__net"))
      .filter(col("__net") > 0)
      .select(col("u"), col("v")).cutLineage())
    val solved = fresh(DedupOps.connectedComponentsAlternating(
        graph, srcCol = "u", dstCol = "v")
      .select(col("node"), col("label")).cutLineage())
    // only CHANGES append: moved/removed members retract, new or
    // relabeled memberships insert
    val emit = solved.join(member, Seq("node", "label"), "left_anti")
      .withColumn("__delta", lit(1L))
      .unionByName(member.join(solved, Seq("node", "label"), "left_anti")
        .withColumn("__delta", lit(-1L)))
    IncrementalAgg.appendDelta(st.labels, emit, spec, batchId, "__delta")
    IncrementalAgg.appendDelta(st.edges, d, edgeSpec, batchId, "__delta")
  }

  /** Compact both signed-CC stores (quiescence, single-writer). */
  def compact(st: SignedStores): Unit = {
    IncrementalAgg.compact(st.labels, spec)
    IncrementalAgg.compact(st.edges, edgeSpec)
  }
}
