package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Lineage.LineageSyntax
import graft.sinks.AppendOnlyStore

/** Incrementally-maintained TRIANGLE COUNT under signed edge deltas —
  * graph-pattern IVM: the count of closed triples stays current through
  * edge inserts AND deletes without ever re-enumerating the graph.
  *
  * The Δ-rule is the cubic analog of the join family's bilinear rule.
  * With A the OLD adjacency indicator and δ the batch's signed edge set
  * (insert +1 for an absent edge, delete −1 for a present one — the
  * simple-graph contract, same over-retraction rule as the whole IVM
  * family), each potential triangle {e₁,e₂,e₃} contributes
  * `(A+δ)(A+δ)(A+δ) − AAA`, which expands to exactly three join shapes:
  *
  *  - **δ·A·A** — one batch edge closes a wedge of OLD edges:
  *    Σ δ(u,v)·|N(u) ∩ N(v)| — the batch joined twice against the live
  *    adjacency, candidate-bounded by the batch's endpoints;
  *  - **δ·δ·A** — two batch edges sharing a vertex close over one OLD
  *    edge: batch-local wedge enumeration ⋈ live edges;
  *  - **δ·δ·δ** — triangles wholly inside the batch: the q159 join
  *    shape on the batch alone.
  *
  * Per-batch cost: |δ|·deg against state (scanned, never shuffled
  * whole), |δ|² local wedges, |δ|³ batch-only triangles — all δ-scaled;
  * the graph itself is touched only as the candidate-pruned probe side.
  *
  * State = two [[IncrementalAgg]] stores (signed deltas, applied-batch
  * manifest, per-prefix compaction all inherited): the live edge
  * multiset keyed (u, v), and the count store holding one ΔT partial
  * per batch (reading the count = summing partials — never recounting).
  * Append ORDER makes crash-replays exact: the ΔT partial (computed
  * against OLD state) lands BEFORE the edge append, so a retry either
  * recomputes both against unchanged state or skips the committed ΔT at
  * its manifest and completes only the edge append.
  */
object IncrementalTriangles {

  final case class Stores(edges: AppendOnlyStore, count: AppendOnlyStore,
                          nodes: AppendOnlyStore)

  private val edgeSpec = IncrementalAgg.Spec(Seq("u", "v"), Nil)
  private val countSpec = IncrementalAgg.Spec(Seq("__tag"), Seq("dt"))
  // per-node Δ-rows: triangle-corner deltas and degree deltas ride ONE
  // store as two summed columns
  private val nodeSpec = IncrementalAgg.Spec(Seq("node"), Seq("dtri", "ddeg"))

  def stores(spark: SparkSession, root: String): Stores = Stores(
    new AppendOnlyStore(spark, s"$root/edges",
      prefixCol = "__agg_key", prefixChars = 1),
    new AppendOnlyStore(spark, s"$root/count",
      prefixCol = "__agg_key", prefixChars = 1),
    new AppendOnlyStore(spark, s"$root/nodes",
      prefixCol = "__agg_key", prefixChars = 1))

  /** Canonical signed batch: (u < v, Δ) with self-loops dropped and
    * duplicate rows net-summed (a −1/+1 pair for the same edge in one
    * batch cancels, correctly). */
  private def canon(batch: DataFrame, srcCol: String, dstCol: String,
                    deltaCol: String): DataFrame =
    batch.select(
        least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"),
        col(deltaCol).cast("long").as("__delta"))
      .where(col("u") =!= col("v"))
      .groupBy(col("u"), col("v")).agg(sum(col("__delta")).as("__delta"))
      .where(col("__delta") =!= 0)

  /** Live canonical edges (u < v) from the edge store — empty before the
    * first append. */
  def currentEdges(st: Stores): DataFrame =
    if (st.edges.hasSchema)
      IncrementalAgg.current(st.edges, edgeSpec).select(col("u"), col("v"))
    else st.edges.session.range(0)
      .select(col("id").as("u"), col("id").as("v"))

  /** The maintained count (one row, `n_triangles`). */
  def current(st: Stores): DataFrame = {
    val base =
      if (st.count.hasSchema)
        IncrementalAgg.current(st.count, countSpec)
          .select(coalesce(col("sum_dt"), lit(0L)).as("n_triangles"))
      else st.count.session.range(0).select(col("id").as("n_triangles"))
    // an all-cancelling history nets the partial away — serve 0, not ∅
    base.unionByName(base.sparkSession.range(1)
        .select(lit(0L).as("n_triangles")))
      .agg(sum(col("n_triangles")).as("n_triangles"))
  }

  /** Maintain with one signed batch. Exactly-once per `batchId` across
    * crash-replays (per-store manifests; ΔT computed against pre-batch
    * state and committed first — see the object doc). */
  def appendDelta(st: Stores, batch: DataFrame, batchId: Long,
                  srcCol: String = "src", dstCol: String = "dst",
                  deltaCol: String = "__delta"): Unit = {
    val d = canon(batch, srcCol, dstCol, deltaCol).cutLineage()
    val nodes = d.select(col("u").as("n"))
      .unionByName(d.select(col("v").as("n"))).distinct().cutLineage()
    // Delta-bounded state access: every probe below only consults OLD
    // edges INCIDENT to a batch endpoint (t1 joins oldSym on a batch
    // endpoint; t2's closing edge has BOTH endpoints in the batch), so
    // the edge store is scanned — never shuffled whole — and the refold's
    // groupBy exchanges only the incident partials: raw partials are
    // semi-joined (size-guarded broadcast; shuffle fallback past the row limit) to
    // the batch's endpoint set per direction BEFORE the refold. `u`/`v`
    // are key columns, so each semi-join is key-complete
    // (IncrementalAgg.currentFrom's soundness condition). Per-batch
    // shuffle bytes stay flat while untouched state grows 10×
    // (ShuffleBytesSpec gate).
    def incident(endCol: String): DataFrame =
      if (st.edges.hasSchema)
        IncrementalAgg.currentFrom(
            st.edges.read().join(GraphIvmKit.guarded(nodes),
              col(endCol) === col("n"), "left_semi"), edgeSpec)
          .select(col("u"), col("v")).cutLineage()
      else st.edges.session.range(0)
        .select(col("id").as("u"), col("id").as("v"))
    val oldU = incident("u") // old edges with u in the batch's endpoints
    val oldV = incident("v") // old edges with v in the batch's endpoints
    // symmetrized view of the INCIDENT old edges: (a, b) both
    // directions, a always a batch endpoint — all t1 needs, since t1
    // only ever joins `a` against a batch edge's endpoint
    val oldSym = oldU.select(col("u").as("a"), col("v").as("b"))
      .unionByName(oldV.select(col("v").as("a"), col("u").as("b")))
    // each term keeps its triangle's three corners so the per-node store
    // is maintained from the same enumeration the global count uses
    // δ·A·A: the batch edge (u,v) closes old wedges u—w—v
    val t1 = d
      .join(oldSym.select(col("a").as("u"), col("b").as("w")), Seq("u"))
      .join(oldSym.select(col("a").as("v"), col("b").as("w")), Seq("v", "w"))
      .select(col("u").as("n1"), col("v").as("n2"), col("w").as("n3"),
        col("__delta").as("c"))
    // δ·δ·A: two batch edges share vertex a; the old edge closes (b1, b2)
    val dSym = d.select(col("u").as("a"), col("v").as("b"), col("__delta"))
      .unionByName(
        d.select(col("v").as("a"), col("u").as("b"), col("__delta")))
    // the closing old edge has BOTH endpoints in the batch's endpoint
    // set: one more key-complete semi-join narrows the incident slice
    val oldBoth = oldU.join(GraphIvmKit.guarded(nodes), col("v") === col("n"),
      "left_semi")
    val t2 = dSym.select(col("a"), col("b").as("b1"),
        col("__delta").as("d1"))
      .join(dSym.select(col("a"), col("b").as("b2"),
        col("__delta").as("d2")), Seq("a"))
      .where(col("b1") < col("b2")) // each unordered δ-pair once
      .join(oldBoth.select(col("u").as("b1"), col("v").as("b2")),
        Seq("b1", "b2"))
      .select(col("a").as("n1"), col("b1").as("n2"), col("b2").as("n3"),
        (col("d1") * col("d2")).as("c"))
    // δ·δ·δ: triangles wholly inside the batch (q159's join shape)
    val t3 = d.select(col("u"), col("v").as("w1"), col("__delta").as("d1"))
      .join(d.select(col("u"), col("v").as("w2"), col("__delta").as("d2")),
        Seq("u"))
      .where(col("w1") < col("w2"))
      .join(d.select(col("u").as("w1"), col("v").as("w2"),
        col("__delta").as("d3")), Seq("w1", "w2"))
      .select(col("u").as("n1"), col("w1").as("n2"), col("w2").as("n3"),
        (col("d1") * col("d2") * col("d3")).as("c"))
    // corner contributions feed global count AND per-node counts; both
    // sinks re-read the three-term union — cut it once
    val tri = t1.unionByName(t2).unionByName(t3).cutLineage()
    val dt = tri.select(lit("t").as("__tag"), col("c").as("dt"))
    val nodeRows = tri
      .select(explode(array(col("n1"), col("n2"), col("n3"))).as("node"),
        col("c").as("dtri"), lit(0L).as("ddeg"))
      .unionByName(d
        .select(explode(array(col("u"), col("v"))).as("node"),
          lit(0L).as("dtri"), col("__delta").as("ddeg")))
    // Δ-accumulators first (computed against OLD state), the edge
    // multiset LAST — the crash-replay ordering argument
    IncrementalAgg.appendBatch(st.count, dt, countSpec, batchId)
    IncrementalAgg.appendBatch(st.nodes, nodeRows, nodeSpec, batchId)
    IncrementalAgg.appendDelta(st.edges, d, edgeSpec, batchId, "__delta")
  }

  /** Per-node maintained view: `(node, deg, n_tri, cc_e6)` — the local
    * clustering coefficient, same integer cross-multiplication as the
    * batch [[GraphOps.clusteringCoefficient]] (2·T·10⁶ in DECIMAL(38,0),
    * integral division). Nodes whose degree netted to zero vanish. */
  def currentPerNode(st: Stores): DataFrame = {
    val base =
      if (st.nodes.hasSchema)
        IncrementalAgg.current(st.nodes, nodeSpec)
          .select(col("node"),
            coalesce(col("sum_ddeg"), lit(0L)).as("deg"),
            coalesce(col("sum_dtri"), lit(0L)).as("n_tri"))
      else st.nodes.session.range(0).select(col("id").as("node"),
        col("id").as("deg"), col("id").as("n_tri"))
    base.filter(col("deg") > 0)
      .withColumn("cc_e6",
        when(col("deg") < 2, lit(0L)).otherwise(
          expr("cast((2 * cast(n_tri as decimal(38,0)) * 1000000)" +
            " div (deg * (deg - 1)) as bigint)")))
  }

  /** Compact every store (quiescence, single-writer). */
  def compact(st: Stores): Unit = {
    IncrementalAgg.compact(st.edges, edgeSpec)
    IncrementalAgg.compact(st.count, countSpec)
    IncrementalAgg.compact(st.nodes, nodeSpec)
  }
}
