package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Lineage.LineageSyntax

/** Shared machinery for the signed graph-IVM family
  * ([[IncrementalPageRank]], [[IncrementalSssp]],
  * [[IncrementalNearestSeeds]], [[IncrementalCc]], [[IncrementalKCore]]):
  * iterated graph algorithms where level-i values depend on in-edges and
  * in-neighbor level-(i−1) values, so a batch's effect is confined to the
  * k-hop OUT-closure of its touched endpoints. Every state read here
  * follows the family posture: raw store partials are semi-joined (on key
  * columns — key-complete per [[IncrementalAgg.currentFrom]]) to
  * closure-sized key sets BEFORE any refold, so stores are scanned,
  * never shuffled whole.
  *
  * ==Broadcast guard==
  * The touched-region frames (batch nodes, touched labels, membership,
  * k-hop closure) are usually delta-sized, and broadcasting them makes
  * every semi-join shuffle-free. But "usually" is a contract real graphs
  * break: one hub component or one high-degree node makes the touched
  * region GRAPH-sized, and at 100× an unconditional `broadcast()` of a
  * graph-sized frame is a >8 GB broadcast / driver OOM — a crash, not a
  * slowdown. [[guarded]] therefore broadcasts only while the frame's row
  * count is under `spark.graft.graphIvm.broadcastRowLimit` (default 4M
  * rows — comfortably under Spark's 8 GB broadcast ceiling for the
  * family's narrow key frames) and otherwise returns the frame unhinted,
  * so the planner falls back to a shuffle semi-join: same rows, bounded
  * memory. Results are bit-identical either way (GraphIvmGuardSpec runs
  * both regimes against the batch twins).
  *
  * ==Wide-region cutover==
  * Past the guard there is a second cliff: when the touched closure is a
  * large fraction of the graph, hop-paced closure discovery plus the
  * closure-restricted re-solve costs MORE than recomputing from scratch
  * (the discovery alone re-scans the edge store once per hop).
  * [[kHopOutClosure]] therefore takes a `cutoverRows` bound and reports
  * `wide = true` the moment the growing closure crosses it; callers then
  * switch `affected` to the full post-batch node set — the batch
  * recompute, whose cost the closure path was about to exceed anyway —
  * with identical results (the re-solve loop over ALL nodes with an
  * empty boundary IS the batch algorithm). [[IncrementalKCore]] has its
  * own adaptive region discovery with the same posture. Callers derive
  * `cutoverRows` from `spark.graft.graphIvm.cutoverFraction` (default
  * 0.5) times the edge store's raw partial count — an upper-bound proxy
  * for graph size that is exact right after compaction. */
private[ops] object GraphIvmKit {

  /** Row-count ceiling under which touched-region frames are broadcast;
    * above it joins fall back to shuffle. Conf-keyed so the guard spec
    * can force the shuffle regime on tiny graphs. */
  val BroadcastLimitKey = "spark.graft.graphIvm.broadcastRowLimit"

  /** Fraction of the edge store's raw partial count past which closure
    * discovery cuts over to the batch recompute. */
  val CutoverFractionKey = "spark.graft.graphIvm.cutoverFraction"

  def broadcastRowLimit(df: DataFrame): Long =
    df.sparkSession.conf.get(BroadcastLimitKey, "4000000").toLong

  def cutoverFraction(df: DataFrame): Double =
    df.sparkSession.conf.get(CutoverFractionKey, "0.5").toDouble

  /** `cutoverRows` for a store whose raw partials (this batch excluded)
    * are `ep` — null/virgin stores never cut over (the closure IS the
    * batch there). The partial count upper-bounds live edges; each live
    * edge contributes ≤2 nodes, so fraction × count is a conservative
    * node-count threshold that under-triggers (keeps the closure path)
    * rather than over-triggers. */
  def cutoverRows(ep: DataFrame): Long =
    if (ep == null) Long.MaxValue
    else {
      val f = cutoverFraction(ep)
      math.max(1L, (f * ep.count()).toLong)
    }

  // Row counts of already-materialized (checkpointed) frames, memoized
  // by frame identity: guarded() is called several times per frame per
  // batch, and a count of a checkpointed frame is a cheap-but-not-free
  // job. WeakHashMap so a batch's frames are collectable after it.
  private val knownSizes = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, java.lang.Long]())

  /** The row count of a materialized frame, memoized by identity. */
  def sizeOf(df: DataFrame): Long = {
    val cached = knownSizes.get(df)
    if (cached != null) cached.longValue
    else { val n = df.count(); knownSizes.put(df, n); n }
  }

  /** Size-guarded broadcast: hint only while `df` is provably small.
    * `df` should be materialized (fresh/cutLineage) — counting an
    * unmaterialized frame re-runs its plan. */
  def guarded(df: DataFrame): DataFrame =
    if (sizeOf(df) <= broadcastRowLimit(df)) broadcast(df) else df

  /** [[guarded]] for a cheap derivation (projection/rename) of an
    * already-materialized `bound` frame with `|df| ≤ |bound|`: decides
    * on `bound`'s memoized count, so no extra job runs for `df`. The
    * upper bound errs toward shuffle — never toward an oversized
    * broadcast. */
  def guardedBy(df: DataFrame, bound: DataFrame): DataFrame =
    if (sizeOf(bound) <= broadcastRowLimit(df)) broadcast(df) else df

  /** [[guardedBy]] with a caller-computed row bound (`|df| ≤ rows`) —
    * for derivations whose fan-out is a known multiplier of a base
    * frame (a multi-probe explode: `|probed| ≤ nprobe·|queries|`), so
    * the guard costs no job on the derived plan at all. */
  def guardedByCount(df: DataFrame, rows: Long): DataFrame =
    if (rows <= broadcastRowLimit(df)) broadcast(df) else df

  /** A checkpointed frame REBUILT from its RDD — strips origin-plan
    * constraints that otherwise trip Union constraint rewriting when
    * derived frames meet (the hazard [[IncrementalCc]] documents). */
  def fresh(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)

  /** The k-hop OUT-closure of δ's endpoints over old ∪ new edges
    * (deleted edges still propagate: removing a contribution changes
    * the old out-neighbor). `ep` = raw edge-store partials with this
    * batch excluded, or null for a virgin store. One semi-joined store
    * scan per hop; the result is materialized small in the common case.
    * Returns `(closure, wide)`: discovery stops and reports `wide` the
    * moment the closure crosses `cutoverRows` — the caller must then
    * switch to the batch recompute (full post-batch node set), because
    * the returned closure is INCOMPLETE. */
  def kHopOutClosure(d: DataFrame, ep: DataFrame,
                     spec: IncrementalAgg.Spec, hops: Int,
                     cutoverRows: Long = Long.MaxValue): (DataFrame, Boolean) = {
    var affected = fresh(d.select(col("src").as("node"))
      .unionByName(d.select(col("dst").as("node")))
      .distinct().cutLineage())
    if (sizeOf(affected) >= cutoverRows) return (affected, true)
    var hop = 0
    while (hop < hops) {
      hop += 1
      val oldOut =
        if (ep == null) affected.limit(0)
        else IncrementalAgg.currentFrom(
            ep.join(guarded(affected), col("src") === col("node"),
              "left_semi"), spec)
          .filter(col("n_rows") > 0).select(col("dst").as("node"))
      val newOut = d.join(guarded(affected), col("src") === col("node"),
          "left_semi")
        .select(col("dst").as("node"))
      affected = fresh(affected.unionByName(oldOut).unionByName(newOut)
        .distinct().cutLineage())
      if (sizeOf(affected) >= cutoverRows) return (affected, true)
    }
    (affected, false)
  }

  /** Post-batch live edges incident to `closure` on `side` (`"src"` or
    * `"dst"`): store partials semi-joined to closure keys, netted with
    * δ, net > 0 (simple-graph signed contract), projected to the
    * spec's key columns. */
  def postBatchLive(d: DataFrame, ep: DataFrame, spec: IncrementalAgg.Spec,
                    side: String, closure: DataFrame): DataFrame = {
    val keyCols = spec.keyCols.map(col)
    val dSide = d.join(guarded(closure), col(side) === col("node"),
      "left_semi")
    val merged =
      if (ep == null) dSide
      else IncrementalAgg.currentFrom(
          ep.join(guarded(closure), col(side) === col("node"),
            "left_semi"), spec)
        .select(keyCols :+ col("n_rows").as("__delta"): _*)
        .unionByName(dSide)
    merged.groupBy(keyCols: _*)
      .agg(sum(col("__delta")).as("__net"))
      .filter(col("__net") > 0).select(keyCols: _*)
  }

  /** ALL post-batch live edge keys (the wide-cutover graph): the full
    * refold of `ep` netted with δ, net > 0. */
  def postBatchLiveAll(d: DataFrame, ep: DataFrame,
                       spec: IncrementalAgg.Spec): DataFrame = {
    val keyCols = spec.keyCols.map(col)
    val merged =
      if (ep == null) d
      else IncrementalAgg.currentFrom(ep, spec)
        .select(keyCols :+ col("n_rows").as("__delta"): _*)
        .unionByName(d)
    merged.groupBy(keyCols: _*)
      .agg(sum(col("__delta")).as("__net"))
      .filter(col("__net") > 0).select(keyCols: _*)
  }

  /** The wide-cutover `affected` set: every post-batch live endpoint
    * plus every batch endpoint (a node whose last edge this batch
    * removed is dead but must still appear so its stored vector is
    * retracted). Directed `src`/`dst` column convention. */
  def allTouchedNodes(d: DataFrame, ep: DataFrame,
                      spec: IncrementalAgg.Spec,
                      srcCol: String, dstCol: String): DataFrame = {
    val live = postBatchLiveAll(d, ep, spec)
    fresh(live.select(col(srcCol).as("node"))
      .unionByName(live.select(col(dstCol).as("node")))
      .unionByName(d.select(col(srcCol).as("node")))
      .unionByName(d.select(col(dstCol).as("node")))
      .distinct().cutLineage())
  }

  /** Only CHANGES append: −old/+new vector diff on `keys`. Both inputs
    * must be materialized (each is referenced by both anti-joins). */
  def diffEmit(newVec: DataFrame, oldVec: DataFrame,
               keys: Seq[String]): DataFrame =
    newVec.join(oldVec, keys, "left_anti").withColumn("__delta", lit(1L))
      .unionByName(oldVec.join(newVec, keys, "left_anti")
        .withColumn("__delta", lit(-1L)))
}
