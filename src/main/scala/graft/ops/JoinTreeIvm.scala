package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit

import graft.ops.Lineage.LineageSyntax
import graft.sinks.AppendOnlyStore

/** N-ARY incremental view maintenance: a maintained LEFT-DEEP tree of
  * equi-joins — `leaf0 ⋈ leaf1 ⋈ … ⋈ leaf(n−1)` kept current under
  * signed deltas arriving on ANY leaf, with an optional maintained
  * aggregate over the full join output. This is the multi-table
  * dashboard shape (the reference's curated model is exactly a
  * fact-⋈-dims join + group-by, `models/curated_provider_models.sql`
  * joins two sources; TPC-H Q5 joins six) maintained end-to-end at
  * delta cost per batch.
  *
  * '''Construction: a cascade of binary join IVMs.''' Level `j`
  * (0-based, one per join in the tree) is an [[IncrementalJoin]] whose
  * LEFT state is the (j+1)-prefix join multiset and whose RIGHT state
  * is leaf `j+1`. The classic n-ary Δ-rule
  * {{{ Δ(R⋈S⋈T) = ΔR⋈S⋈T ∪ R'⋈ΔS⋈T ∪ R'⋈S'⋈ΔT }}}
  * falls out of the cascade without ever being written down: a batch on
  * leaf `j` enters level `max(j−1, 0)` (left side for leaf 0, right side
  * otherwise), and each level's signed Δ-output — a valid signed batch,
  * multiplicities are products — is TAPPED into the next level's left
  * side before the entry append commits. Because the single-writer
  * contract serializes batches, every probe sees exactly the committed
  * prefix state: the asymmetric old/new sides of the textbook rule are
  * what the cascade's ordering produces naturally.
  *
  * '''Per-batch cost is delta-sized at every level.''' Each hop is
  * [[IncrementalJoin.deltaJoin]]: the delta is the hash build, the
  * bucketed state scan streams, zero exchange on state — so one batch
  * costs `O(|Δ| · fanout^depth)` joined rows, never a state scan. The
  * flat-shuffle-bytes gate (ShuffleBytesSpec) weighs this: bytes per
  * append stay flat while tree state grows 10×.
  *
  * '''State cost — order your leaves.''' Level `j`'s left table IS the
  * (j+1)-prefix join multiset, so total state is `Σ_j |leaf0⋈…⋈leaf(j)|`
  * plus the leaves. With the FACT table as leaf 0 and dimension-sized
  * leaves joined in (the star/snowflake shape this exists for), every
  * prefix is fact-sized and total state is `depth × |fact⋈dims|` — the
  * same constant-factor trade DBSP/differential-dataflow makes (each
  * operator owns its input trace). An anti-pattern — two fact-sized
  * leaves joined last — would square the stored prefix; put the
  * selective joins first.
  *
  * '''Exactly-once composes.''' The ENTRY level's applied-batch manifest
  * is the whole tree's replay boundary: a committed batch no-ops before
  * its tap fires, so a replay reaches no downstream level twice. A crash
  * INSIDE the cascade leaves downstream levels' own `started`/`done`
  * markers to absorb the retry (a level that committed no-ops; one that
  * crashed mid-write flags itself dirty and replay-dedups until
  * compaction) — the same contract [[ChainedIvm]] documents for one
  * downstream, applied recursively. Batch ids are disambiguated across
  * leaves as `leaves·id + leaf` (ids must stay below `2⁶²/leaves`) so
  * two leaves' batch 7 never collide in a shared level's manifest.
  *
  * Single-writer per tree. The LAST level may be a LEFT OUTER join
  * (`outerLast = true` — the prefix Δ feeds [[IncrementalOuterJoin]]'s
  * signed left path, so null-extension flips ride the cascade). MID
  * levels may be LEFT OUTER when the tree is PREFIX-KEYED past them
  * (`outerLevels` — every later join key derives from prefix columns,
  * so a null-extended group keeps its downstream probe keys; the
  * general case, where a downstream key comes from the outer level's
  * dim, is refused at first flow-through). Non-equi trees and
  * cyclic/worst-case-optimal join orders stay out of scope.
  */
object JoinTreeIvm {

  /** One maintained tree: `levels(j)` joins the (j+1)-prefix output with
    * leaf `j+1` on `keys(j)`; `agg` optionally maintains an
    * [[IncrementalAgg]] over the full join's signed Δ-output (spec
    * columns refer to JOIN-OUTPUT columns). `outerUns` maps each LEFT
    * OUTER level to its signed unmatched multiset
    * ([[IncrementalOuterJoin]]'s layout; that level's `levels(j)` is
    * its inner Δ-rule store): the LAST level may always be outer (the
    * q209 enrichment shape), and a MID level may be outer when the tree
    * is PREFIX-KEYED past it — every later level's join keys derive
    * from prefix-side columns, so a null-extended group never loses a
    * downstream probe key (checked against the dim schema on first
    * flow-through). */
  final case class Stores(levels: Vector[IncrementalJoin.Stores],
                          keys: Vector[Seq[String]],
                          agg: Option[(AppendOnlyStore, IncrementalAgg.Spec)],
                          outerUns: Map[Int, AppendOnlyStore] = Map.empty,
                          extrema: Option[(AppendOnlyStore, MinMaxAgg.Spec)] =
                            None) {
    /** Number of leaf inputs (= levels + 1). */
    def leaves: Int = levels.length + 1
    /** The last level's outer stores, when the last level is outer. */
    private[ops] def outerUn: Option[AppendOnlyStore] =
      outerUns.get(levels.length - 1)
    private[ops] def outer: IncrementalOuterJoin.Stores =
      outerAt(levels.length - 1)
    private[ops] def outerAt(j: Int): IncrementalOuterJoin.Stores =
      IncrementalOuterJoin.Stores(levels(j), outerUns(j))
  }

  /** Open a tree under one root (level `j` under `<root>/j<j>`, the
    * optional downstream aggregate under `<root>/agg`). `keys(j)` are
    * the equi-join columns between the (j+1)-prefix output and leaf
    * `j+1` — they must exist in both.
    *
    * `outerLast` makes the final level a LEFT OUTER join; it cannot
    * carry an `aggSpec` (the downstream tap rides the inner Δ-output
    * only — a null-extension flip would bypass it) and needs ≥3 leaves
    * (use [[IncrementalOuterJoin]] directly for the binary shape).
    *
    * `outerLevels` makes MID levels LEFT OUTER — the prefix-keyed
    * enrichment chain `fact ⟕ dim1 ⟕ dim2` where every join key derives
    * from FACT columns, so a null-extended group keeps its downstream
    * probe keys. Each mid outer level's OUTER Δ (inner rows plus signed
    * null-extension deltas) feeds the next level through the cascade,
    * so retraction waves on ANY leaf — including a late dim arrival
    * flipping null-extended groups to matched — propagate exactly.
    * Provenance is enforced when the level's dim schema is known: a
    * downstream key among the null-extendable dim columns raises.
    * Mid-outer levels run the SIGNED path (unsigned appends are lifted
    * to +1 deltas); a maintained `aggSpec`/`extremaSpec` composes fine
    * (the last level's tap sees the full outer Δ stream). */
  def stores(spark: SparkSession, root: String, keys: Seq[Seq[String]],
             buckets: Int = 16,
             aggSpec: Option[IncrementalAgg.Spec] = None,
             outerLast: Boolean = false,
             extremaSpec: Option[MinMaxAgg.Spec] = None,
             outerLevels: Seq[Int] = Nil): Stores = {
    require(keys.nonEmpty, "a join tree needs at least one join (two leaves)")
    val outs = (outerLevels ++ (if (outerLast) Seq(keys.size - 1) else Nil))
      .distinct.sorted
    require(outs.forall(j => j >= 0 && j < keys.size),
      s"outer levels $outs out of range for ${keys.size} levels")
    val lastIsOuter = outs.contains(keys.size - 1)
    require(!lastIsOuter || keys.size >= 2,
      "an outer-last tree needs >=3 leaves; use IncrementalOuterJoin " +
        "for the binary left-outer shape")
    // An outer-last tree MAY chain an aggSpec/extremaSpec since round
    // 11: the downstream consumes the OUTER Δ through the signed outer
    // append's tap, so null-extension flips reach the aggregate (a late
    // dim retracts the null group and inserts the named one). Two
    // contracts follow: the outer dim must be seeded before prefix rows
    // flow (the null extension needs its schema — an empty batch is
    // fine), and an extrema valCol should be effectively non-null
    // (prefix-derived), the same registrant contract as extremaServe.
    Stores(
      keys.indices.map(j =>
        IncrementalJoin.stores(spark, s"$root/j$j", buckets)).toVector,
      keys.map(_.toSeq).toVector,
      aggSpec.map(sp => (new AppendOnlyStore(spark, s"$root/agg",
        prefixCol = "__agg_key", prefixChars = 1), sp)),
      outs.map(j => j -> new AppendOnlyStore(spark, s"$root/j$j/un",
        prefixCol = "__jk", prefixChars = 1)).toMap,
      extremaSpec.map(es => (new AppendOnlyStore(spark, s"$root/extrema",
        prefixCol = "__agg_key", prefixChars = 1), es)))
  }

  /** The tree's root directory (levels live under `<root>/j<j>`) — the
    * anchor for tree-wide side metadata like drain claims. */
  private[graft] def rootOf(st: Stores): String =
    new org.apache.hadoop.fs.Path(st.levels(0).root).getParent.toString

  /** The cascade: level `j`'s Δ-output becomes a signed LEFT batch for
    * level `j+1` (multiplicities are products, so the signed multiset
    * IS the next level's delta); the LAST level's Δ-output feeds the
    * optional maintained aggregate. Fires BEFORE the entry append's
    * done-marker — see the exactly-once contract above. */
  private def signedOf(dOut: DataFrame): DataFrame =
    dOut.drop("__jk", "__lbid", "__rbid")
      .withColumnRenamed("__mult", "__delta")

  /** The downstream agg/extrema consumer of the FINAL level's Δ-output
    * — inner Δ frames from an inner last level, OUTER Δ frames (null
    * flips included, via the outer append's tap) from an outer last
    * level. None when nothing is chained. */
  private def downstreamFor(st: Stores,
                            dsId: Long): Option[DataFrame => Unit] =
    if (st.agg.isEmpty && st.extrema.isEmpty) None
    else Some { dOut =>
      val signed0 = signedOf(dOut)
      // two sinks re-read the frame — cut once so the delta join
      // behind it is not recomputed per sink (the ChainedIvm trade)
      val signed =
        if (st.agg.isDefined && st.extrema.isDefined)
          signed0.cutLineage()
        else signed0
      st.agg.foreach { case (store, spec) =>
        IncrementalAgg.appendDelta(store, signed, spec, dsId)
      }
      st.extrema.foreach { case (store, es) =>
        MinMaxAgg.appendDelta(store, signed, es, dsId)
      }
    }

  private def tapFor(st: Stores, level: Int,
                     dsId: Long): Option[DataFrame => Unit] = {
    if (level == st.levels.length - 1) downstreamFor(st, dsId)
    else if (st.outerUns.contains(level + 1)) {
      // the next level is an OUTER level: its left side takes the
      // prefix Δ as a full signed outer append (unmatched bookkeeping
      // included); exactly-once still rides the ENTRY level's manifest —
      // the outer level's own manifest absorbs mid-cascade crash retries.
      // A MID outer level hands its OUTER Δ (inner rows + signed
      // null-extension deltas) onward through the outer tap; an outer
      // LAST level hands it to the chained agg/extrema the same way.
      val next = level + 1
      if (next == st.levels.length - 1)
        Some { dOut =>
          IncrementalOuterJoin.appendLeftDelta(st.outer, signedOf(dOut),
            st.keys(next), dsId, tap = downstreamFor(st, dsId))
        }
      else
        Some { dOut =>
          requirePrefixKeyed(st, next)
          IncrementalOuterJoin.appendLeftDelta(st.outerAt(next),
            signedOf(dOut), st.keys(next), dsId,
            tap = Some(outerD => tapFor(st, next, dsId)
              .foreach(_(outerD))))
        }
    }
    else Some { dOut =>
      IncrementalJoin.appendSide(st.levels(level + 1), signedOf(dOut),
        st.keys(level + 1), dsId, isLeft = true, Some("__delta"),
        tapFor(st, level + 1, dsId))
    }
  }

  /** Key provenance for a MID-tree outer level `j`: every LATER level's
    * join keys must come from the prefix side — a null-extended group
    * must never lose a downstream probe key. Checked against the dim
    * (right) schema, known once the dim leaf has its first append: the
    * null-extendable set is the dim's value columns minus the level's
    * own equi-keys (which equal the prefix side's on inner rows and
    * stay non-null on null-extended ones). */
  private def requirePrefixKeyed(st: Stores, j: Int): Unit = {
    val in = st.levels(j)
    require(in.sideExists(false),
      s"mid-tree outer level $j needs its dim leaf loaded before any " +
        "prefix rows flow through — the null extension needs the dim " +
        "schema (an empty batch is fine)")
    val nullable = in.spark.table(in.rightTable).columns
      .filterNot(c => c == "__mult" || c == "__bid" ||
        c == IncrementalJoin.BucketGroupCol)
      .filterNot(st.keys(j).contains).toSet
    val laterKeys = st.keys.drop(j + 1).flatten.toSet
    val clash = laterKeys.intersect(nullable)
    require(clash.isEmpty,
      s"mid-tree outer level $j is not prefix-keyed: downstream join " +
        s"keys ${clash.mkString(", ")} come from its null-extendable " +
        "dim columns, so a null-extended group would lose its probe " +
        "key — reorder leaves or key later levels on prefix columns")
  }

  private def append(st: Stores, leaf: Int, batch: DataFrame, batchId: Long,
                     deltaCol: Option[String]): Unit = {
    require(leaf >= 0 && leaf < st.leaves,
      s"leaf $leaf out of range for a ${st.leaves}-leaf tree")
    require(batchId >= 0 && batchId < (1L << 62) / st.leaves,
      s"tree batch ids must be in [0, 2^62/${st.leaves}): $batchId")
    val dsId = st.leaves.toLong * batchId + leaf
    val level = math.max(leaf - 1, 0)
    if (leaf == st.leaves - 1 && st.outerUn.isDefined) {
      // the last leaf is the (outer-last) OUTER level's right side; a
      // chained agg/extrema consumes the OUTER Δ through the tap (null
      // flips this dim batch causes included), which needs the signed
      // path — unsigned appends lift to +1 deltas then
      val downstream = downstreamFor(st, dsId)
      (deltaCol, downstream) match {
        case (Some(dc), _) =>
          IncrementalOuterJoin.appendRightDelta(st.outer, batch,
            st.keys(level), dsId, dc, tap = downstream)
        case (None, Some(_)) =>
          IncrementalOuterJoin.appendRightDelta(st.outer,
            batch.withColumn("__delta", lit(1L)), st.keys(level), dsId,
            "__delta", tap = downstream)
        case (None, None) =>
          IncrementalOuterJoin.appendRight(st.outer, batch,
            st.keys(level), dsId)
      }
    }
    else if (st.outerUns.contains(level)) {
      // a MID outer level (or outer level 0): unsigned appends lift to
      // +1 deltas (the outer tap needs the signed path), and the OUTER
      // Δ cascades onward. The dim's own FIRST append is what creates
      // the right schema, so provenance waits for it (nothing can have
      // flowed through before — the left-flow check gates on the dim).
      if (leaf == 0 || st.levels(level).sideExists(false))
        requirePrefixKeyed(st, level)
      val (b, dc) = deltaCol match {
        case Some(c) => (batch, c)
        case None => (batch.withColumn("__delta", lit(1L)), "__delta")
      }
      val tap = Some((outerD: DataFrame) =>
        tapFor(st, level, dsId).foreach(_(outerD)))
      if (leaf == 0)
        IncrementalOuterJoin.appendLeftDelta(st.outerAt(level), b,
          st.keys(level), dsId, dc, tap = tap)
      else
        IncrementalOuterJoin.appendRightDelta(st.outerAt(level), b,
          st.keys(level), dsId, dc, tap = tap)
    }
    else
      IncrementalJoin.appendSide(st.levels(level), batch, st.keys(level),
        dsId, isLeft = leaf == 0, deltaCol, tapFor(st, level, dsId))
  }

  /** One INSERT batch on leaf `leaf`, propagated through every level it
    * can reach (leaf 0 enters level 0's left side; leaf j>0 enters level
    * j−1's right side). */
  def appendLeaf(st: Stores, leaf: Int, batch: DataFrame,
                 batchId: Long): Unit =
    append(st, leaf, batch, batchId, None)

  /** One SIGNED batch on leaf `leaf` (delete/update waves): `deltaCol`
    * carries each row's multiplicity; retractions flow through every
    * level as negative products — deleting one dimension row retracts
    * every joined fact row it supported, with no recompute. */
  def appendLeafDelta(st: Stores, leaf: Int, batch: DataFrame,
                      batchId: Long, deltaCol: String = "__delta"): Unit =
    append(st, leaf, batch, batchId, Some(deltaCol))

  /** The current full join as a value multiset (`columns…, n`) — the
    * last level's maintained output; never re-joins anything. On an
    * outer-last tree this is the OUTER multiset: the inner rows plus one
    * null-extended row per currently-unmatched prefix group. */
  def current(st: Stores): DataFrame =
    if (st.outerUn.isDefined) IncrementalOuterJoin.current(st.outer)
    else IncrementalJoin.current(st.levels.last)

  /** The maintained aggregate over the full join (requires an `aggSpec`
    * at open) — folds agg partials only; touches no join state. */
  def currentAgg(st: Stores): DataFrame = {
    val (store, spec) = st.agg.getOrElse(throw new IllegalStateException(
      "this tree was opened without an aggSpec"))
    IncrementalAgg.current(store, spec)
  }

  /** Register the tree's whole serve LATTICE over the ordered raw-scan
    * roots the leaves mirror: a user query joining ANY PREFIX of the
    * leaves — `paths(0) ⋈ paths(1)`, `… ⋈ paths(2)`, …, the full tree —
    * is answered from that prefix's maintained multiset (level `j`'s
    * out store IS the (j+2)-leaf prefix join; an OUTER level's prefix
    * serves its outer multiset, and the query must use LEFT OUTER at
    * exactly the maintained levels), and a full-tree aggregate matching
    * the maintained `aggSpec` keys serves from agg PARTIALS. One call
    * in, one [[deregisterServe]] out; `fresh` is the shared staleness
    * guard. This is the MV-lattice behavior a dashboard layer wants:
    * the maintenance work of one tree — inner, outer-last, or mid-tree
    * outer — serves every join prefix a query planner can ask for. */
  /** `ifAbsent = true` (the [[graft.plans.ServeCatalog]] restore path)
    * skips any prefix whose registration slot a live writer already
    * holds — a replayed catalog must never clobber a live `fresh`
    * guard.
    *
    * `setRef` (a [[graft.sinks.StoreSetRef]] over [[serveSurfaces]],
    * committed once per batch by the writer) pins the FULL tree's serve
    * closures to ONE committed ref per query: a query touching two
    * serve levels (agg partials + the extrema multiset, or either +
    * the tree multiset) observes one batch boundary across all of
    * them, never a mid-commit mix ([[graft.plans.ServePin]] memoizes
    * the snapshot per rewrite scope). Before the first commit, reads
    * fall back to live stores. Prefix serves read one store per query
    * — nothing to straddle — and stay live. */
  def registerServe(st: Stores, paths: Seq[String],
                    fresh: () => Boolean = () => true,
                    ifAbsent: Boolean = false,
                    setRef: Option[graft.sinks.StoreSetRef] = None): Unit = {
    require(paths.size == st.leaves,
      s"registerServe needs one raw path per leaf: ${paths.size} given, " +
        s"${st.leaves} leaves")
    def served(): Stores = setRef match {
      case Some(ref) => graft.plans.ServePin.resolve(ref) {
        if (ref.currentSeq().isDefined) pinnedView(st, ref.snapshot())
        else st
      }
      case None => st
    }
    val outs = st.outerUns.keySet
    // The 2-leaf prefix is a COURTESY registration: claim the pair only
    // if no independent binary MV already serves it (overwriting would
    // clobber that registration's serve and its own fresh() guard), and
    // remember the instance — keyed by CANONICAL paths plus this tree —
    // so deregisterServe removes only what THIS tree installed (two
    // trees sharing a 2-leaf prefix must not clobber each other's
    // bookkeeping). Level 0's type decides the shape: an outer level 0
    // registers the LEFT OUTER binary MV over its outer multiset.
    val binMv =
      if (outs.contains(0))
        graft.plans.MaterializedJoinRewrite.JoinMv(st.keys(0),
          org.apache.spark.sql.catalyst.plans.LeftOuter,
          () => IncrementalOuterJoin.current(st.outerAt(0)), fresh)
      else
        graft.plans.MaterializedJoinRewrite.JoinMv(st.keys(0),
          org.apache.spark.sql.catalyst.plans.Inner,
          () => IncrementalJoin.current(st.levels(0)), fresh)
    if (graft.plans.MaterializedJoinRewrite.registerIfAbsent(
        paths(0), paths(1), binMv))
      ownedPrefix.put(ownKey(st, paths), binMv)
    val downstreamServe = st.agg.toSeq.map { case (_, spec) =>
      graft.plans.MaterializedAggRewrite.MvDef(spec.keyCols,
        spec.sumCols, () => currentAgg(served()))
    } ++ st.extrema.toSeq.map(_ => extremaServeOf(st, () => served()))
    // every longer prefix serves its own maintained multiset: the
    // (n−1)-level prefix ends at level n−2, whose store is the OUTER
    // multiset when that level is outer (inner rows + null extensions)
    // and the inner out-store otherwise; `outerLevels` records the
    // outer levels INSIDE the prefix so the rewrite matches a query
    // with exactly those LEFT OUTER joins — an inner query over the
    // same scans is never answered from outer state, nor vice versa.
    // The chained agg/extrema (when maintained) serve the FULL tree
    // only — their taps consume the final level's Δ stream.
    (3 to st.leaves).foreach { n =>
      val lvl = n - 2
      val aggServe = if (n == st.leaves) downstreamServe else Nil
      val cur: () => DataFrame =
        if (n == st.leaves) () => current(served())
        else if (outs.contains(lvl)) () => IncrementalOuterJoin.current(st.outerAt(lvl))
        else () => IncrementalJoin.current(st.levels(lvl))
      val mv = graft.plans.MaterializedJoinRewrite.TreeMv(
        st.keys.take(n - 1), cur, fresh, aggServe,
        outerLevels = outs.filter(_ <= lvl).toSeq.sorted)
      if (ifAbsent)
        graft.plans.MaterializedJoinRewrite.registerTreeIfAbsent(
          paths.take(n), mv)
      else
        graft.plans.MaterializedJoinRewrite.registerTree(paths.take(n), mv)
    }
  }

  /** The binary-prefix JoinMvs trees actually installed (vs found an
    * independent registration already holding the pair), so
    * [[deregisterServe]] removes exactly what [[registerServe]] put —
    * keyed by canonicalized pair + tree instance, so equivalent path
    * spellings hit one entry and co-prefixed trees keep separate ones. */
  private val ownedPrefix =
    new java.util.concurrent.ConcurrentHashMap[(String, String, Stores),
      graft.plans.MaterializedJoinRewrite.JoinMv]()

  private def ownKey(st: Stores, paths: Seq[String]): (String, String, Stores) =
    (graft.plans.MaterializedJoinRewrite.canonPath(paths(0)),
      graft.plans.MaterializedJoinRewrite.canonPath(paths(1)), st)

  /** Remove every registration [[registerServe]] installed — and ONLY
    * those: an independent binary MV that already held the 2-leaf pair
    * at register time was never overwritten and is left in place. */
  def deregisterServe(st: Stores, paths: Seq[String]): Unit = {
    Option(ownedPrefix.remove(ownKey(st, paths))).foreach { mv =>
      graft.plans.MaterializedJoinRewrite.deregisterIfSame(
        paths(0), paths(1), mv)
    }
    (3 to st.leaves).foreach { n =>
      graft.plans.MaterializedJoinRewrite.deregisterTree(paths.take(n))
    }
  }

  /** The maintained extrema over the full join output (requires an
    * `extremaSpec` at open): per-key `n_rows`/`n_vals`/`min_`/`max_`. */
  def currentExtrema(st: Stores): DataFrame = {
    val (store, es) = requireExtrema(st)
    MinMaxAgg.current(store, es)
  }

  /** Exact discrete quantiles of the joined column (requires an
    * `extremaSpec` at open). */
  def quantiles(st: Stores, qs: Seq[Double]): DataFrame = {
    val (store, es) = requireExtrema(st)
    MinMaxAgg.quantilesDisc(store, es, qs)
  }

  /** The extrema store as a SERVE LEVEL for the SQL rewrite — same
    * contract as [[ChainedIvm.extremaServe]] (min/max/percentile_disc/
    * percentile_cont GROUP BY the extrema keys, `count(*)` declined). */
  def extremaServe(st: Stores): graft.plans.MaterializedAggRewrite.MvDef =
    extremaServeOf(st, () => st)

  /** [[extremaServe]] with the store resolved per invocation — the
    * [[registerServe]] `setRef` path reads through the query's pinned
    * view; the spec (key/value columns) is static across pins. */
  private def extremaServeOf(st0: Stores, stOf: () => Stores)
      : graft.plans.MaterializedAggRewrite.MvDef = {
    val (_, es) = requireExtrema(st0)
    def store() = requireExtrema(stOf())._1
    graft.plans.MaterializedAggRewrite.MvDef(
      keyCols = es.keyCols, sumCols = Nil,
      current = () => MinMaxAgg.current(store(), es),
      minCols = Seq(es.valCol), maxCols = Seq(es.valCol),
      discQuantileCurrent = Map(es.valCol -> { ps =>
        ps.foldLeft(MinMaxAgg.quantilesDisc(store(), es, ps)) { (d, p) =>
          d.withColumnRenamed(MinMaxAgg.quantileLabel(p),
            s"__qd_${math.round(p * 1e6)}")
        }
      }),
      contQuantileCurrent = Map(es.valCol -> { ps =>
        ps.foldLeft(MinMaxAgg.quantilesCont(store(), es, ps)) { (d, p) =>
          d.withColumnRenamed(MinMaxAgg.contLabel(p),
            s"__qc_${math.round(p * 1e6)}")
        }
      }),
      countRowsExact = false)
  }

  private def requireExtrema(st: Stores) = st.extrema.getOrElse(
    throw new IllegalStateException(
      "this tree was opened without an extremaSpec"))

  /** The tree's SERVING surfaces (the stores [[current]]/[[currentAgg]]/
    * [[currentExtrema]] read) as one [[graft.sinks.StoreSetRef]] store
    * map. A batch commits these sequentially (levels → agg → extrema),
    * so a reader listing them directly can see a mid-batch mix;
    * construct a `StoreSetRef` over this map, commit it once per batch
    * (the CDC tree drain does when given one), and read through
    * [[pinnedView]] for all-old-or-all-new. */
  def serveSurfaces(st: Stores): Map[String, graft.sinks.AppendOnlyStore] =
    Map("out" -> st.levels.last.out) ++
      st.outerUn.map("un" -> _) ++
      st.agg.map { case (store, _) => "agg" -> store } ++
      st.extrema.map { case (store, _) => "extrema" -> store }

  /** A CONSISTENCY-PINNED read handle: the same tree with its serving
    * stores replaced by one committed ref's pinned views, so
    * [[current]]/[[currentAgg]]/[[currentExtrema]] over it observe one
    * batch boundary across ALL surfaces. Maintenance calls on the
    * pinned view raise (the views are read-only). */
  def pinnedView(st: Stores,
                 snap: Map[String, graft.sinks.AppendOnlyStore]): Stores = {
    val last = st.levels.length - 1
    st.copy(
      levels = st.levels.updated(last,
        st.levels(last).copy(out = snap("out"))),
      outerUns = st.outerUns ++ st.outerUn.map(_ => last -> snap("un")),
      agg = st.agg.map { case (_, sp) => (snap("agg"), sp) },
      extrema = st.extrema.map { case (_, es) => (snap("extrema"), es) })
  }

  /** Compact every store in the tree (quiescence, single-writer):
    * per-level out stores + bucketed sides, the outer level's unmatched
    * multiset, then the aggregate and extrema. */
  def compact(st: Stores): Unit = {
    st.levels.indices.foreach { j =>
      IncrementalJoin.compactOut(st.levels(j))
      IncrementalJoin.compactSides(st.levels(j), st.keys(j))
    }
    st.outerUns.keys.foreach(j =>
      IncrementalOuterJoin.compactUn(st.outerAt(j)))
    st.agg.foreach { case (store, spec) =>
      IncrementalAgg.compact(store, spec)
    }
    st.extrema.foreach { case (store, es) => MinMaxAgg.compact(store, es) }
  }
}
