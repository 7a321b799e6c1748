package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType,
  LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._

/** Materialized-JOIN rewrite: an aggregate over the equi-join of two
  * REGISTERED raw scans is answered from the incrementally-maintained
  * [[graft.ops.IncrementalJoin]] state (or an outer variant) instead of
  * re-joining the raw tables — the chained composition a real
  * incremental pipeline runs: `SELECT k, agg(x) FROM A JOIN B GROUP BY
  * k` served end-to-end from maintained state.
  *
  * The maintained state is a VALUE-GROUP multiset — `(columns…, n)`
  * with `n` the exact row multiplicity of `A ⋈ B` — so every rewrite is
  * an exact re-weighting, not a partial-merge approximation:
  *
  *  - `count(*)`        → `sum(n)`
  *  - `count(c)`        → `sum(n)` over groups with `c` non-null
  *  - `sum(c)`          → `sum(c · n)`
  *  - `avg(c)`          → `sum(c · n) / sum(n | c non-null)`
  *  - `min(c)`/`max(c)` → `min(c)`/`max(c)` (multiplicity-invariant)
  *  - `count(DISTINCT c)` → `count(DISTINCT c)` over the groups — EXACT,
  *    because every distinct joined value survives as a group (the
  *    agg-store rewrite can never serve this; the join store can)
  *
  * Any column of the joined output may group; arbitrary deterministic
  * row-level predicates over the join result are servable because all
  * rows of a value group are identical — a predicate either keeps or
  * drops the whole group. Predicates the optimizer (or the user) placed
  * BELOW the join are accepted exactly when pushdown there is
  * semantics-preserving for the registered join type (inner: both
  * sides; left outer: preserved/left side only; full outer: neither) —
  * the same legality that makes them equivalent to a filter over the
  * join result, hence over the state.
  *
  * Conservative like [[MaterializedAggRewrite]]: the join type and
  * equi-key set must match the registration exactly, every referenced
  * column must exist in the maintained state, and anything else leaves
  * the plan untouched. A registration carries a `fresh` thunk — the
  * staleness guard: when it returns false (e.g. the maintenance loop
  * knows raw appends are not yet applied) the rewrite declines and the
  * query runs against the raw tables.
  *
  * At 100 TB this replaces the two fact scans AND the join shuffle with
  * a scan of the (compacted) state multiset — the join IVM's payoff made
  * visible to ordinary queries.
  */
object MaterializedJoinRewrite extends Rule[LogicalPlan] {

  /** @param on      equi-join key column names (shared across sides —
    *                the [[graft.ops.IncrementalJoin]] contract)
    * @param joinType the maintained join's type: Inner, LeftOuter or
    *                FullOuter — the query's join type must match
    * @param current builds the state multiset (valueCols… ++ `n`) —
    *                normally `() => IncrementalJoin.current(st)` or an
    *                outer variant's `current`
    * @param fresh   staleness guard: return false to decline serving
    *                (raw-side appends not yet maintained)
    * @param aggServe CHAINED downstream serve levels
    *                ([[graft.ops.ChainedIvm]]'s agg and extrema stores)
    *                as [[MaterializedAggRewrite.MvDef]]s, tried IN
    *                ORDER: when the query's grouping keys are exactly a
    *                level's maintained keys and every aggregate maps
    *                onto its state, the rewrite answers from per-key
    *                PARTIALS (size ∝ keys × compaction cadence) or the
    *                extrema value multiset instead of re-aggregating
    *                the join-state multiset (size ∝ distinct value
    *                groups) — the cheapest serve in the hierarchy.
    *                Typical registration: the count/sum agg store
    *                first, then a [[graft.ops.MinMaxAgg]]-backed level
    *                (minCols/maxCols/discQuantileCurrent,
    *                countRowsExact = false) answering min/max/
    *                percentile_disc GROUP BY the extrema keys. Anything
    *                no level can express (count-DISTINCT, other
    *                groupings, row-level predicates) falls back to the
    *                join-state path, then to the raw plan. */
  final case class JoinMv(on: Seq[String], joinType: JoinType,
                          current: () => DataFrame,
                          fresh: () => Boolean = () => true,
                          aggServe: Seq[MaterializedAggRewrite.MvDef] =
                            Nil)

  /** N-ARY registration: the maintained LEFT-DEEP join tree of ≥3 raw
    * scans ([[graft.ops.JoinTreeIvm]]). `keys(j)` are level `j`'s
    * equi-join columns (the prefix-output ⋈ leaf `j+1` condition);
    * `current` is the full tree's value multiset (`columns…, n`) —
    * normally `() => JoinTreeIvm.current(st)`. Every collected
    * deterministic predicate — above any level or on a leaf the level
    * type admits — commutes to a filter over the state: inner-level
    * equi-keys are equal on both sides (name ambiguity harmless), and
    * LEFT OUTER levels preserve every prefix column value on
    * null-extended rows, so a filter between levels keeps/drops exactly
    * the rows the same filter over the final multiset would. `aggServe`
    * levels serve exactly as on [[JoinMv]]: a GROUP BY on a level's
    * maintained keys folds agg PARTIALS instead of re-aggregating the
    * tree multiset.
    *
    * `outerLevels` names the levels maintained as LEFT OUTER joins (the
    * [[graft.ops.JoinTreeIvm]] `outerLevels`/`outerLast` shape); a
    * query matches only when its LEFT OUTER levels are EXACTLY this set
    * — an inner query over the same scans must never be answered from
    * outer state, nor vice versa. `outerLast` is kept as sugar for
    * `outerLevels = Seq(keys.size - 1)` (the pre-round-12 registrations
    * and their call sites). */
  final case class TreeMv(keys: Seq[Seq[String]],
                          current: () => DataFrame,
                          fresh: () => Boolean = () => true,
                          aggServe: Seq[MaterializedAggRewrite.MvDef] =
                            Nil,
                          outerLast: Boolean = false,
                          outerLevels: Seq[Int] = Nil) {
    /** The effective LEFT OUTER level set (`outerLast` folded in). */
    def outerSet: Set[Int] =
      (outerLevels ++ (if (outerLast) Seq(keys.size - 1) else Nil)).toSet
  }

  private val registry = new ConcurrentHashMap[(String, String), JoinMv]()
  private val treeRegistry = new ConcurrentHashMap[Seq[String], TreeMv]()
  private val rewriting = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  private def canon(p: String): String =
    new Path(p).toUri.getPath.stripSuffix("/")

  /** The registry's path canonicalization, for callers that key their
    * own bookkeeping by registered pairs (JoinTreeIvm's prefix
    * ownership) — raw-vs-canon spelling must not split an entry. */
  private[graft] def canonPath(p: String): String = canon(p)

  /** Register the maintained join of the raw tables rooted at
    * `leftPath` ⋈ `rightPath`. Side order is the registration's side
    * order; a query joining the same scans in either order matches. */
  def register(leftPath: String, rightPath: String, mv: JoinMv): Unit =
    registry.put((canon(leftPath), canon(rightPath)), mv)

  def deregister(leftPath: String, rightPath: String): Unit =
    registry.remove((canon(leftPath), canon(rightPath)))

  /** Register only when the pair is unclaimed. Returns true when THIS
    * call installed `mv` (the caller then owns deregistration via
    * [[deregisterIfSame]]); false leaves a pre-existing independent
    * registration — and its own `fresh` guard — untouched. The
    * courteous form for registrations that are a side effect of a
    * larger structure (a tree's 2-leaf prefix) rather than the user's
    * explicit binary MV. */
  def registerIfAbsent(leftPath: String, rightPath: String,
                       mv: JoinMv): Boolean =
    registry.putIfAbsent((canon(leftPath), canon(rightPath)), mv) == null

  /** Remove the pair's registration only when it is exactly `mv` — the
    * ownership-checked inverse of [[registerIfAbsent]]: a registration
    * someone else installed over the same pair survives. */
  def deregisterIfSame(leftPath: String, rightPath: String,
                       mv: JoinMv): Unit =
    registry.remove((canon(leftPath), canon(rightPath)), mv)

  /** Register a maintained join TREE over the ordered raw-scan roots
    * (`paths(0) ⋈ paths(1) ⋈ …` — the [[graft.ops.JoinTreeIvm]] leaf
    * order; a query must join in the same left-deep order). */
  def registerTree(paths: Seq[String], mv: TreeMv): Unit = {
    require(paths.size >= 3 && mv.keys.size == paths.size - 1,
      s"a tree registration needs ≥3 leaves and one key set per level")
    treeRegistry.put(paths.map(canon), mv)
  }

  /** [[registerTree]] only when the path tuple is unclaimed — the
    * restore path's form (a live registration's `fresh` guard must
    * never be clobbered by a catalog replay). Returns true when THIS
    * call installed `mv`. */
  def registerTreeIfAbsent(paths: Seq[String], mv: TreeMv): Boolean = {
    require(paths.size >= 3 && mv.keys.size == paths.size - 1,
      s"a tree registration needs ≥3 leaves and one key set per level")
    treeRegistry.putIfAbsent(paths.map(canon), mv) == null
  }

  def deregisterTree(paths: Seq[String]): Unit =
    treeRegistry.remove(paths.map(canon))

  def clear(): Unit = { registry.clear(); treeRegistry.clear() }

  /** Serve-hierarchy dispatch shared by the binary and tree paths:
    * chained agg levels first (partials, the cheapest), then the state
    * multiset re-weighting. */
  private def serve(groups: Seq[Expression], aggExprs: Seq[NamedExpression],
                    aggServe: Seq[MaterializedAggRewrite.MvDef],
                    current: () => DataFrame,
                    preds: Seq[Expression]): Option[LogicalPlan] = {
    val viaChain = aggServe.view.flatMap { amv =>
      if (preds.forall(_.references.forall(a =>
          amv.keyCols.contains(a.name)))) {
        rewriting.set(true)
        try MaterializedAggRewrite.rewriteWithMv(groups, aggExprs, amv, preds)
        finally rewriting.set(false)
      } else None
    }.headOption
    viaChain.orElse(rewrite(groups, aggExprs, current, preds))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if ((registry.isEmpty && treeRegistry.isEmpty) || rewriting.get()) plan
    // one ServePin scope per query plan: every serve closure invoked
    // below resolves StoreSetRef-pinned stores against ONE snapshot,
    // so two serve levels of one query cannot straddle a batch boundary
    else ServePin.scoped { plan.transformUp {
      case agg @ Aggregate(groups, aggExprs, child, _) =>
        matchJoin(child).flatMap { case (mv, preds, unsafeKeys) =>
          // OUTER-join key ambiguity guard: a non-USING outer join
          // exposes BOTH sides' key columns under the same name, and the
          // state carries only the preserved/coalesced one — resolving a
          // null-producing side's key byName would silently substitute a
          // non-null column for one that is NULL on unmatched rows
          // (e.g. GROUP BY B.k in A LEFT JOIN B). Decline whenever the
          // aggregate, grouping, or collected predicates reference such
          // a key attribute; the USING/coalesce forms reference fresh
          // aliases and pass untouched.
          val refs = AttributeSet(groups.flatMap(_.references) ++
            aggExprs.flatMap(_.references) ++ preds.flatMap(_.references))
          if (unsafeKeys.exists(refs.contains)) None
          else serve(groups, aggExprs, mv.aggServe, mv.current, preds)
        }.orElse {
          // n-ary: an aggregate over a registered left-deep tree —
          // inner levels have no unsafe keys (equi-keys are equal on
          // both sides); each LEFT OUTER level guards its null side's
          // key attrs exactly like the binary LeftOuter path
          matchTree(child).flatMap { case (mv, preds, unsafeKeys) =>
            val refs = AttributeSet(groups.flatMap(_.references) ++
              aggExprs.flatMap(_.references) ++ preds.flatMap(_.references))
            if (unsafeKeys.exists(refs.contains)) None
            else serve(groups, aggExprs, mv.aggServe, mv.current, preds)
          }
        }.getOrElse(agg)
    } }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** The scan root under attribute-only Projects and deterministic
    * Filters (collected). Returns (rootPath, filters). */
  private def scanUnder(p: LogicalPlan): Option[(String, Seq[Expression])] =
    p match {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.toSeq match {
              case Seq(rp) => Some((canon(rp.toString), Nil))
              case _ => None
            }
          case _ => None
        }
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        scanUnder(child)
      case Filter(pred, child) if pred.deterministic =>
        scanUnder(child).map { case (rp, ps) => (rp, pred +: ps) }
      case _ => None
    }

  /** A registered join directly under the aggregate (through
    * attribute-only Projects — plus the FULL OUTER USING-join's
    * `coalesce(lk, rk) AS k` aliases — and deterministic Filters, all
    * collected and re-applied over the state). */
  private def matchJoin(p: LogicalPlan)
      : Option[(JoinMv, Seq[Expression], Seq[Attribute])] = p match {
    case j @ Join(_, _, _, Some(_), _) => matchJoinNode(j, Nil)
    case Filter(pred, child) if pred.deterministic =>
      matchJoin(child).map { case (mv, preds, uk) => (mv, pred +: preds, uk) }
    case Project(pl, child) if pl.forall {
        case _: AttributeReference => true
        // full-outer USING join key: coalesce of the two side keys under
        // the key's own name — equals the state's key column by
        // construction (it carries the non-null side's key)
        case Alias(Coalesce(Seq(a: AttributeReference, b: AttributeReference)), nm)
          => a.name == nm && b.name == nm
        case _ => false
      } => matchJoin(child)
    case _ => None
  }

  /** A registered left-deep tree under the aggregate (through
    * attribute-only Projects and deterministic Filters, collected). The
    * query's LEFT OUTER level set must equal the registration's
    * `outerSet` exactly; every other level must be INNER. */
  private def matchTree(p: LogicalPlan)
      : Option[(TreeMv, Seq[Expression], Seq[Attribute])] =
    p match {
      case j: Join if !treeRegistry.isEmpty =>
        for {
          (roots, preds, levels) <- flattenLeftDeep(j)
          mv <- Option(treeRegistry.get(roots))
          if mv.keys.size == levels.size
          if levels.zip(mv.keys).forall { case ((cond, l, r, _), on) =>
            keysMatch(cond, l, r, on) }
          // the query's outer levels must be EXACTLY the maintained
          // ones (flattenLeftDeep admits Inner | LeftOuter only)
          if levels.zipWithIndex.collect {
            case ((_, _, _, LeftOuter), i) => i
          }.toSet == mv.outerSet
          if mv.fresh()
        } yield {
          // each outer level's null side exposes its join keys as NULL
          // on unmatched rows while the state carries the preserved
          // side's — byName resolution of those leaf key attrs would be
          // wrong (the same guard as the binary LeftOuter path), so any
          // reference to them declines
          val unsafe: Seq[Attribute] = mv.outerSet.toSeq.flatMap { i =>
            levels(i)._3.output.filter(a => mv.keys(i).contains(a.name))
          }
          (mv, preds, unsafe)
        }
      case Filter(pred, child) if pred.deterministic =>
        matchTree(child).map { case (mv, ps, uk) => (mv, pred +: ps, uk) }
      case Project(pl, child)
        if pl.forall(_.isInstanceOf[AttributeReference]) => matchTree(child)
      case _ => None
    }

  /** Flatten `((leaf0 ⋈ leaf1) ⋈ leaf2) ⋈ …` — joins where one side of
    * every level is a leaf scan — into (ordered leaf roots, collected
    * deterministic predicates, per-level (condition, left, right,
    * joinType)). An INNER level with the LEAF ON THE LEFT matches too
    * (inner is symmetric; a planner side-swap must not lose the serve).
    * A LEFT OUTER level matches only with the leaf on the RIGHT (left
    * outer is not symmetric) and only with NO predicates collected
    * under that leaf (null-side pushdown is not semantics-preserving —
    * a filtered null side changes which prefix groups null-extend);
    * [[matchTree]] additionally requires the query's outer-level SET to
    * equal the registration's. Attribute-only Projects and deterministic
    * Filters between levels are unwrapped; every surviving predicate
    * commutes to a filter over the state multiset. Anything else
    * (other outer types, bushy shapes) declines. */
  private def flattenLeftDeep(p: LogicalPlan)
      : Option[(Seq[String], Seq[Expression],
        Seq[(Expression, LogicalPlan, LogicalPlan, JoinType)])] = p match {
    case Join(l, r, jt @ (Inner | LeftOuter), Some(cond), _) =>
      (scanUnder(l), scanUnder(r)) match {
        case (Some((lRoot, lPreds)), Some((rRoot, rPreds)))
          if jt == Inner || rPreds.isEmpty =>
          // two-leaf base of the recursion
          Some((Seq(lRoot, rRoot), lPreds ++ rPreds,
            Seq((cond, l, r, jt))))
        case (None, Some((rRoot, rPreds)))
          if jt == Inner || rPreds.isEmpty =>
          flattenLeftDeep(l).map { case (roots, preds, levels) =>
            (roots :+ rRoot, preds ++ rPreds, levels :+ ((cond, l, r, jt)))
          }
        case (Some((lRoot, lPreds)), None) if jt == Inner => // flipped
          flattenLeftDeep(r).map { case (roots, preds, levels) =>
            (roots :+ lRoot, preds ++ lPreds, levels :+ ((cond, l, r, jt)))
          }
        case _ => None
      }
    case Filter(pred, child) if pred.deterministic =>
      flattenLeftDeep(child).map { case (roots, preds, levels) =>
        (roots, pred +: preds, levels) }
    case Project(pl, child)
      if pl.forall(_.isInstanceOf[AttributeReference]) =>
      flattenLeftDeep(child)
    case _ => None
  }

  private def matchJoinNode(j: Join, above: Seq[Expression])
      : Option[(JoinMv, Seq[Expression], Seq[Attribute])] = {
    val Join(l, r, jt, Some(cond), _) = j
    for {
      (lRoot, lPreds) <- scanUnder(l)
      (rRoot, rPreds) <- scanUnder(r)
      (mv, flipped) <- Option(registry.get((lRoot, rRoot))).map((_, false))
        .orElse(Option(registry.get((rRoot, lRoot))).map((_, true)))
      if jtMatches(jt, mv.joinType, flipped)
      if keysMatch(cond, l, r, mv.on)
      if belowPredsLegal(mv.joinType, flipped, lPreds, rPreds)
      if mv.fresh()
    } yield {
      // key attributes whose byName resolution into the state would be
      // WRONG: the null-producing side(s)' join keys (NULL on unmatched
      // rows; the state's key column never is). LeftOuter: the right
      // side (a flipped LeftOuter never matches). FullOuter: both sides
      // — only the coalesced USING alias is servable.
      val unsafeKeys: Seq[Attribute] = mv.joinType match {
        case LeftOuter => r.output.filter(a => mv.on.contains(a.name))
        case FullOuter =>
          (l.output ++ r.output).filter(a => mv.on.contains(a.name))
        case _ => Nil
      }
      (mv, above ++ lPreds ++ rPreds, unsafeKeys)
    }
  }

  /** Inner and full-outer are symmetric; a flipped left-outer
    * registration would need the query's RIGHT OUTER twin — not matched
    * (conservative). */
  private def jtMatches(queryJt: JoinType, mvJt: JoinType,
                        flipped: Boolean): Boolean =
    (queryJt, mvJt) match {
      case (Inner, Inner) => true
      case (FullOuter, FullOuter) => true
      case (LeftOuter, LeftOuter) => !flipped
      case _ => false
    }

  /** Below-join predicates commute with the join (and therefore with
    * the state multiset) exactly when pushdown to that side is
    * semantics-preserving: inner — both sides; left outer — the
    * preserved (left) side only; full outer — neither. */
  private def belowPredsLegal(mvJt: JoinType, flipped: Boolean,
                              lPreds: Seq[Expression],
                              rPreds: Seq[Expression]): Boolean =
    mvJt match {
      case Inner => true
      case LeftOuter => rPreds.isEmpty // !flipped guaranteed by jtMatches
      case FullOuter => lPreds.isEmpty && rPreds.isEmpty
      case _ => false
    }

  /** The join condition must be exactly the registered equi-key set:
    * one same-named attribute pair per key, nothing else. */
  private def keysMatch(cond: Expression, l: LogicalPlan, r: LogicalPlan,
                        on: Seq[String]): Boolean = {
    val lOut = l.outputSet
    val rOut = r.outputSet
    val names = splitConjuncts(cond).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
        if a.name == b.name &&
          ((lOut.contains(a) && rOut.contains(b)) ||
            (rOut.contains(a) && lOut.contains(b))) => Some(a.name)
      case _ => None
    }
    names.forall(_.isDefined) &&
      names.flatten.toSet == on.toSet && names.size == on.size
  }

  private def rewrite(groups: Seq[Expression],
                      aggExprs: Seq[NamedExpression],
                      current: () => DataFrame,
                      preds: Seq[Expression]): Option[LogicalPlan] = {
    val groupAttrs = groups.collect { case a: AttributeReference => a }
    if (groupAttrs.size != groups.size) return None

    // phase 1: classify every aggregate call; collect every referenced
    // column name — all must exist in the state multiset
    sealed trait Re
    case object CountRows extends Re
    case class CountCol(c: String) extends Re
    case class SumTimesN(c: String) extends Re
    case class MinOf(c: String) extends Re
    case class MaxOf(c: String) extends Re
    case class AvgOf(c: String) extends Re
    case class DistinctOf(c: String) extends Re
    val aggRefs = scala.collection.mutable.LinkedHashMap[ExprId, Re]()
    def toRe(ae: AggregateExpression): Option[Re] = ae match {
      case AggregateExpression(Count(Seq(lt: Literal)), _, false, None, _)
        if lt.value != null => Some(CountRows)
      case AggregateExpression(Count(Seq(a: AttributeReference)), _, false, None, _) =>
        Some(CountCol(a.name))
      case AggregateExpression(Count(Seq(a: AttributeReference)), _, true, None, _) =>
        Some(DistinctOf(a.name))
      case AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _) =>
        Some(SumTimesN(a.name))
      case AggregateExpression(Min(a: AttributeReference), _, false, None, _) =>
        Some(MinOf(a.name))
      case AggregateExpression(Max(a: AttributeReference), _, false, None, _) =>
        Some(MaxOf(a.name))
      case AggregateExpression(Average(a: AttributeReference, _), _, false, None, _)
        if ae.dataType == DoubleType => Some(AvgOf(a.name))
      case _ => None
    }
    def scanOk(e: Expression): Boolean = e match {
      case ae: AggregateExpression =>
        toRe(ae) match {
          case Some(re) => aggRefs(ae.resultId) = re; true
          case None => false
        }
      case a: AttributeReference => groupAttrs.exists(_.exprId == a.exprId)
      case other => other.children.forall(scanOk)
    }
    val shapeOk = aggExprs.forall {
      case a: AttributeReference => groupAttrs.exists(_.exprId == a.exprId)
      case al: Alias => scanOk(al.child)
      case _ => false
    }
    if (!shapeOk) return None
    val refs = aggRefs.values.toSeq

    rewriting.set(true)
    try {
      val refold = current().queryExecution.optimizedPlan
      // Duplicate output names make name-resolution ambiguous — in
      // particular a value column literally named `n` would collide
      // with the multiplicity column and silently resolve group-by/agg
      // references to the wrong attribute. Decline; the raw plan is
      // always correct.
      if (refold.output.map(_.name).distinct.size != refold.output.size)
        return None
      val byName = refold.output.map(a => a.name -> a).toMap
      val n = byName.getOrElse("n", return None)
      val needed = groupAttrs.map(_.name) ++
        preds.flatMap(_.references.map(_.name)) ++
        refs.collect {
          case CountCol(c) => c
          case SumTimesN(c) => c
          case MinOf(c) => c
          case MaxOf(c) => c
          case AvgOf(c) => c
          case DistinctOf(c) => c
        }
      if (!needed.forall(byName.contains)) return None

      val filtered = preds.foldLeft(refold: LogicalPlan) { (p, pred) =>
        Filter(pred.transform { case a: AttributeReference => byName(a.name) },
          p)
      }

      /** `col · n` with types the analyzer would have produced: integral
        * columns widen to long BEFORE the product (so int×int cannot
        * overflow), fractionals to double, decimals multiply by a
        * decimal-cast n (BinaryArithmetic computes the widened result
        * type itself). */
      def product(c: Attribute): Expression = c.dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          Multiply(Cast(c, LongType), n)
        case _: DecimalType => Multiply(c, Cast(n, DecimalType(20, 0)))
        case _ => Multiply(Cast(c, DoubleType), Cast(n, DoubleType))
      }
      def nonNullN(c: Attribute): Expression =
        If(IsNotNull(c), n, Literal(0L))

      def build(e: Expression): Expression = e match {
        case ae: AggregateExpression =>
          val raw: Expression = aggRefs(ae.resultId) match {
            case CountRows => Sum(n).toAggregateExpression()
            case CountCol(c) =>
              Sum(nonNullN(byName(c))).toAggregateExpression()
            case SumTimesN(c) =>
              Sum(product(byName(c))).toAggregateExpression()
            case MinOf(c) => Min(byName(c)).toAggregateExpression()
            case MaxOf(c) => Max(byName(c)).toAggregateExpression()
            case AvgOf(c) => Divide(
              Cast(Sum(product(byName(c))).toAggregateExpression(),
                DoubleType),
              Cast(Sum(nonNullN(byName(c))).toAggregateExpression(),
                DoubleType))
            case DistinctOf(c) =>
              Count(Seq(byName(c))).toAggregateExpression(isDistinct = true)
          }
          if (raw.dataType == ae.dataType) raw else Cast(raw, ae.dataType)
        case a: AttributeReference => byName(a.name)
        case other => other.withNewChildren(other.children.map(build))
      }
      val out: Seq[NamedExpression] = aggExprs.map {
        case a: AttributeReference =>
          Alias(byName(a.name), a.name)(exprId = a.exprId)
        case al: Alias => Alias(build(al.child), al.name)(exprId = al.exprId)
        case _ => return None // unreachable given shapeOk
      }
      val groupExprs: Seq[Expression] = groupAttrs.map(a => byName(a.name))
      Some(Aggregate(groupExprs, out, filtered))
    } finally rewriting.set(false)
  }
}
