package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftAggBridge
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Optimizer rewrite: `row_number() OVER (PARTITION BY p ORDER BY o) <= k`
  * filters become a bounded-heap `CollectTopK` aggregate + posexplode;
  * `rank()/dense_rank() <= k` filters become the tie-aware
  * `CollectTopRank` aggregate + explode (ranks computed in the heap,
  * boundary ties kept per each function's semantics).
  *
  * Spark's own path for this pattern (`InferWindowGroupLimit` →
  * `WindowGroupLimitExec`) still REQUIRES a full local sort of every
  * input partition (`requiredChildOrdering = partitionSpec ++ orderSpec`)
  * in its partial stage, then a second sort after the shuffle: the top-k
  * rows per key are found by sorting ALL rows. At 100 TB that is the
  * dominant cost — O(n log n) per partition plus spill. The heap
  * aggregate needs no sort at all: map-side partial aggregation keeps a
  * result-bounded heap per key, the shuffle carries only those heaps, and
  * emission order IS rank order. This is [[graft.ops.RankOps.topKPerKey]]
  * applied automatically to any user query — SQL or DataFrame — written
  * in the naive window form.
  *
  * Eligibility (anything else is left untouched):
  *  - single window expression: `row_number()`, `rank()` or
  *    `dense_rank()`;
  *  - the filter bounds it above by a literal (`rn <= k`, `rn < k`,
  *    `rn = 1`, or the mirrored literal-first forms); other conjuncts
  *    stay as a residual filter above the rewrite;
  *  - 0 < k ≤ maxK (heaps live in executor memory; for the rank family
  *    heap size is k plus boundary ties — Θ(result size), the rows any
  *    plan must materialize);
  *  - partition keys are plain attributes; order keys are deterministic,
  *    uniformly ascending or uniformly descending, with default null
  *    ordering (struct comparison has exactly those semantics);
  *  - every child column is of an orderable type (rows ride inside the
  *    compared struct).
  *
  * Registered by [[graft.GraftExtensions]]; disable per-session with
  * spark.sql.optimizer.excludedRules=graft.plans.TopKRewrite.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  private sealed trait RankKind
  private case object ByRowNumber extends RankKind
  private case object ByRank extends RankKind
  private case object ByDenseRank extends RankKind

  /** Heap rows per key per partition are bounded by k; beyond this a
    * sort-based plan is the safer default. */
  private val maxK = 10000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(f)
    case f @ Filter(cond, Project(projList, w: Window))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      // attribute-only projection commutes with the rewrite: re-apply it
      // on top (attr ids are preserved below)
      rewrite(cond, w)
        .map(r => Project(projList, r))
        .getOrElse(f)
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    val Window(windowExprs, partSpec, orderSpec, wChild, _) = w
    // WindowGroupLimit (Spark's sort-based pre-filter) may already sit
    // below the window; the heap plan subsumes it
    val child = wChild match {
      case WindowGroupLimit(_, _, _, _, gc) => gc
      case c => c
    }
    for {
      (alias, kind) <- windowExprs match {
        case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) =>
          Some((a, ByRowNumber: RankKind))
        case Seq(a @ Alias(WindowExpression(Rank(_), _), _)) =>
          Some((a, ByRank: RankKind))
        case Seq(a @ Alias(WindowExpression(DenseRank(_), _), _)) =>
          Some((a, ByDenseRank: RankKind))
        case _ => None
      }
      rnAttr = alias.toAttribute
      (k, residual) <- extractBound(cond, rnAttr)
      if k > 0 && k <= maxK
      partAttrs <- Some(partSpec).collect {
        case ps if ps.forall(_.isInstanceOf[AttributeReference]) =>
          ps.map(_.asInstanceOf[AttributeReference])
      }
      if orderSpec.nonEmpty && orderSpec.forall(_.child.deterministic)
      if orderSpec.forall(o => o.nullOrdering == o.direction.defaultNullOrdering)
      if orderSpec.map(_.direction).distinct.size == 1
      if child.output.forall(a => RowOrdering.isOrderable(a.dataType))
      if orderSpec.forall(o => RowOrdering.isOrderable(o.child.dataType))
    } yield {
      val ascending = orderSpec.head.direction == Ascending
      val orderExprs = orderSpec.map(_.child)
      val structExpr = CreateStruct(orderExprs ++ child.output)
      val structType = structExpr.dataType.asInstanceOf[StructType]
      val base = orderExprs.length
      val childIndex = child.output.zipWithIndex.toMap
      val partIds = partAttrs.map(_.exprId).toSet

      val projected: LogicalPlan = kind match {
        case ByRowNumber =>
          val topkAlias = Alias(
            GraftAggBridge.collectTopK(structExpr, k, reverse = ascending),
            "__graft_topk")()
          val agg = Aggregate(partAttrs, partAttrs :+ topkAlias, child)
          val posAttr = AttributeReference("__graft_pos", IntegerType,
            nullable = false)()
          val rowAttr = AttributeReference("__graft_row", structType,
            nullable = false)()
          val gen = Generate(PosExplode(topkAlias.toAttribute),
            unrequiredChildIndex = Seq(agg.output.length - 1), outer = false,
            qualifier = None, generatorOutput = Seq(posAttr, rowAttr), agg)
          val projOut: Seq[NamedExpression] = w.output.map {
            case a if a.exprId == rnAttr.exprId =>
              Alias(Add(posAttr, Literal(1)), a.name)(exprId = a.exprId)
            case a if partIds.contains(a.exprId) => a
            case a =>
              Alias(GetStructField(rowAttr, base + childIndex(a), Some(a.name)),
                a.name)(exprId = a.exprId)
          }
          Project(projOut, gen)

        case ByRank | ByDenseRank =>
          // synthetic unique field names: an order expr and a child column
          // may share a name (ORDER BY v keeps v in the payload too), and
          // GeneratorNestedColumnAliasing resolves struct fields by name
          val named = CreateNamedStruct(
            orderExprs.zipWithIndex.flatMap { case (e, i) =>
              Seq(Literal(s"_o$i"), e) } ++
            child.output.zipWithIndex.flatMap { case (a, i) =>
              Seq(Literal(s"_c$i"), a) })
          val topAlias = Alias(
            GraftAggBridge.collectTopRank(named, k,
              orderFieldCount = base, dense = kind == ByDenseRank,
              reverse = !ascending),
            "__graft_toprank")()
          val agg = Aggregate(partAttrs, partAttrs :+ topAlias, child)
          // element type: (__rank int) +: named struct fields
          val rankedType = StructType(
            StructField("__rank", IntegerType, nullable = false) +:
              named.dataType.asInstanceOf[StructType].fields)
          val rowAttr = AttributeReference("__graft_rankrow", rankedType,
            nullable = false)()
          val gen = Generate(Explode(topAlias.toAttribute),
            unrequiredChildIndex = Seq(agg.output.length - 1), outer = false,
            qualifier = None, generatorOutput = Seq(rowAttr), agg)
          // the name HINT must be the struct's actual field name —
          // GeneratorNestedColumnAliasing re-resolves fields by it
          val projOut: Seq[NamedExpression] = w.output.map {
            case a if a.exprId == rnAttr.exprId =>
              Alias(GetStructField(rowAttr, 0, Some("__rank")), a.name)(
                exprId = a.exprId)
            case a if partIds.contains(a.exprId) => a
            case a =>
              Alias(GetStructField(rowAttr, 1 + base + childIndex(a),
                Some(s"_c${childIndex(a)}")), a.name)(exprId = a.exprId)
          }
          Project(projOut, gen)
      }
      residual.map(Filter(_, projected)).getOrElse(projected)
    }
  }

  /** Split `cond` into an upper bound for `rn` plus the residual
    * predicate (which must not mention `rn`). */
  private def extractBound(cond: Expression,
                           rn: Attribute): Option[(Int, Option[Expression])] = {
    val conjuncts = splitConjuncts(cond)
    val (onRn, rest) = conjuncts.partition(_.references.contains(rn))
    if (onRn.isEmpty || rest.exists(_.references.contains(rn))) return None
    val bounds = onRn.map {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(v))
        if a.exprId == rn.exprId => Some(v)
      case LessThan(a: Attribute, IntegerLiteral(v))
        if a.exprId == rn.exprId => Some(v - 1)
      case GreaterThanOrEqual(IntegerLiteral(v), a: Attribute)
        if a.exprId == rn.exprId => Some(v)
      case GreaterThan(IntegerLiteral(v), a: Attribute)
        if a.exprId == rn.exprId => Some(v - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
        if a.exprId == rn.exprId => Some(1)
      case EqualTo(IntegerLiteral(1), a: Attribute)
        if a.exprId == rn.exprId => Some(1)
      case _ => None
    }
    if (bounds.exists(_.isEmpty)) None
    else Some((bounds.flatten.min,
      rest.reduceOption(And)))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
