package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftAggBridge
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Optimizer rewrite: `row_number() OVER (PARTITION BY p ORDER BY o) <= k`
  * filters become a bounded-heap `CollectTopK` aggregate + posexplode.
  *
  * Spark's own path for this pattern (`InferWindowGroupLimit` →
  * `WindowGroupLimitExec`) still REQUIRES a full local sort of every
  * input partition (`requiredChildOrdering = partitionSpec ++ orderSpec`)
  * in its partial stage, then a second sort after the shuffle: the top-k
  * rows per key are found by sorting ALL rows. At 100 TB that is the
  * dominant cost — O(n log n) per partition plus spill. The heap
  * aggregate needs no sort at all: map-side partial aggregation keeps a
  * ≤k-row heap per key, the shuffle carries only those heaps, and
  * emission order IS rank order. This is [[graft.ops.RankOps.topKPerKey]]
  * applied automatically to any user query — SQL or DataFrame — written
  * in the naive window form.
  *
  * Eligibility (anything else is left untouched):
  *  - single window expression, and it is `row_number()`;
  *  - the filter bounds it above by a literal (`rn <= k`, `rn < k`,
  *    `rn = 1`, or the mirrored literal-first forms); other conjuncts
  *    stay as a residual filter above the rewrite;
  *  - 0 < k ≤ maxK (heaps live in executor memory);
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
      alias <- windowExprs match {
        case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => Some(a)
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
      val topkAlias = Alias(
        GraftAggBridge.collectTopK(structExpr, k, reverse = ascending),
        "__graft_topk")()
      val agg = Aggregate(partAttrs, partAttrs :+ topkAlias, child)

      val structType = structExpr.dataType.asInstanceOf[StructType]
      val posAttr = AttributeReference("__graft_pos", IntegerType,
        nullable = false)()
      val rowAttr = AttributeReference("__graft_row", structType,
        nullable = false)()
      val gen = Generate(PosExplode(topkAlias.toAttribute),
        unrequiredChildIndex = Seq(agg.output.length - 1), outer = false,
        qualifier = None, generatorOutput = Seq(posAttr, rowAttr), agg)

      val base = orderExprs.length
      val childIndex = child.output.zipWithIndex.toMap
      val partIds = partAttrs.map(_.exprId).toSet
      val projOut: Seq[NamedExpression] = w.output.map {
        case a if a.exprId == rnAttr.exprId =>
          Alias(Add(posAttr, Literal(1)), a.name)(exprId = a.exprId)
        case a if partIds.contains(a.exprId) => a
        case a =>
          Alias(GetStructField(rowAttr, base + childIndex(a), Some(a.name)),
            a.name)(exprId = a.exprId)
      }
      val projected: LogicalPlan = Project(projOut, gen)
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
