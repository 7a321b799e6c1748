package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Average, Count, HyperLogLogPlusPlus, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types.DoubleType

/** Materialized-aggregate rewrite: a grouped aggregate over a REGISTERED
  * source table is answered from its incrementally-maintained
  * [[graft.ops.IncrementalAgg]] store instead of re-scanning the raw
  * data — the lakehouse "materialized view hit" (Snowflake/Databricks
  * MV rewrite), wired to the store this engine already maintains with
  * batch-sized IO.
  *
  * Strictly opt-in and conservative: nothing changes unless the scan's
  * root path was registered via [[register]], the grouping keys are
  * exactly the maintained key set, and every aggregate maps onto
  * maintained state (`count(literal)`, non-distinct `sum`/`min`/`max`/
  * `avg` of a maintained column, registered distinct counts). A filter
  * between the aggregate and the scan is tolerated ONLY when it touches
  * grouping keys alone — such a predicate commutes with the per-key
  * aggregate and re-applies over the (key-carrying) store re-fold.
  * Everything else keeps its original plan. Freshness is the
  * registrant's contract, as with any MV: register the store only while
  * its maintenance loop is wired to the same ingest that feeds the raw
  * table.
  *
  * At 100 TB the rewrite turns a full fact-table scan + shuffle into a
  * read of per-key partial rows (store size ~ keys × batches, collapsed
  * further by compaction) — the entire point of maintaining the
  * aggregate incrementally.
  */
object MaterializedAggRewrite extends Rule[LogicalPlan] {

  /** @param keyCols   maintained grouping keys (must match exactly)
    * @param sumCols   maintained sum columns — each also serves `avg`
    *                  (answered as `sum_c / cnt_c`; the store's
    *                  `cnt_<col>` is the NON-NULL count, so null
    *                  semantics match Catalyst `Average`)
    * @param minCols   maintained min columns
    * @param maxCols   maintained max columns
    * @param current   builds the re-fold DataFrame (columns: keys ++
    *                  `n_rows` ++ `sum/cnt/min/max_<col>`) — normally
    *                  `() => IncrementalAgg.current(store, spec)`
    * @param distinctCurrent per-column distinct-count providers (columns:
    *                  keys ++ `n_distinct`) — normally a
    *                  [[graft.ops.SketchAgg]] store. `approx_count_distinct`
    *                  over a provided column is answered from it: both
    *                  sides are approximate by contract, though the
    *                  estimators differ (HLL++ vs the store's sketch)
    * @param serveExactDistinct registrant's assertion that the distinct
    *                  stores are in their EXACT regime (e.g. the
    *                  documented sparse-mode bound), allowing plain
    *                  `count(DISTINCT col)` to be answered from them;
    *                  leave false unless that bound is guaranteed
    * @param quantileCurrent per-column quantile providers: given the
    *                  requested probabilities, build a DataFrame of
    *                  keys ++ `q<pct>` columns — normally
    *                  `ps => QuantileSketchAgg.current(store, spec, ps)`.
    *                  `percentile_approx(col, p)` with a literal scalar
    *                  `p` is answered from it; both sides are
    *                  approximate by contract, though the estimators
    *                  differ (Spark's GK summaries vs the store's KLL) */
  final case class MvDef(keyCols: Seq[String], sumCols: Seq[String],
                         current: () => DataFrame,
                         minCols: Seq[String] = Nil,
                         maxCols: Seq[String] = Nil,
                         distinctCurrent: Map[String, () => DataFrame] =
                           Map.empty,
                         serveExactDistinct: Boolean = false,
                         quantileCurrent: Map[String, Seq[Double] => DataFrame] =
                           Map.empty)

  /** How one output column maps onto the store. */
  private sealed trait StoreRef
  private final case class Plain(name: String) extends StoreRef
  private final case class AvgOf(c: String) extends StoreRef
  private final case class DistinctOf(c: String) extends StoreRef
  private final case class QuantileOf(c: String, p: Double) extends StoreRef

  private val registry = new ConcurrentHashMap[String, MvDef]()
  // re-entrancy guard: building the replacement DataFrame analyzes a new
  // plan, which runs this rule again on the store scan
  private val rewriting = new ThreadLocal[Boolean] {
    override def initialValue(): Boolean = false
  }

  private def canon(p: String): String =
    new Path(p).toUri.getPath.stripSuffix("/")

  /** Register a maintained aggregate for the table rooted at
    * `sourcePath`. Subsequent matching aggregates in ANY session with
    * GraftExtensions answer from the store. */
  def register(sourcePath: String, mv: MvDef): Unit =
    registry.put(canon(sourcePath), mv)

  def deregister(sourcePath: String): Unit = registry.remove(canon(sourcePath))

  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty || rewriting.get()) plan
    else plan.transformUp {
      case agg @ Aggregate(groups, aggExprs, child, _) =>
        sourceOf(child).flatMap { case (_, mv, preds) =>
          rewrite(agg, groups, aggExprs, mv, preds)
        }.orElse {
          joinSourceOf(child).flatMap { case (mv, preds, dimPlan, pairs) =>
            rewriteJoin(groups, aggExprs, mv, preds, dimPlan, pairs)
          }
        }.getOrElse(agg)
    }
  }

  /** An INNER equi-join of the registered fact scan with an arbitrary
    * dimension subtree, directly under the aggregate: returns the fact's
    * MvDef + key-only fact predicates, the dim subtree (reused verbatim,
    * attribute ids intact), and the (factKeyAttr, dimAttr) join pairs.
    * Every fact-side join key must be a maintained grouping key. */
  private def joinSourceOf(p: LogicalPlan)
      : Option[(MvDef, Seq[Expression], LogicalPlan,
                Seq[(AttributeReference, Attribute)])] = {
    val join = p match {
      case j: Join => Some(j)
      case Project(pl, j: Join)
        if pl.forall(_.isInstanceOf[AttributeReference]) => Some(j)
      case _ => None
    }
    join.flatMap {
      case Join(l, r, org.apache.spark.sql.catalyst.plans.Inner,
          Some(cond), _) =>
        def pairsFor(factSide: LogicalPlan, dimSide: LogicalPlan)
            : Option[Seq[(AttributeReference, Attribute)]] = {
          val fOut = factSide.outputSet
          val dOut = dimSide.outputSet
          val conj = splitConjuncts(cond)
          val pairs = conj.map {
            case EqualTo(a: AttributeReference, b: AttributeReference)
              if fOut.contains(a) && dOut.contains(b) => Some((a, b: Attribute))
            case EqualTo(b: AttributeReference, a: AttributeReference)
              if fOut.contains(a) && dOut.contains(b) => Some((a, b: Attribute))
            case _ => None
          }
          if (pairs.exists(_.isEmpty)) None else Some(pairs.flatten)
        }
        def tryFact(factSide: LogicalPlan, dimSide: LogicalPlan) =
          sourceOf(factSide).flatMap { case (_, mv, preds) =>
            pairsFor(factSide, dimSide)
              .filter(_.forall { case (fa, _) => mv.keyCols.contains(fa.name) })
              .filter(_.nonEmpty)
              .map(ps => (mv, preds, dimSide, ps))
          }
        tryFact(l, r).orElse(tryFact(r, l))
      case _ => None
    }
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
      splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** The registered source under the aggregate, tolerating the
    * column-pruning Project and KEY-ONLY filters (collected and re-applied
    * over the store re-fold — a predicate on grouping keys commutes with
    * the per-key aggregate). A filter touching any non-key column, a
    * join, or any other operator → no match. */
  private def sourceOf(p: LogicalPlan)
      : Option[(LogicalRelation, MvDef, Seq[Expression])] =
    p match {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.iterator
              .map(rp => registry.get(canon(rp.toString)))
              .collectFirst { case mv if mv != null => (lr, mv, Nil) }
          case _ => None
        }
      case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
        sourceOf(child)
      case Filter(pred, child) if pred.deterministic =>
        sourceOf(child).filter { case (_, mv, _) =>
          pred.references.forall(a => mv.keyCols.contains(a.name))
        }.map { case (lr, mv, preds) => (lr, mv, pred +: preds) }
      case _ => None
    }

  private def rewrite(agg: Aggregate, groups: Seq[Expression],
                      aggExprs: Seq[NamedExpression],
                      mv: MvDef,
                      keyPreds: Seq[Expression]): Option[LogicalPlan] = {
    val groupAttrs = groups.collect { case a: AttributeReference => a }
    if (groupAttrs.size != groups.size) return None
    if (groupAttrs.map(_.name).toSet != mv.keyCols.toSet) return None

    // map every output column onto a store reference, or bail
    val mapped: Seq[Option[(NamedExpression, StoreRef)]] = aggExprs.map {
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        Some((a, Plain(a.name)))
      case al @ Alias(AggregateExpression(Count(Seq(l: Literal)), _, false, None, _), _)
        if l.value != null =>
        Some((al, Plain("n_rows")))
      case al @ Alias(AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _), _)
        if mv.sumCols.contains(a.name) =>
        Some((al, Plain(s"sum_${a.name}")))
      case al @ Alias(AggregateExpression(Min(a: AttributeReference), _, false, None, _), _)
        if mv.minCols.contains(a.name) =>
        Some((al, Plain(s"min_${a.name}")))
      case al @ Alias(AggregateExpression(Max(a: AttributeReference), _, false, None, _), _)
        if mv.maxCols.contains(a.name) =>
        Some((al, Plain(s"max_${a.name}")))
      case al @ Alias(AggregateExpression(Average(a: AttributeReference, _), _, false, None, _), _)
        if mv.sumCols.contains(a.name) && al.dataType == DoubleType =>
        Some((al, AvgOf(a.name)))
      case al @ Alias(AggregateExpression(HyperLogLogPlusPlus(a: AttributeReference, _, _, _), _, false, None, _), _)
        if mv.distinctCurrent.contains(a.name) =>
        Some((al, DistinctOf(a.name)))
      case al @ Alias(AggregateExpression(Count(Seq(a: AttributeReference)), _, true, None, _), _)
        if mv.serveExactDistinct && mv.distinctCurrent.contains(a.name) =>
        Some((al, DistinctOf(a.name)))
      case al @ Alias(AggregateExpression(
          ap: ApproximatePercentile, _, false, None, _), _) =>
        (ap.children, mv) match {
          case (Seq(a: AttributeReference, Literal(p: Double, DoubleType), _), m)
            if m.quantileCurrent.contains(a.name) && p >= 0.0 && p <= 1.0 =>
            Some((al, QuantileOf(a.name, p)))
          case _ => None
        }
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) return None
    val refs = mapped.flatten

    rewriting.set(true)
    try {
      // splice the OPTIMIZED refold subtree: operator-replacement batches
      // (e.g. Deduplicate→Aggregate) have already run on the outer tree,
      // so an analyzed subtree would keep un-lowerable operators
      val needDistinct = refs.collect { case (_, DistinctOf(c)) => c }.distinct
      val needQuantile = refs.collect { case (_, QuantileOf(c, p)) => (c, p) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      val withDistinct = needDistinct.foldLeft(mv.current()) { (acc, c) =>
        acc.join(
          mv.distinctCurrent(c)().withColumnRenamed("n_distinct",
            s"n_distinct_$c"),
          mv.keyCols)
      }
      val refoldDf = needQuantile.foldLeft(withDistinct) {
        case (acc, (c, ps)) =>
          // q<pct> columns come back prefixed per source column so two
          // quantile-served columns cannot collide
          val qdf = ps.foldLeft(mv.quantileCurrent(c)(ps)) { (d, p) =>
            d.withColumnRenamed(s"q${math.round(p * 100)}",
              s"__q_${c}_${math.round(p * 100)}")
          }
          acc.join(qdf.drop("n_rows"), mv.keyCols)
      }
      val refold = refoldDf.queryExecution.optimizedPlan
      val byName = refold.output.map(a => a.name -> a).toMap
      val neededNames: Seq[String] = refs.flatMap {
        case (_, Plain(n)) => Seq(n)
        case (_, AvgOf(c)) => Seq(s"sum_$c", s"cnt_$c")
        case (_, DistinctOf(c)) => Seq(s"n_distinct_$c")
        case (_, QuantileOf(c, p)) => Seq(s"__q_${c}_${math.round(p * 100)}")
      } ++ keyPreds.flatMap(_.references.map(_.name))
      if (!neededNames.forall(byName.contains)) return None
      val projected = refs.map { case (orig, ref) =>
        val expr: Expression = ref match {
          case Plain(n) => byName(n)
          case AvgOf(c) =>
            // Catalyst Average's evaluate form: sum/ count over doubles,
            // null when the non-null count is zero (sum is null then)
            Divide(Cast(byName(s"sum_$c"), DoubleType),
              Cast(byName(s"cnt_$c"), DoubleType))
          case DistinctOf(c) => byName(s"n_distinct_$c")
          case QuantileOf(c, p) =>
            byName(s"__q_${c}_${math.round(p * 100)}")
        }
        val castExpr =
          if (expr.dataType == orig.dataType) expr
          else Cast(expr, orig.dataType)
        Alias(castExpr, orig.name)(exprId = orig.exprId)
      }
      // key-only filters re-apply over the refold (store key columns have
      // fresh exprIds — remap the predicate's attributes by name)
      val filtered = keyPreds.foldLeft(refold: LogicalPlan) { (p, pred) =>
        val remapped = pred.transform {
          case a: AttributeReference => byName(a.name)
        }
        Filter(remapped, p)
      }
      Some(Project(projected, filtered))
    } finally rewriting.set(false)
  }

  /** The aggregate-over-join hit: `fact JOIN dim GROUP BY dim attrs` is
    * answered by joining the (small) store re-fold with the dim subtree
    * and RE-AGGREGATING the partials — sums of sums, min of mins, count
    * from n_rows, avg from the two sums. Correct under any join
    * multiplicity: duplicated dim keys duplicate partial rows exactly as
    * they duplicate fact rows, and every served aggregate is
    * duplication-linear (sum/count/avg) or duplication-invariant
    * (min/max). Unmatched fact keys drop on both sides identically
    * (inner join). Distinct counts and percentiles are NOT re-mergeable
    * across keys and bail to the original plan. The 100 TB win is the
    * same as the plain hit — the fact scan + first-level shuffle never
    * run; what remains is a keys×batches-sized join against the
    * dimension. */
  private def rewriteJoin(groups: Seq[Expression],
                          aggExprs: Seq[NamedExpression],
                          mv: MvDef,
                          keyPreds: Seq[Expression],
                          dimPlan: LogicalPlan,
                          pairs: Seq[(AttributeReference, Attribute)])
      : Option[LogicalPlan] = {
    val dimOut = dimPlan.outputSet
    val groupAttrs = groups.collect { case a: AttributeReference => a }
    if (groupAttrs.size != groups.size) return None
    // every fact-side group key must be a maintained key column
    if (!groupAttrs.forall(a => dimOut.contains(a) ||
        mv.keyCols.contains(a.name))) return None

    sealed trait ReAgg
    case class PassDim(a: AttributeReference) extends ReAgg
    case class PassKey(a: AttributeReference) extends ReAgg
    case class SumStore(orig: NamedExpression, col: String) extends ReAgg
    case class MinStore(orig: NamedExpression, col: String) extends ReAgg
    case class MaxStore(orig: NamedExpression, col: String) extends ReAgg
    case class AvgStore(orig: NamedExpression, c: String) extends ReAgg

    val mapped: Seq[Option[ReAgg]] = aggExprs.map {
      case a: AttributeReference if dimOut.contains(a) => Some(PassDim(a))
      case a: AttributeReference if mv.keyCols.contains(a.name) =>
        Some(PassKey(a))
      case al @ Alias(AggregateExpression(Count(Seq(l: Literal)), _, false, None, _), _)
        if l.value != null => Some(SumStore(al, "n_rows"))
      case al @ Alias(AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _), _)
        if !dimOut.contains(a) && mv.sumCols.contains(a.name) =>
        Some(SumStore(al, s"sum_${a.name}"))
      case al @ Alias(AggregateExpression(Min(a: AttributeReference), _, false, None, _), _)
        if !dimOut.contains(a) && mv.minCols.contains(a.name) =>
        Some(MinStore(al, s"min_${a.name}"))
      case al @ Alias(AggregateExpression(Max(a: AttributeReference), _, false, None, _), _)
        if !dimOut.contains(a) && mv.maxCols.contains(a.name) =>
        Some(MaxStore(al, s"max_${a.name}"))
      case al @ Alias(AggregateExpression(Average(a: AttributeReference, _), _, false, None, _), _)
        if !dimOut.contains(a) && mv.sumCols.contains(a.name) &&
          al.dataType == DoubleType =>
        Some(AvgStore(al, a.name))
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) return None
    val refs = mapped.flatten

    rewriting.set(true)
    try {
      val refold = mv.current().queryExecution.optimizedPlan
      val byName = refold.output.map(a => a.name -> a).toMap
      val needed = pairs.map(_._1.name) ++
        groupAttrs.filterNot(dimOut.contains).map(_.name) ++
        keyPreds.flatMap(_.references.map(_.name)) ++
        refs.collect {
          case SumStore(_, c) => c
          case MinStore(_, c) => c
          case MaxStore(_, c) => c
        } ++ refs.collect { case AvgStore(_, c) =>
          Seq(s"sum_$c", s"cnt_$c") }.flatten
      if (!needed.forall(byName.contains)) return None

      val filtered = keyPreds.foldLeft(refold: LogicalPlan) { (p, pred) =>
        Filter(pred.transform { case a: AttributeReference => byName(a.name) },
          p)
      }
      val cond = pairs.map { case (fa, da) =>
        EqualTo(byName(fa.name), da): Expression
      }.reduce(org.apache.spark.sql.catalyst.expressions.And(_, _))
      val joined = Join(filtered, dimPlan,
        org.apache.spark.sql.catalyst.plans.Inner, Some(cond),
        JoinHint.NONE)

      val groupExprs: Seq[Expression] = groupAttrs.map {
        case a if dimOut.contains(a) => a
        case a => byName(a.name)
      }
      def alias(orig: NamedExpression, e: Expression): NamedExpression = {
        val cast = if (e.dataType == orig.dataType) e
          else Cast(e, orig.dataType)
        Alias(cast, orig.name)(exprId = orig.exprId)
      }
      val out: Seq[NamedExpression] = refs.map {
        case PassDim(a) => a
        case PassKey(a) => alias(a, byName(a.name))
        case SumStore(o, c) =>
          alias(o, Sum(byName(c)).toAggregateExpression())
        case MinStore(o, c) =>
          alias(o, Min(byName(c)).toAggregateExpression())
        case MaxStore(o, c) =>
          alias(o, Max(byName(c)).toAggregateExpression())
        case AvgStore(o, c) =>
          alias(o, Divide(
            Cast(Sum(byName(s"sum_$c")).toAggregateExpression(), DoubleType),
            Cast(Sum(byName(s"cnt_$c")).toAggregateExpression(), DoubleType)))
      }
      Some(Aggregate(groupExprs, out, joined))
    } finally rewriting.set(false)
  }
}
