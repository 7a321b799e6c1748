package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  ApproximatePercentile, Average, Count, HyperLogLogPlusPlus, Max, Min,
  Percentile, PercentileDisc, Sum}
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
    *                  differ (Spark's GK summaries vs the store's KLL)
    * @param discQuantileCurrent per-column EXACT discrete-quantile
    *                  providers — normally a [[graft.ops.MinMaxAgg]]
    *                  value-multiset (`ps => MinMaxAgg.quantilesDisc(
    *                  store, spec, ps)` with its labels renamed). The
    *                  returned frame must carry keys ++ one column per
    *                  requested probability named `__qd_<ppm>` (micro-
    *                  units, `math.round(p·1e6)`). `percentile_disc(p)
    *                  WITHIN GROUP (ORDER BY col)` with a literal `p`
    *                  is answered from it — EXACT on both sides, the
    *                  serve the retractable value-multiset state exists
    *                  for
    * @param contQuantileCurrent per-column EXACT interpolated-quantile
    *                  providers — normally the same [[graft.ops.MinMaxAgg]]
    *                  value-multiset via `quantilesCont` (the state
    *                  already holds the two rank-adjacent values an
    *                  interpolation needs). The returned frame must
    *                  carry keys ++ one DOUBLE column per requested
    *                  probability named `__qc_<ppm>`. `percentile_cont(p)
    *                  WITHIN GROUP (ORDER BY col)` with a literal `p`
    *                  (seen post-analysis as Catalyst `Percentile`) is
    *                  answered from it — bit-identical on both sides
    *                  (the provider uses Percentile's exact weighted
    *                  interpolation form)
    * @param countRowsExact whether `n_rows` counts EVERY source row.
    *                  A [[graft.ops.MinMaxAgg]]-backed registration
    *                  counts only non-null value rows, so it must set
    *                  false and decline `count(*)` (falling back to the
    *                  next serve level) rather than undercount.
    *                  Likewise min/max/percentile served from such a
    *                  store OMIT groups whose every value is null —
    *                  register extrema serving only for effectively
    *                  non-null value columns (the registrant contract) */
  final case class MvDef(keyCols: Seq[String], sumCols: Seq[String],
                         current: () => DataFrame,
                         minCols: Seq[String] = Nil,
                         maxCols: Seq[String] = Nil,
                         distinctCurrent: Map[String, () => DataFrame] =
                           Map.empty,
                         serveExactDistinct: Boolean = false,
                         quantileCurrent: Map[String, Seq[Double] => DataFrame] =
                           Map.empty,
                         discQuantileCurrent: Map[String, Seq[Double] => DataFrame] =
                           Map.empty,
                         contQuantileCurrent: Map[String, Seq[Double] => DataFrame] =
                           Map.empty,
                         countRowsExact: Boolean = true,
                         fresh: () => Boolean = () => true)

  /** How one output column maps onto the store. */
  private sealed trait StoreRef
  private final case class Plain(name: String) extends StoreRef
  private final case class AvgOf(c: String) extends StoreRef
  private final case class DistinctOf(c: String) extends StoreRef
  private final case class QuantileOf(c: String, p: Double) extends StoreRef
  private final case class DiscQuantileOf(c: String, p: Double) extends StoreRef
  private final case class ContQuantileOf(c: String, p: Double) extends StoreRef

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

  /** Register only when the source is unclaimed — the restore path's
    * form: a live writer's registration (and its own `fresh` guard)
    * must never be clobbered by a catalog replay. Returns true when
    * THIS call installed `mv`. */
  def registerIfAbsent(sourcePath: String, mv: MvDef): Boolean =
    registry.putIfAbsent(canon(sourcePath), mv) == null

  def deregister(sourcePath: String): Unit = registry.remove(canon(sourcePath))

  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty || rewriting.get()) plan
    else plan.transformUp {
      case agg @ Aggregate(groups, aggExprs, child, _) =>
        // a registration's fresh() is its staleness guard (a restored
        // serve whose raw source ran ahead declines to the raw plan)
        sourceOf(child).flatMap { case (_, mv, preds) =>
          if (!mv.fresh()) None
          else rewriteWithMv(groups, aggExprs, mv, preds)
        }.orElse {
          joinSourceOf(child).flatMap { case (mv, preds, dimPlan, pairs) =>
            if (!mv.fresh()) None
            else rewriteJoin(groups, aggExprs, mv, preds, dimPlan, pairs)
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

  /** Classify one aggregate FUNCTION call against the store. Top-level
    * shape (plain alias vs an expression COMPUTED over aggregates, e.g.
    * `floor(sum(x) + 0.5)` after CollapseProject folds a select into the
    * Aggregate) is handled by the recursive rebuild, not here. */
  private def toStoreRef(ae: AggregateExpression, mv: MvDef): Option[StoreRef] =
    ae match {
      case AggregateExpression(Count(Seq(l: Literal)), _, false, None, _)
        if l.value != null && mv.countRowsExact => Some(Plain("n_rows"))
      case AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _)
        if mv.sumCols.contains(a.name) => Some(Plain(s"sum_${a.name}"))
      case AggregateExpression(Min(a: AttributeReference), _, false, None, _)
        if mv.minCols.contains(a.name) => Some(Plain(s"min_${a.name}"))
      case AggregateExpression(Max(a: AttributeReference), _, false, None, _)
        if mv.maxCols.contains(a.name) => Some(Plain(s"max_${a.name}"))
      case AggregateExpression(Average(a: AttributeReference, _), _, false, None, _)
        if mv.sumCols.contains(a.name) && ae.dataType == DoubleType =>
        Some(AvgOf(a.name))
      case AggregateExpression(HyperLogLogPlusPlus(a: AttributeReference, _, _, _), _, false, None, _)
        if mv.distinctCurrent.contains(a.name) => Some(DistinctOf(a.name))
      case AggregateExpression(Count(Seq(a: AttributeReference)), _, true, None, _)
        if mv.serveExactDistinct && mv.distinctCurrent.contains(a.name) =>
        Some(DistinctOf(a.name))
      case AggregateExpression(ap: ApproximatePercentile, _, false, None, _) =>
        ap.children match {
          case Seq(a: AttributeReference, Literal(p: Double, DoubleType), _)
            if mv.quantileCurrent.contains(a.name) && p >= 0.0 && p <= 1.0 =>
            Some(QuantileOf(a.name, p))
          case _ => None
        }
      case AggregateExpression(pd: PercentileDisc, _, false, None, _)
        if !pd.reverse =>
        (pd.child, pd.percentageExpression) match {
          case (a: AttributeReference, Literal(p: Double, DoubleType))
            if mv.discQuantileCurrent.contains(a.name) &&
              p >= 0.0 && p <= 1.0 =>
            Some(DiscQuantileOf(a.name, p))
          case _ => None
        }
      // percentile_cont(p) WITHIN GROUP (ORDER BY c): analysis replaces
      // the RuntimeReplaceable PercentileCont with Percentile before any
      // optimizer rule runs, so this is the shape the rewrite sees
      case AggregateExpression(pc: Percentile, _, false, None, _)
        if !pc.reverse =>
        (pc.child, pc.percentageExpression, pc.frequencyExpression) match {
          case (a: AttributeReference, Literal(p: Double, DoubleType),
                Literal(1L, _))
            if mv.contQuantileCurrent.contains(a.name) &&
              p >= 0.0 && p <= 1.0 =>
            Some(ContQuantileOf(a.name, p))
          case _ => None
        }
      case _ => None
    }

  /** The single-table MV hit, also callable with a caller-supplied
    * MvDef: [[MaterializedJoinRewrite]] delegates here when a
    * registered join carries a CHAINED downstream aggregate
    * ([[graft.ops.ChainedIvm]]) whose partials can answer the query
    * even more cheaply than the join-state multiset. `keyPreds` must
    * reference maintained KEY columns only (they re-apply over the
    * refold); callers enforce that before delegating. */
  private[plans] def rewriteWithMv(groups: Seq[Expression],
                                   aggExprs: Seq[NamedExpression],
                                   mv: MvDef,
                                   keyPreds: Seq[Expression])
      : Option[LogicalPlan] = {
    val groupAttrs = groups.collect { case a: AttributeReference => a }
    if (groupAttrs.size != groups.size) return None
    if (groupAttrs.map(_.name).toSet != mv.keyCols.toSet) return None

    // phase 1: every aggregate call maps onto the store; every attribute
    // outside an aggregate is a grouping key — else bail. Composite
    // expressions over aggregates (post-CollapseProject shapes) are fine.
    val aggRefs = scala.collection.mutable.LinkedHashMap[ExprId, StoreRef]()
    def scanOk(e: Expression): Boolean = e match {
      case ae: AggregateExpression =>
        toStoreRef(ae, mv) match {
          case Some(r) => aggRefs(ae.resultId) = r; true
          case None => false
        }
      case a: AttributeReference =>
        groupAttrs.exists(_.exprId == a.exprId)
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
      // splice the OPTIMIZED refold subtree: operator-replacement batches
      // (e.g. Deduplicate→Aggregate) have already run on the outer tree,
      // so an analyzed subtree would keep un-lowerable operators
      val needDistinct = refs.collect { case DistinctOf(c) => c }.distinct
      val needQuantile = refs.collect { case QuantileOf(c, p) => (c, p) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      val withDistinct = needDistinct.foldLeft(mv.current()) { (acc, c) =>
        acc.join(
          mv.distinctCurrent(c)().withColumnRenamed("n_distinct",
            s"n_distinct_$c"),
          mv.keyCols)
      }
      val withQuantile = needQuantile.foldLeft(withDistinct) {
        case (acc, (c, ps)) =>
          // q<pct> columns come back prefixed per source column so two
          // quantile-served columns cannot collide
          val qdf = ps.foldLeft(mv.quantileCurrent(c)(ps)) { (d, p) =>
            d.withColumnRenamed(s"q${math.round(p * 100)}",
              s"__q_${c}_${math.round(p * 100)}")
          }
          acc.join(qdf.drop("n_rows"), mv.keyCols)
      }
      val needDisc = refs.collect { case DiscQuantileOf(c, p) => (c, p) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      val withDisc = needDisc.foldLeft(withQuantile) {
        case (acc, (c, ps)) =>
          // provider contract: columns named __qd_<ppm>; re-prefix per
          // source column so two disc-served columns cannot collide
          val qdf = ps.foldLeft(mv.discQuantileCurrent(c)(ps)) { (d, p) =>
            d.withColumnRenamed(s"__qd_${math.round(p * 1e6)}",
              s"__qd_${c}_${math.round(p * 1e6)}")
          }
          acc.join(qdf.drop("n_rows"), mv.keyCols)
      }
      val needCont = refs.collect { case ContQuantileOf(c, p) => (c, p) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      val refoldDf = needCont.foldLeft(withDisc) {
        case (acc, (c, ps)) =>
          // provider contract: columns named __qc_<ppm>, double
          val qdf = ps.foldLeft(mv.contQuantileCurrent(c)(ps)) { (d, p) =>
            d.withColumnRenamed(s"__qc_${math.round(p * 1e6)}",
              s"__qc_${c}_${math.round(p * 1e6)}")
          }
          acc.join(qdf.drop("n_rows"), mv.keyCols)
      }
      val refold = refoldDf.queryExecution.optimizedPlan
      val byName = refold.output.map(a => a.name -> a).toMap
      val neededNames: Seq[String] = refs.flatMap {
        case Plain(n) => Seq(n)
        case AvgOf(c) => Seq(s"sum_$c", s"cnt_$c")
        case DistinctOf(c) => Seq(s"n_distinct_$c")
        case QuantileOf(c, p) => Seq(s"__q_${c}_${math.round(p * 100)}")
        case DiscQuantileOf(c, p) => Seq(s"__qd_${c}_${math.round(p * 1e6)}")
        case ContQuantileOf(c, p) => Seq(s"__qc_${c}_${math.round(p * 1e6)}")
      } ++ groupAttrs.map(_.name) ++
        keyPreds.flatMap(_.references.map(_.name))
      if (!neededNames.forall(byName.contains)) return None

      // phase 2: rebuild each output expression over the store columns
      def build(e: Expression): Expression = e match {
        case ae: AggregateExpression =>
          val raw: Expression = aggRefs(ae.resultId) match {
            case Plain(n) => byName(n)
            case AvgOf(c) =>
              // Catalyst Average's evaluate form: sum / count over
              // doubles, null when the non-null count is zero
              Divide(Cast(byName(s"sum_$c"), DoubleType),
                Cast(byName(s"cnt_$c"), DoubleType))
            case DistinctOf(c) => byName(s"n_distinct_$c")
            case QuantileOf(c, p) =>
              byName(s"__q_${c}_${math.round(p * 100)}")
            case DiscQuantileOf(c, p) =>
              byName(s"__qd_${c}_${math.round(p * 1e6)}")
            case ContQuantileOf(c, p) =>
              byName(s"__qc_${c}_${math.round(p * 1e6)}")
          }
          if (raw.dataType == ae.dataType) raw else Cast(raw, ae.dataType)
        case a: AttributeReference => byName(a.name)
        case other => other.withNewChildren(other.children.map(build))
      }
      val projected: Seq[NamedExpression] = aggExprs.map {
        case a: AttributeReference =>
          Alias(byName(a.name), a.name)(exprId = a.exprId)
        case al: Alias =>
          Alias(build(al.child), al.name)(exprId = al.exprId)
        case other => return None // unreachable given shapeOk
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

    // phase 1: every aggregate call must be re-aggregatable from store
    // partials (distinct/percentile are not mergeable across keys and
    // bail); attributes outside aggregates must be dim attrs or fact
    // keys. Composite expressions over aggregates are fine.
    sealed trait ReAgg
    case object CountRows extends ReAgg
    case class SumStore(col: String) extends ReAgg
    case class MinStore(col: String) extends ReAgg
    case class MaxStore(col: String) extends ReAgg
    case class AvgStore(c: String) extends ReAgg
    val aggRefs = scala.collection.mutable.LinkedHashMap[ExprId, ReAgg]()
    def toRe(ae: AggregateExpression): Option[ReAgg] = ae match {
      case AggregateExpression(Count(Seq(l: Literal)), _, false, None, _)
        if l.value != null => Some(CountRows)
      case AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _)
        if !dimOut.contains(a) && mv.sumCols.contains(a.name) =>
        Some(SumStore(s"sum_${a.name}"))
      case AggregateExpression(Min(a: AttributeReference), _, false, None, _)
        if !dimOut.contains(a) && mv.minCols.contains(a.name) =>
        Some(MinStore(s"min_${a.name}"))
      case AggregateExpression(Max(a: AttributeReference), _, false, None, _)
        if !dimOut.contains(a) && mv.maxCols.contains(a.name) =>
        Some(MaxStore(s"max_${a.name}"))
      case AggregateExpression(Average(a: AttributeReference, _), _, false, None, _)
        if !dimOut.contains(a) && mv.sumCols.contains(a.name) &&
          ae.dataType == DoubleType =>
        Some(AvgStore(a.name))
      case _ => None
    }
    def scanOk(e: Expression): Boolean = e match {
      case ae: AggregateExpression =>
        toRe(ae) match {
          case Some(r) => aggRefs(ae.resultId) = r; true
          case None => false
        }
      case a: AttributeReference =>
        dimOut.contains(a) || mv.keyCols.contains(a.name)
      case other => other.children.forall(scanOk)
    }
    val shapeOk = aggExprs.forall {
      case a: AttributeReference =>
        dimOut.contains(a) || mv.keyCols.contains(a.name)
      case al: Alias => scanOk(al.child)
      case _ => false
    }
    if (!shapeOk) return None
    val refs = aggRefs.values.toSeq

    rewriting.set(true)
    try {
      val refold = mv.current().queryExecution.optimizedPlan
      val byName = refold.output.map(a => a.name -> a).toMap
      val needed = pairs.map(_._1.name) ++
        groupAttrs.filterNot(dimOut.contains).map(_.name) ++
        keyPreds.flatMap(_.references.map(_.name)) ++
        refs.flatMap {
          case CountRows => Seq("n_rows")
          case SumStore(c) => Seq(c)
          case MinStore(c) => Seq(c)
          case MaxStore(c) => Seq(c)
          case AvgStore(c) => Seq(s"sum_$c", s"cnt_$c")
        }
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
      // phase 2: rebuild each output, replacing aggregate calls with the
      // re-aggregation over store partials
      def build(e: Expression): Expression = e match {
        case ae: AggregateExpression =>
          val raw: Expression = aggRefs(ae.resultId) match {
            case CountRows =>
              Sum(byName("n_rows")).toAggregateExpression()
            case SumStore(c) => Sum(byName(c)).toAggregateExpression()
            case MinStore(c) => Min(byName(c)).toAggregateExpression()
            case MaxStore(c) => Max(byName(c)).toAggregateExpression()
            case AvgStore(c) => Divide(
              Cast(Sum(byName(s"sum_$c")).toAggregateExpression(),
                DoubleType),
              Cast(Sum(byName(s"cnt_$c")).toAggregateExpression(),
                DoubleType))
          }
          if (raw.dataType == ae.dataType) raw else Cast(raw, ae.dataType)
        case a: AttributeReference if dimOut.contains(a) => a
        case a: AttributeReference => byName(a.name)
        case other => other.withNewChildren(other.children.map(build))
      }
      val out: Seq[NamedExpression] = aggExprs.map {
        case a: AttributeReference if dimOut.contains(a) => a
        case a: AttributeReference =>
          Alias(byName(a.name), a.name)(exprId = a.exprId)
        case al: Alias => Alias(build(al.child), al.name)(exprId = al.exprId)
        case other => return None // unreachable given shapeOk
      }
      Some(Aggregate(groupExprs, out, joined))
    } finally rewriting.set(false)
  }
}
