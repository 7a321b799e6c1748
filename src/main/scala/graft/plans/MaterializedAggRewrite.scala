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
        }.getOrElse(agg)
    }
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
}
