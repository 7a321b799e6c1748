package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Materialized-aggregate rewrite: a grouped aggregate over a REGISTERED
  * source table is answered from its incrementally-maintained
  * [[graft.ops.IncrementalAgg]] store instead of re-scanning the raw
  * data — the lakehouse "materialized view hit" (Snowflake/Databricks
  * MV rewrite), wired to the store this engine already maintains with
  * batch-sized IO.
  *
  * Strictly opt-in and conservative: nothing changes unless the scan's
  * root path was registered via [[register]], the grouping keys are
  * exactly the maintained key set, every aggregate is `count(literal)`
  * or a non-distinct `sum` of a maintained column, and no filter sits
  * between the aggregate and the scan. Everything else keeps its
  * original plan. Freshness is the registrant's contract, as with any
  * MV: register the store only while its maintenance loop is wired to
  * the same ingest that feeds the raw table.
  *
  * At 100 TB the rewrite turns a full fact-table scan + shuffle into a
  * read of per-key partial rows (store size ~ keys × batches, collapsed
  * further by compaction) — the entire point of maintaining the
  * aggregate incrementally.
  */
object MaterializedAggRewrite extends Rule[LogicalPlan] {

  /** @param keyCols   maintained grouping keys (must match exactly)
    * @param sumCols   maintained sum columns
    * @param minCols   maintained min columns
    * @param maxCols   maintained max columns
    * @param current   builds the re-fold DataFrame (columns: keys ++
    *                  `n_rows` ++ `sum/min/max_<col>`) — normally
    *                  `() => IncrementalAgg.current(store, spec)` */
  final case class MvDef(keyCols: Seq[String], sumCols: Seq[String],
                         current: () => DataFrame,
                         minCols: Seq[String] = Nil,
                         maxCols: Seq[String] = Nil)

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
        sourceOf(child).flatMap { case (_, mv) =>
          rewrite(agg, groups, aggExprs, mv)
        }.getOrElse(agg)
    }
  }

  /** The registered source under the aggregate, tolerating the
    * column-pruning Project; anything else (filters, joins) → no match. */
  private def sourceOf(p: LogicalPlan): Option[(LogicalRelation, MvDef)] =
    p match {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.iterator
              .map(rp => registry.get(canon(rp.toString)))
              .collectFirst { case mv if mv != null => (lr, mv) }
          case _ => None
        }
      case Project(projList, child)
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
        sourceOf(child)
      case _ => None
    }

  private def rewrite(agg: Aggregate, groups: Seq[Expression],
                      aggExprs: Seq[NamedExpression],
                      mv: MvDef): Option[LogicalPlan] = {
    val groupAttrs = groups.collect { case a: AttributeReference => a }
    if (groupAttrs.size != groups.size) return None
    if (groupAttrs.map(_.name).toSet != mv.keyCols.toSet) return None

    // map every output column onto a store column name, or bail
    val mapped: Seq[Option[(NamedExpression, String)]] = aggExprs.map {
      case a: AttributeReference if groupAttrs.exists(_.exprId == a.exprId) =>
        Some((a, a.name))
      case al @ Alias(AggregateExpression(Count(Seq(l: Literal)), _, false, None, _), _)
        if l.value != null =>
        Some((al, "n_rows"))
      case al @ Alias(AggregateExpression(Sum(a: AttributeReference, _), _, false, None, _), _)
        if mv.sumCols.contains(a.name) =>
        Some((al, s"sum_${a.name}"))
      case al @ Alias(AggregateExpression(Min(a: AttributeReference), _, false, None, _), _)
        if mv.minCols.contains(a.name) =>
        Some((al, s"min_${a.name}"))
      case al @ Alias(AggregateExpression(Max(a: AttributeReference), _, false, None, _), _)
        if mv.maxCols.contains(a.name) =>
        Some((al, s"max_${a.name}"))
      case _ => None
    }
    if (mapped.exists(_.isEmpty)) return None

    rewriting.set(true)
    try {
      // splice the OPTIMIZED refold subtree: operator-replacement batches
      // (e.g. Deduplicate→Aggregate) have already run on the outer tree,
      // so an analyzed subtree would keep un-lowerable operators
      val refold = mv.current().queryExecution.optimizedPlan
      val byName = refold.output.map(a => a.name -> a).toMap
      if (!mapped.flatten.forall { case (_, n) => byName.contains(n) })
        return None
      val projected = mapped.flatten.map { case (orig, storeName) =>
        val src = byName(storeName)
        val expr: Expression =
          if (src.dataType == orig.dataType) src
          else Cast(src, orig.dataType)
        Alias(expr, orig.name)(exprId = orig.exprId)
      }
      Some(Project(projected, refold))
    } finally rewriting.set(false)
  }
}
