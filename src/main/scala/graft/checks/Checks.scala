package graft.checks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the engine-native form of dbt schema
  * tests (reference `dbt/promptly/models/curated/schema.yaml:10-37`,
  * SURVEY.md §2.8) plus the Elementary-style per-run metrics (T4).
  *
  * Each check compiles to a DataFrame aggregation/anti-join; `runAll`
  * fuses all single-pass checks (not_null, accepted_values, row_count,
  * freshness) into ONE aggregation job so a table of any size is scanned
  * once, and runs the grouped/join checks (unique, relationships) as
  * separate single-shuffle jobs. Violation counts, not violation rows, come
  * back to the driver — nothing here collects data proportional to input.
  */
object Checks {

  sealed trait Severity
  case object Error extends Severity
  case object Warn extends Severity

  final case class CheckResult(
      check: String, column: String, violations: Long,
      severity: Severity, passed: Boolean, detail: String = "")

  sealed trait Check { def severity: Severity }
  /** dbt `unique` (T1): no key group with count > 1. */
  final case class Unique(cols: Seq[String], severity: Severity = Error) extends Check
  /** dbt `not_null` (T2). */
  final case class NotNull(col: String, severity: Severity = Error) extends Check
  /** dbt `accepted_values`. */
  final case class AcceptedValues(col: String, values: Seq[String],
                                  severity: Severity = Error) extends Check
  /** dbt `relationships` (T3): every non-NULL FK exists in the parent.
    * NULL FKs pass, per dbt semantics. */
  final case class Relationships(col: String, parent: DataFrame, parentCol: String,
                                 severity: Severity = Error) extends Check
  /** dbt `expression_is_true` analog: every row must satisfy the
    * predicate (NULL predicate counts as a violation). Fused into the
    * single-pass aggregation. */
  final case class Expression(name: String, predicate: org.apache.spark.sql.Column,
                              severity: Severity = Error) extends Check
  /** dbt singular-test analog: arbitrary logic returning a violation
    * count. Runs as its own job — use for checks that genuinely need
    * joins/subqueries beyond the declarative forms. */
  final case class CustomCheck(name: String, violations: DataFrame => Long,
                               severity: Severity = Error) extends Check
  /** Elementary-style volume monitor: row count within bounds. */
  final case class RowCountBetween(min: Long, max: Long = Long.MaxValue,
                                   severity: Severity = Warn) extends Check
  /** Elementary-style freshness monitor: max(tsCol) within maxAgeMs of now.
    * Column type decides the epoch unit: TimestampType casts to seconds
    * (×1000), Date to days (×86_400_000), integral columns are taken as
    * epoch-MILLIS verbatim (the CDC path's `cdc_ts_ms` convention). */
  final case class Freshness(col: String, maxAgeMs: Long,
                             severity: Severity = Warn) extends Check

  def runAll(df: DataFrame, checks: Seq[Check]): Seq[CheckResult] =
    runAllWithCount(df, checks)._1

  /** [[runAll]] plus the table's row count, read from the SAME fused
    * aggregation — callers that also want volume metrics (the pipeline's
    * per-stage Elementary feed) get them for zero extra passes instead
    * of re-scanning the published table. */
  def runAllWithCount(df: DataFrame, checks: Seq[Check]): (Seq[CheckResult], Long) = {
    // --- fuse every single-pass check into one aggregation over one scan
    val aggExprs = checks.flatMap {
      case NotNull(c, _) =>
        Some(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"))
      case AcceptedValues(c, vs, _) =>
        Some(sum(when(col(c).isNotNull && !col(c).isin(vs: _*), 1L).otherwise(0L))
          .as(s"av_$c"))
      case RowCountBetween(_, _, _) => None // count(*) added below
      case Freshness(c, _, _) => Some(max(col(c)).cast("long").as(s"fr_$c"))
      case Expression(n, pred, _) =>
        Some(sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"ex_$n"))
      case _ => None
    } :+ count(lit(1)).as("__n")
    val row: Row = df.agg(aggExprs.head, aggExprs.tail: _*).collect()(0)
    val nRows = row.getAs[Long]("__n")

    val results = checks.map {
      case Unique(cols, sev) =>
        val v = df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
          .filter(col("n") > 1).count()
        CheckResult("unique", cols.mkString(","), v, sev, v == 0)
      case NotNull(c, sev) =>
        val v = row.getAs[Long](s"nn_$c")
        CheckResult("not_null", c, v, sev, v == 0)
      case AcceptedValues(c, vs, sev) =>
        val v = row.getAs[Long](s"av_$c")
        CheckResult("accepted_values", c, v, sev, v == 0,
          detail = s"allowed=${vs.mkString("|")}")
      case Relationships(c, parent, pc, sev) =>
        val v = df.select(col(c)).filter(col(c).isNotNull)
          .join(parent.select(col(pc).as(c)), Seq(c), "left_anti").count()
        CheckResult("relationships", c, v, sev, v == 0, detail = s"parent=$pc")
      case Expression(n, _, sev) =>
        val v = row.getAs[Long](s"ex_$n")
        CheckResult("expression", n, v, sev, v == 0)
      case CustomCheck(n, fn, sev) =>
        val v = fn(df)
        CheckResult("custom", n, v, sev, v == 0)
      case RowCountBetween(mn, mx, sev) =>
        val ok = nRows >= mn && nRows <= mx
        CheckResult("row_count", "*", if (ok) 0 else 1, sev, ok,
          detail = s"rows=$nRows bounds=[$mn,$mx]")
      case Freshness(c, maxAge, sev) =>
        import org.apache.spark.sql.types._
        val toMillis: Long => Long = df.schema(c).dataType match {
          case TimestampType | TimestampNTZType => _ * 1000L // cast = epoch-secs
          case DateType => _ * 86400000L // cast = epoch-days
          case _ => identity // integral column: already epoch-millis (cdc_ts_ms)
        }
        val maxTs = if (row.isNullAt(row.fieldIndex(s"fr_$c"))) 0L
          else toMillis(row.getAs[Long](s"fr_$c"))
        val age = System.currentTimeMillis() - maxTs
        val ok = age <= maxAge
        CheckResult("freshness", c, if (ok) 0 else 1, sev, ok,
          detail = s"ageMs=$age max=$maxAge")
    }
    (results, nRows)
  }

  def errorsOnly(rs: Seq[CheckResult]): Seq[CheckResult] =
    rs.filter(r => !r.passed && r.severity == Error)

  /** Row-level quarantine split — the dbt `store_failures` / WAP-
    * quarantine analog at row granularity: returns (clean, quarantined)
    * where quarantined rows carry a `__violations` array naming every
    * row-level check they fail, in `checks` order. Only row-attributable
    * checks participate (not_null, accepted_values, expression, unique,
    * relationships); table-level checks (row_count, freshness, custom)
    * have no per-row meaning — run them via [[runAll]].
    *
    * Scale shape: the scalar checks are pure projections fused into the
    * scan (one pass, no extra shuffle); unique adds one hash-partitioned
    * window count over its key and relationships one left join against
    * the distinct parent keys (broadcast when small — Catalyst's
    * choice). The split is two filters over the same annotated plan;
    * persist the input if recomputation matters. */
  def split(df: DataFrame, checks: Seq[Check]): (DataFrame, DataFrame) = {
    var cur = df
    val flags = scala.collection.mutable.Buffer[Column]()
    checks.zipWithIndex.foreach { case (chk, i) =>
      chk match {
        case NotNull(c, _) =>
          flags += when(col(c).isNull, lit(s"not_null:$c"))
        case AcceptedValues(c, vs, _) =>
          flags += when(col(c).isNotNull && !col(c).isin(vs: _*),
            lit(s"accepted_values:$c"))
        case Expression(n, pred, _) =>
          flags += when(!coalesce(pred, lit(false)), lit(s"expression:$n"))
        case Unique(cols_, _) =>
          val cnt = s"__uniq_n_$i"
          cur = cur.withColumn(cnt, count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(cols_.map(col): _*)))
          flags += when(col(cnt) > 1, lit(s"unique:${cols_.mkString(",")}"))
        case Relationships(c, parent, pc, _) =>
          val hit = s"__rel_hit_$i"
          cur = cur.join(
            parent.select(col(pc).as(c)).distinct()
              .withColumn(hit, lit(true)),
            Seq(c), "left")
          flags += when(col(c).isNotNull && col(hit).isNull,
            lit(s"relationships:$c"))
        case _ => () // table-level: no per-row meaning
      }
    }
    if (flags.isEmpty)
      return (df, df.limit(0)
        .withColumn("__violations", array().cast("array<string>")))
    val annotated = cur
      .withColumn("__violations", array_compact(array(flags.toSeq: _*)))
    // the relationships join moves its key to the front: restore the
    // caller's column order (also drops the helper columns)
    val orig = df.columns.toSeq
    (annotated.filter(size(col("__violations")) === 0)
        .select(orig.map(col): _*),
      annotated.filter(size(col("__violations")) > 0)
        .select((orig :+ "__violations").map(col): _*))
  }

  /** Per-run metrics table (Elementary T4 analog): one row of volume /
    * null-rate / freshness numbers for the run report. */
  def metrics(df: DataFrame, notNullCols: Seq[String], tsCol: Option[String]): DataFrame = {
    val aggs = Seq(count(lit(1)).as("row_count")) ++
      notNullCols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c")) ++
      tsCol.map(c => max(col(c)).as(s"max_$c")).toSeq
    df.agg(aggs.head, aggs.tail: _*)
  }
}
