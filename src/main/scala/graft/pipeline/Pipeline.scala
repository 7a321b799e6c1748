package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.checks.Checks
import graft.checks.Checks.{Check, CheckResult}
import graft.sinks.SnapshotTable

/** Dependency-ordered model pipeline — the engine-native form of the
  * reference's dbt model graph + `app.py` sequential runner + Airflow DAG
  * declaration (SURVEY.md §2.10 O1-O3, §3.1).
  *
  * A `Stage` is a named model: it builds a DataFrame from the session plus
  * previously materialized stages (`ref()`-style), optionally writes it to
  * a [[SnapshotTable]] (Write-Audit-Publish: checks run against the STAGED
  * snapshot and only a clean audit publishes — reference README.md:62), and
  * carries dbt-style tags for graph selection (`tag:raw+` = tagged nodes
  * and all descendants, the reference's `--exclude tag:raw+`).
  *
  * Execution is sequential fail-fast like `app.py:61-64`; each stage's own
  * Spark job graph is where the parallelism lives, so a driver-side loop
  * adds no scale penalty — 1000 executors stay busy inside each stage.
  */
final case class Stage(
    name: String,
    deps: Seq[String] = Nil,
    tags: Set[String] = Set.empty,
    build: (SparkSession, Map[String, DataFrame]) => DataFrame,
    checks: Seq[Check] = Nil,
    sink: Option[Sink] = None,
    quarantine: Option[Quarantine] = None,
    /** Re-attempts on build/write exceptions (transient executor loss,
      * object-store 503s). Check FAILURES are never retried — a data
      * quality violation is deterministic, retrying it just burns cluster
      * time. */
    retries: Int = 0)

/** Row-level quarantine for a stage (dbt store_failures / the CSV
  * parse-quarantine generalized to semantic checks): rows failing any of
  * `checks` are diverted — annotated with their violation reasons, the
  * stage name and run wall-clock — into `table` (snapshot-versioned per
  * run), and only the CLEAN rows continue to the stage's checks + sink.
  * Use for checks where a few bad rows should not fail the whole batch;
  * keep hard invariants in `Stage.checks`, which still gate publication.
  * Costs one extra pass over the stage output (the split + reject write). */
final case class Quarantine(table: SnapshotTable, checks: Seq[Check])

sealed trait Sink
/** Full-snapshot write with WAP audit. */
final case class Overwrite(table: SnapshotTable, partitionBy: Seq[String] = Nil) extends Sink
/** Merge-upsert by key (reference K3 `incremental_strategy='merge'`). */
final case class Merge(table: SnapshotTable, keys: Seq[String],
                       orderCols: Seq[Column], partitionBy: Seq[String] = Nil) extends Sink
/** Partition replacement (dbt `incremental_strategy='insert_overwrite'`):
  * the batch's partitions replace the table's same partitions IN PLACE
  * (dynamic partition overwrite, no key matching) — bounded rewrite IO,
  * no snapshot history. Because there is no staged snapshot, checks audit
  * the BATCH before the write (audit-then-write rather than WAP); a
  * failed Error check leaves every partition untouched. */
final case class InsertOverwrite(table: SnapshotTable, partitionCol: String) extends Sink
/** SCD Type-2 snapshotting (dbt `snapshots` with the `check` strategy):
  * each run closes the open interval of every key whose tracked
  * attributes changed and opens a new one; closed intervals are
  * immutable. `attrCols` empty = track all non-key, non-`validFrom`
  * columns (dbt `check_cols='all'` — use an explicit list when rows
  * carry per-event ids, or every event opens an interval). Change
  * detection runs over CURRENT OPEN ROWS ∪ BATCH only — one key-shuffle
  * of batch-sized data, never a rescan of interval history. WAP applies:
  * the new snapshot stages, checks audit it, a clean audit publishes. */
final case class Scd2(table: SnapshotTable, keys: Seq[String],
                      orderCols: Seq[Column], attrCols: Seq[String],
                      validFrom: String, partitionBy: Seq[String] = Nil) extends Sink

final case class StageResult(
    name: String, ok: Boolean, checks: Seq[CheckResult],
    publishedVersion: Option[Long], durationMs: Long, error: Option[String],
    quarantined: Long = 0L)

final case class PipelineResult(stages: Seq[StageResult]) {
  def ok: Boolean = stages.forall(_.ok)

  /** Run report (the Elementary report analog, SURVEY.md §2.8 T4):
    * machine-readable JSON with per-stage status, timings, check outcomes
    * and violation counts. */
  def toJson: String = {
    def q(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val stagesJson = stages.map { st =>
      val checksJson = st.checks.map { c =>
        s"""{"check":${q(c.check)},"column":${q(c.column)},"passed":${c.passed},""" +
          s""""violations":${c.violations},"severity":${q(c.severity.toString)}}"""
      }.mkString("[", ",", "]")
      s"""{"name":${q(st.name)},"ok":${st.ok},"durationMs":${st.durationMs},""" +
        s""""publishedVersion":${st.publishedVersion.getOrElse(-1L)},""" +
        s""""quarantined":${st.quarantined},""" +
        s""""checks":$checksJson${st.error.map(e => s""","error":${q(e)}""").getOrElse("")}}"""
    }.mkString("[", ",", "]")
    s"""{"ok":$ok,"stages":$stagesJson}"""
  }

  def writeReport(path: String): Unit = {
    val pp = java.nio.file.Paths.get(path)
    Option(pp.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(pp, toJson)
  }

  /** Human-readable run report (the Elementary HTML report analog the
    * reference exports and asserts on — `app.py:52-58`,
    * `test_dbt.py:172-177`): self-contained HTML, per-stage status,
    * timings, and check outcomes with violation counts. */
  def toHtml: String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val rows = stages.map { st =>
      val checksHtml =
        if (st.checks.isEmpty) "&mdash;"
        else st.checks.map { c =>
          val cls = if (c.passed) "pass" else "fail"
          s"""<span class="$cls">${esc(c.check)}(${esc(c.column)})""" +
            (if (c.passed) "" else s" &times;${c.violations}") + "</span>"
        }.mkString(" ")
      val cls = if (st.ok) "pass" else "fail"
      s"""<tr><td>${esc(st.name)}</td><td class="$cls">${
        if (st.ok) "ok" else "FAILED"}</td>""" +
        s"<td>${st.durationMs} ms</td><td>${
          st.publishedVersion.map(_.toString).getOrElse("&mdash;")}</td>" +
        s"<td>$checksHtml</td><td>${st.error.map(esc).getOrElse("")}</td></tr>"
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>graft run report</title>
       |<style>
       |body{font-family:sans-serif;margin:2em}
       |table{border-collapse:collapse}
       |td,th{border:1px solid #ccc;padding:4px 10px;text-align:left}
       |.pass{color:#0a7d33}.fail{color:#b00020;font-weight:bold}
       |</style></head><body>
       |<h1>Pipeline run: <span class="${if (ok) "pass" else "fail"}">${
        if (ok) "SUCCESS" else "FAILED"}</span></h1>
       |<table>
       |<tr><th>stage</th><th>status</th><th>duration</th>
       |<th>published</th><th>checks</th><th>error</th></tr>
       |$rows
       |</table></body></html>""".stripMargin
  }

  def writeReportHtml(path: String): Unit = {
    val pp = java.nio.file.Paths.get(path)
    Option(pp.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(pp, toHtml)
  }
}

class Pipeline(val stages: Seq[Stage],
               metrics: Option[graft.checks.MetricsStore] = None,
               runId: String = java.util.UUID.randomUUID().toString.take(8),
               alerts: Option[graft.checks.Alerts.AlertManager] = None) {
  private val byName = stages.map(s => s.name -> s).toMap

  /** Attach a metrics store: every materialized stage records its volume
    * row after a successful run (the Elementary history feed, T4). */
  def withMetrics(store: graft.checks.MetricsStore, runId: String): Pipeline =
    new Pipeline(stages, Some(store), runId, alerts)

  /** Attach an alert manager: every stage's check results route through
    * it (subjects scoped `stage:column` so identical column names in
    * different stages alert independently) — the reference's
    * Elementary→Slack hook, edge-triggered with suppression
    * ([[graft.checks.Alerts.AlertManager]]). Reuse ONE manager across
    * scheduled runs so a persistently failing check pages once. */
  def withAlerts(mgr: graft.checks.Alerts.AlertManager): Pipeline =
    new Pipeline(stages, metrics, runId, Some(mgr))
  require(byName.size == stages.size, "duplicate stage names")
  stages.foreach(s => s.deps.foreach(d =>
    require(byName.contains(d), s"stage ${s.name} depends on unknown $d")))

  /** Topological order (stable: input order among ready nodes). */
  lazy val ordered: Seq[Stage] = {
    val done = scala.collection.mutable.LinkedHashSet[String]()
    var frontier = true
    while (frontier) {
      frontier = false
      stages.foreach { s =>
        if (!done.contains(s.name) && s.deps.forall(done.contains)) {
          done += s.name; frontier = true
        }
      }
    }
    require(done.size == stages.size,
      s"dependency cycle among: ${stages.map(_.name).filterNot(done.contains).mkString(",")}")
    done.toSeq.map(byName)
  }

  private lazy val children: Map[String, Seq[String]] =
    stages.flatMap(s => s.deps.map(_ -> s.name)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }

  private def descendants(roots: Set[String]): Set[String] = {
    val seen = scala.collection.mutable.Set[String](roots.toSeq: _*)
    var frontier = roots.toSeq
    while (frontier.nonEmpty) {
      frontier = frontier.flatMap(n => children.getOrElse(n, Nil)).filterNot(seen)
      seen ++= frontier
    }
    seen.toSet
  }

  /** dbt-style selector: `name`, `name+`, `tag:t`, `tag:t+` (`+` = include
    * descendants). Matches reference `--select elementary` /
    * `--exclude tag:raw+` (`app.py:35-44`). */
  private def resolve(selector: String): Set[String] = {
    val plus = selector.endsWith("+")
    val base = if (plus) selector.dropRight(1) else selector
    val roots: Set[String] =
      if (base.startsWith("tag:")) {
        val tag = base.stripPrefix("tag:")
        stages.filter(_.tags.contains(tag)).map(_.name).toSet
      } else Set(base).filter(byName.contains)
    if (plus) descendants(roots) else roots
  }

  def select(selector: String): Pipeline =
    new Pipeline(restrict(resolve(selector)), metrics, runId)

  def exclude(selector: String): Pipeline =
    new Pipeline(restrict(stages.map(_.name).toSet -- resolve(selector)), metrics, runId)

  /** Keep only `names`, dropping dep edges that point outside the slice
    * (the sliced-away model is assumed already materialized, like dbt). */
  private def restrict(names: Set[String]): Seq[Stage] =
    stages.filter(s => names.contains(s.name))
      .map(s => s.copy(deps = s.deps.filter(names.contains)))

  /** Dependency-parallel run: stages whose deps are satisfied execute
    * concurrently (bounded by `parallelism` driver threads; Spark's
    * scheduler interleaves their jobs across executors — FAIR-share if
    * configured). Fail-fast: a failed stage cancels stages that haven't
    * started. Independent raw-layer ingests overlap — the wall-clock win
    * when one source's scan is IO-bound and another's is CPU-bound. */
  def runParallel(spark: SparkSession, parallelism: Int = 4,
                  log: String => Unit = s => println(s"[pipeline] $s")): PipelineResult = {
    import java.util.concurrent.{ConcurrentHashMap, Executors}
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val ctx = new ConcurrentHashMap[String, DataFrame]()
    val results = new ConcurrentHashMap[String, StageResult]()
    @volatile var aborted = false
    val futures = scala.collection.mutable.Map[String, scala.concurrent.Future[Unit]]()
    ordered.foreach { st =>
      val depFutures = st.deps.map(futures)
      futures(st.name) = scala.concurrent.Future.sequence(depFutures).map { _ =>
        val depsOk = st.deps.forall(d => Option(results.get(d)).exists(_.ok))
        if (!aborted && depsOk) {
          val r = runStage(st, spark, k => Option(ctx.get(k)), log)
          r._2.foreach { df => ctx.put(st.name, df) }
          results.put(st.name, r._1)
          if (!r._1.ok) aborted = true
        }
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures.values.toSeq),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    PipelineResult(ordered.flatMap(st => Option(results.get(st.name))))
  }

  /** Execute one stage with its retry budget; check failures don't retry. */
  private def runStage(st: Stage, spark: SparkSession,
                       ref: String => Option[DataFrame],
                       log: String => Unit): (StageResult, Option[DataFrame]) = {
    var attempt = 0
    var out = runStageOnce(st, spark, ref, log)
    while (!out._1.ok && out._1.checks.isEmpty && attempt < st.retries) {
      attempt += 1
      log(s"stage ${st.name} retry $attempt/${st.retries}")
      out = runStageOnce(st, spark, ref, log)
    }
    out
  }

  private def runStageOnce(st: Stage, spark: SparkSession,
                           ref: String => Option[DataFrame],
                           log: String => Unit): (StageResult, Option[DataFrame]) = {
    val t0 = System.nanoTime()
    try {
      log(s"stage ${st.name} starting (deps=${st.deps.mkString(",")})")
      val deps = st.deps.flatMap(d => ref(d).map(d -> _)).toMap
      val built = st.build(spark, deps)
      val (df, nQuarantined) = st.quarantine match {
        case Some(qr) =>
          val (clean, bad) = Checks.split(built, qr.checks)
          val stamped = bad
            .withColumn("__stage", org.apache.spark.sql.functions.lit(st.name))
            .withColumn("__quarantined_at",
              org.apache.spark.sql.functions.current_timestamp())
          qr.table.overwrite(stamped)
          val n = qr.table.read().count()
          if (n > 0) log(s"stage ${st.name} quarantined $n rows")
          (clean, n)
        case None => (built, 0L)
      }
      // auditedRows rides along from the audit's fused aggregation so the
      // metrics feed never re-scans a published table (free at any scale);
      // for in-place sinks it is the BATCH volume — the run-over-run
      // signal that matters for partition refreshes
      val (version, checkResults, materialized, auditedRows) = st.sink match {
        case Some(Overwrite(table, parts)) =>
          val n = table.stage(df, parts)
          val staged = table.readVersion(n)
          val (rs, rows) = Checks.runAllWithCount(staged, st.checks)
          if (Checks.errorsOnly(rs).isEmpty) {
            table.publish(n); (Some(n), rs, table.read(), Some(rows))
          } else (None, rs, staged, Some(rows))
        case Some(Merge(table, keys, order, parts)) =>
          // Write-Audit-Publish for merges too: the merged snapshot is
          // staged, checks run against the STAGED data, and only a clean
          // audit publishes — an Error-severity failure never moves the
          // pointer (same contract as the Overwrite sink).
          var rs: Seq[CheckResult] = Nil
          var rows = -1L
          val published = table.mergeAudited(df, keys, order, staged => {
            val out = Checks.runAllWithCount(staged, st.checks)
            rs = out._1; rows = out._2
            Checks.errorsOnly(rs).isEmpty
          }, parts)
          val audited = if (rows >= 0) Some(rows) else None
          published match {
            case Some(n) => (Some(n), rs, table.read(), audited)
            case None => (None, rs, df, audited)
          }
        case Some(InsertOverwrite(table, partCol)) =>
          // no staged snapshot to audit — check the batch, then write; a
          // failed audit leaves every existing partition untouched
          val (rs, rows) = Checks.runAllWithCount(df, st.checks)
          if (Checks.errorsOnly(rs).isEmpty) {
            table.insertOverwritePartitions(df, partCol)
            (None, rs, table.readInPlace(), Some(rows))
          } else (None, rs, df, Some(rows))
        case Some(Scd2(table, keys, order, attrs, validFrom, parts)) =>
          import org.apache.spark.sql.functions.{col, not}
          val cur = if (table.exists) Some(table.read()) else None
          // open rows re-enter change detection as plain events (their
          // original event columns survive scd2's projection); closed
          // intervals never re-enter — batch-bounded work
          val events = cur match {
            case Some(c) => c.filter(col("is_current"))
              .drop("valid_from", "valid_to", "is_current").unionByName(df)
            case None => df
          }
          val attrCols =
            if (attrs.nonEmpty) attrs
            else df.columns.toSeq.filterNot(c => keys.contains(c) || c == validFrom)
          val intervals = graft.ops.ScdOps.scd2(
            events, keys, order, attrCols, col(validFrom))
          val result = cur match {
            case Some(c) => c.filter(not(col("is_current"))).unionByName(intervals)
            case None => intervals
          }
          val n = table.stage(result, parts)
          val staged = table.readVersion(n)
          val (rs, rows) = Checks.runAllWithCount(staged, st.checks)
          if (Checks.errorsOnly(rs).isEmpty) {
            table.publish(n); (Some(n), rs, table.read(), Some(rows))
          } else (None, rs, staged, Some(rows))
        case None =>
          if (st.checks.nonEmpty) {
            val (rs, rows) = Checks.runAllWithCount(df, st.checks)
            (None, rs, df, Some(rows))
          } else (None, Nil, df, None)
      }
      val bad = Checks.errorsOnly(checkResults)
      val ok = bad.isEmpty
      // synchronized: runParallel stages record concurrently and the
      // metrics table append is read-union-overwrite. The count comes
      // from the audit aggregation when one ran — no table re-scan.
      if (ok) metrics.foreach(m => this.synchronized {
        auditedRows match {
          case Some(rows) => m.recordRowCount(runId, st.name, rows)
          case None => m.record(runId, st.name, materialized)
        }
      })
      // alert routing sees EVERY result (pass results re-arm recovery);
      // synchronized for the same runParallel reason
      alerts.foreach(a => this.synchronized {
        a.process(checkResults.map(r =>
          r.copy(column = s"${st.name}:${r.column}")))
      })
      val ms = (System.nanoTime() - t0) / 1000000
      checkResults.foreach(r => log(
        s"stage ${st.name} check ${r.check}(${r.column}): " +
          s"${if (r.passed) "pass" else s"FAIL violations=${r.violations}"}"))
      log(s"stage ${st.name} ${if (ok) "ok" else "FAILED"} (${ms}ms)")
      (StageResult(st.name, ok, checkResults, version, ms,
        if (ok) None else Some(s"checks failed: ${bad.map(_.check).mkString(",")}"),
        quarantined = nQuarantined),
        if (ok) Some(materialized) else None)
    } catch {
      case e: Exception =>
        val ms = (System.nanoTime() - t0) / 1000000
        log(s"stage ${st.name} ERROR: ${e.getMessage}")
        (StageResult(st.name, ok = false, Nil, None, ms, Some(e.toString)), None)
    }
  }

  /** Sequential fail-fast run. Returns per-stage results; stops at the
    * first stage whose Error-severity checks fail or whose build throws. */
  def run(spark: SparkSession,
          log: String => Unit = s => println(s"[pipeline] $s")): PipelineResult = {
    val ctx = scala.collection.mutable.Map[String, DataFrame]()
    val results = scala.collection.mutable.ArrayBuffer[StageResult]()
    var failed = false
    ordered.foreach { st =>
      if (!failed) {
        val (r, materialized) = runStage(st, spark, ctx.get, log)
        materialized.foreach(ctx(st.name) = _)
        results += r
        if (!r.ok) failed = true
      }
    }
    PipelineResult(results.toSeq)
  }
}
