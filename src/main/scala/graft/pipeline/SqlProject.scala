package graft.pipeline

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.checks.Checks
import graft.checks.Checks.{Check, Severity}
import graft.sinks.SnapshotTable

/** Declarative SQL-project loader — the engine-native form of the
  * reference's dbt PROJECT surface (a directory of SQL model files with
  * config + tests), so a dbt user ports their project file-for-file
  * instead of rewriting it as Scala
  * (reference `dbt/promptly/models/raw/raw_provider_postgres.sql:2-11`,
  * `models/curated/schema.yaml:10-37`, SURVEY.md §3.1 step 4).
  *
  * Each `<name>.sql` file in the models directory is one model:
  *
  * {{{
  * -- graft: materialized=merge unique_key=provider_id order_by=event_ts
  * -- graft: tags=raw,cdc partition_by=ingestion_cdc_date retries=1
  * -- test: unique provider_id
  * -- test: not_null provider_name severity=warn
  * -- test: accepted_values status active,inactive
  * -- test: relationships care_site_id raw_care_site care_site_id
  * -- test: expression nonneg n_tokens >= 0
  * -- test: row_count_between 1 1000000
  * select ... from {{ ref('raw_provider') }} p
  *   join {{ source('care_sites') }} c on ...
  * }}}
  *
  * `ref('x')` resolves to model x's output (and induces the DAG edge —
  * discovered from the SQL, never declared twice); `source('s')` resolves
  * from the caller-supplied sources map (the engine analog of dbt's
  * `source.yaml`). Materializations: `table` (full-snapshot WAP write,
  * the default), `merge` (K3 incremental upsert by `unique_key`, latest
  * row per key by `order_by`), `ephemeral` (no write; downstream refs
  * consume the DataFrame — dbt's CTE-inlined ephemeral models),
  * `insert_overwrite` (dbt's other incremental strategy: the batch's
  * partitions replace the table's same partitions in place, dynamic
  * partition overwrite — needs exactly one `partition_by` column; IO
  * bounded by the touched partitions, no snapshot history), and `scd2`
  * (dbt snapshots: validity intervals `[valid_from, valid_to)` per
  * `unique_key`, a new interval whenever the `check_cols` tuple changes
  * — `check_cols` omitted tracks all non-key columns; `valid_from`
  * names the interval-start column, defaulting to the first `order_by`).
  * `relationships` parents resolve from the lake AT CHECK TIME, so a
  * parent published earlier in the same run is visible.
  *
  * Incremental models (dbt's `is_incremental()` / `{{ this }}`): a
  * `{% if is_incremental() %} … {% endif %}` block is dropped on the
  * model's first run and inlined on every later run, and `{{ this }}`
  * resolves to the model's own published snapshot — the standard
  * "WHERE ts > (SELECT max(ts) FROM {{ this }})" pattern that keeps a
  * model's scan proportional to NEW data. Combine with
  * `materialized=merge` for upsert-by-key increments.
  *
  * Scale posture: the loader only wires plans together — every model body
  * is analyzed by Catalyst as ONE query over its refs (temp views are
  * lazy), so filter pushdown/pruning cross model boundaries exactly as if
  * the SQL were hand-composed; execution and WAP publication ride the
  * existing [[Pipeline]] (`runParallel` overlaps independent models).
  */
object SqlProject {

  final case class Model(
      name: String, sql: String, refs: Seq[String], sources: Seq[String],
      materialized: String, uniqueKey: Seq[String], orderBy: Seq[String],
      partitionBy: Seq[String], tags: Set[String], retries: Int,
      tests: Seq[TestSpec], checkCols: Seq[String] = Nil,
      validFrom: Option[String] = None)

  /** One `-- test:` line, compiled against the lake in [[load]]. */
  final case class TestSpec(kind: String, args: Seq[String], severity: Severity)

  private val RefPat = """\{\{\s*ref\(\s*'([A-Za-z0-9_]+)'\s*\)\s*\}\}""".r
  private val SrcPat = """\{\{\s*source\(\s*'([A-Za-z0-9_]+)'\s*\)\s*\}\}""".r
  private val ThisPat = """\{\{\s*this\s*\}\}""".r
  // {{ var('name') }} or {{ var('name', 'default') }} — dbt run vars
  private val VarPat =
    """\{\{\s*var\(\s*'([A-Za-z0-9_]+)'\s*(?:,\s*'([^']*)'\s*)?\)\s*\}\}""".r
  private val IncPat =
    """(?s)\{%\s*if\s+is_incremental\(\)\s*%\}(.*?)\{%\s*endif\s*%\}""".r

  /** Parse one model file's text (header comment lines + SQL body). */
  def parseModel(name: String, text: String): Model = {
    val lines = text.linesIterator.toSeq
    val conf = scala.collection.mutable.Map[String, String]()
    val tests = scala.collection.mutable.ArrayBuffer[TestSpec]()
    lines.takeWhile(_.trim.startsWith("--")).foreach { raw =>
      val l = raw.trim
      if (l.startsWith("-- graft:"))
        l.stripPrefix("-- graft:").trim.split("\\s+").foreach { kv =>
          kv.split("=", 2) match {
            case Array(k, v) => conf(k) = v
            case _ => throw new IllegalArgumentException(
              s"model $name: malformed config token '$kv' (want key=value)")
          }
        }
      else if (l.startsWith("-- test:")) {
        val toks = l.stripPrefix("-- test:").trim.split("\\s+").toSeq
        require(toks.nonEmpty, s"model $name: empty test line")
        val (args0, sev) = toks.tail.partition(!_.startsWith("severity="))
        val severity: Severity =
          if (sev.exists(_.endsWith("warn"))) Checks.Warn else Checks.Error
        tests += TestSpec(toks.head, args0, severity)
      }
    }
    val sql = lines.dropWhile(_.trim.startsWith("--")).mkString("\n").trim
    require(sql.nonEmpty, s"model $name: no SQL body")
    val mat = conf.getOrElse("materialized", "table")
    require(Set("table", "merge", "ephemeral", "insert_overwrite", "scd2")
      .contains(mat), s"model $name: unknown materialized=$mat")
    def list(k: String): Seq[String] =
      conf.get(k).map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Nil)
    if (mat == "merge" || mat == "scd2")
      require(list("unique_key").nonEmpty && list("order_by").nonEmpty,
        s"model $name: materialized=$mat needs unique_key= and order_by=")
    if (mat == "insert_overwrite")
      require(list("partition_by").size == 1,
        s"model $name: materialized=insert_overwrite needs exactly one partition_by= column")
    Model(name, sql,
      refs = RefPat.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct,
      sources = SrcPat.findAllMatchIn(sql).map(_.group(1)).toSeq.distinct,
      materialized = mat,
      uniqueKey = list("unique_key"), orderBy = list("order_by"),
      partitionBy = list("partition_by"), tags = list("tags").toSet,
      retries = conf.get("retries").map(_.toInt).getOrElse(0),
      tests = tests.toSeq, checkCols = list("check_cols"),
      validFrom = conf.get("valid_from"))
  }

  private def compileTest(model: String, t: TestSpec, lakeRoot: String,
                          readPublished: (SparkSession, String) => DataFrame): Check =
    (t.kind, t.args) match {
      case ("unique", Seq(cols)) =>
        Checks.Unique(cols.split(",").toSeq, t.severity)
      case ("not_null", Seq(c)) => Checks.NotNull(c, t.severity)
      case ("accepted_values", Seq(c, vals)) =>
        Checks.AcceptedValues(c, vals.split(",").toSeq, t.severity)
      case ("relationships", Seq(c, parent, parentCol)) =>
        // parent resolves from the lake when the check RUNS (dbt refs a
        // published model); NULL FKs pass, per dbt semantics
        Checks.CustomCheck(s"relationships:$c->$parent.$parentCol", df => {
          val p = readPublished(df.sparkSession, parent)
            .select(col(parentCol).as(c))
          df.select(col(c)).where(col(c).isNotNull)
            .join(p, Seq(c), "left_anti").count()
        }, t.severity)
      case ("expression", name +: rest) if rest.nonEmpty =>
        Checks.Expression(name,
          org.apache.spark.sql.functions.expr(rest.mkString(" ")), t.severity)
      case ("row_count_between", Seq(mn, mx)) =>
        Checks.RowCountBetween(mn.toLong, mx.toLong, t.severity)
      case ("freshness", Seq(c, maxAgeMs)) =>
        Checks.Freshness(c, maxAgeMs.toLong, t.severity)
      case _ => throw new IllegalArgumentException(
        s"model $model: unknown test '${t.kind} ${t.args.mkString(" ")}'")
    }

  /** Parse a `sources.conf` text (the engine's `source.yaml` analog):
    * one `name format path` triple per line, `#` comments. Formats:
    * `parquet`/`orc` (self-describing), `jsonl` (schema inferred),
    * `csv` (header + inference — the reference's client-drop shape).
    * Inference is a CLI convenience; programmatic callers pass typed
    * DataFrames to [[load]] directly. */
  def parseSources(text: String): Map[String, SparkSession => DataFrame] =
    text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        l.split("\\s+") match {
          case Array(name, fmt, path) =>
            val f: SparkSession => DataFrame = fmt match {
              case "parquet" | "orc" => s => s.read.format(fmt).load(path)
              case "jsonl" => s => s.read.json(path)
              case "csv" => s => s.read.option("header", "true")
                .option("inferSchema", "true").csv(path)
              case other => throw new IllegalArgumentException(
                s"source $name: unknown format $other")
            }
            name -> f
          case _ => throw new IllegalArgumentException(
            s"malformed source line '$l' (want: name format path)")
        }
      }.toMap

  /** Read every `*.sql` under `modelsDir` (one level) into a [[Pipeline]]
    * publishing to `lakeRoot/<model>`; `sources` supplies the external
    * tables `source('name')` refers to. `seedsDir` (dbt `seeds/`): every
    * `<name>.csv` there becomes a dependency-free stage publishing the
    * file as a WAP'd snapshot table that models `ref('name')` like any
    * model — the version-controlled small-dimension path (country codes,
    * rate cards). Seeds are driver-file-sized by contract; big inputs
    * belong in `sources`. */
  /** `vars`: dbt run variables — `{{ var('name') }}` substitutes the
    * value (SQL-quoted by the CALLER's literal context, substitution is
    * textual like dbt's), `{{ var('name', 'default') }}` falls back. An
    * unset no-default var fails the stage at build time, not silently.
    * The backfill idiom: an `insert_overwrite` model filtered by
    * `{{ var('ds') }}` re-runs per historical date, each run replacing
    * only that date's partitions. */
  /** Parse every model file and seed name of a project directory —
    * shared by [[load]] (execution) and [[writeDocs]] (lineage docs). */
  def parseProjectFiles(modelsDir: String, seedsDir: Option[String])
      : (Seq[Model], Seq[Path]) = {
    val files = Files.list(Paths.get(modelsDir)).iterator().asScala
      .filter(_.toString.endsWith(".sql")).toSeq.sortBy(_.toString)
    require(files.nonEmpty, s"no .sql models under $modelsDir")
    val models = files.map { p: Path =>
      parseModel(p.getFileName.toString.stripSuffix(".sql"),
        new String(Files.readAllBytes(p), "UTF-8"))
    }
    val seedFiles: Seq[Path] = seedsDir.toSeq.flatMap { d =>
      Files.list(Paths.get(d)).iterator().asScala
        .filter(_.toString.endsWith(".csv")).toSeq.sortBy(_.toString)
    }
    (models, seedFiles)
  }

  def load(spark: SparkSession, modelsDir: String, lakeRoot: String,
           sources: Map[String, SparkSession => DataFrame],
           seedsDir: Option[String] = None,
           vars: Map[String, String] = Map.empty): Pipeline = {
    val (models, seedFiles) = parseProjectFiles(modelsDir, seedsDir)
    val seedNames = seedFiles.map(_.getFileName.toString.stripSuffix(".csv"))
    seedNames.foreach(n => require(!models.exists(_.name == n),
      s"seed '$n' collides with a model file"))
    val names = models.map(_.name).toSet ++ seedNames
    models.foreach { m =>
      m.refs.foreach(r => require(names.contains(r),
        s"model ${m.name}: ref('$r') has no model or seed file"))
      m.sources.foreach(s => require(sources.contains(s),
        s"model ${m.name}: source('$s') not in the sources map"))
    }
    // insert_overwrite tables live in the stable data dir, not a published
    // snapshot — every lake-side read (ref fallback, {{ this }},
    // relationships parents) resolves through the model's materialization
    val matOf = models.map(m => m.name -> m.materialized).toMap
    def readPublished(s: SparkSession, name: String): DataFrame = {
      val t = new SnapshotTable(s, s"$lakeRoot/$name")
      if (matOf.get(name).contains("insert_overwrite")) t.readInPlace()
      else t.read()
    }
    val stages = models.map { m =>
      val sink: Option[Sink] = m.materialized match {
        case "ephemeral" => None
        case "merge" => Some(Merge(
          new SnapshotTable(spark, s"$lakeRoot/${m.name}"), m.uniqueKey,
          // latest-per-key = MAX of order_by (latestPerKey convention)
          m.orderBy.map(col(_)), m.partitionBy))
        case "insert_overwrite" => Some(InsertOverwrite(
          new SnapshotTable(spark, s"$lakeRoot/${m.name}"), m.partitionBy.head))
        case "scd2" => Some(Scd2(
          new SnapshotTable(spark, s"$lakeRoot/${m.name}"), m.uniqueKey,
          m.orderBy.map(col(_)), m.checkCols,
          m.validFrom.getOrElse(m.orderBy.head), m.partitionBy))
        case _ => Some(Overwrite(
          new SnapshotTable(spark, s"$lakeRoot/${m.name}"), m.partitionBy))
      }
      Stage(
        name = m.name, deps = m.refs, tags = m.tags, retries = m.retries,
        checks = m.tests.map(compileTest(m.name, _, lakeRoot, readPublished)),
        sink = sink,
        build = (s, deps) => {
          var sql = m.sql
          // vars substitute FIRST — they may appear inside
          // is_incremental() blocks or ref/source argument positions
          sql = VarPat.replaceAllIn(sql, mm => {
            val v = vars.get(mm.group(1)).orElse(Option(mm.group(2)))
            require(v.isDefined,
              s"model ${m.name}: var('${mm.group(1)}') is unset and has no default")
            scala.util.matching.Regex.quoteReplacement(v.get)
          })
          // dbt incremental semantics: on the FIRST run (no published
          // table) `is_incremental()` blocks drop and the model scans its
          // full inputs; afterwards the block body survives and
          // `{{ this }}` reads the published snapshot — so a 100 TB model
          // re-reads only the rows its own predicate admits, not history
          val target = new SnapshotTable(s, s"$lakeRoot/${m.name}")
          val incremental =
            if (m.materialized == "insert_overwrite") target.existsInPlace
            else target.exists
          sql = IncPat.replaceAllIn(sql, mm =>
            if (incremental)
              scala.util.matching.Regex.quoteReplacement(mm.group(1))
            else "")
          if (ThisPat.findFirstIn(sql).isDefined) {
            require(incremental,
              s"model ${m.name}: {{ this }} outside is_incremental() " +
                "on the first run — no published table to read")
            readPublished(s, m.name)
              .createOrReplaceTempView(s"graft_this_${m.name}")
            sql = ThisPat.replaceAllIn(sql, s"graft_this_${m.name}")
          }
          m.refs.foreach { r =>
            // a ref sliced away by select()/exclude() is assumed already
            // materialized (dbt semantics) — read its published snapshot
            deps.getOrElse(r, readPublished(s, r))
              .createOrReplaceTempView(s"graft_ref_$r")
            sql = RefPat.replaceAllIn(sql, mm =>
              if (mm.group(1) == r) s"graft_ref_$r" else mm.matched)
          }
          m.sources.foreach { n =>
            sources(n)(s).createOrReplaceTempView(s"graft_src_$n")
            sql = SrcPat.replaceAllIn(sql, mm =>
              if (mm.group(1) == n) s"graft_src_$n" else mm.matched)
          }
          s.sql(sql)
        })
    }
    val seedStages = seedFiles.map { p =>
      val name = p.getFileName.toString.stripSuffix(".csv")
      Stage(name = name, tags = Set("seed"),
        // header + inference, the dbt seed contract; the file is read on
        // the driver's filesystem path and published through the same
        // WAP snapshot as any model, so downstream refs and time travel
        // see no difference
        build = (s, _) => s.read.option("header", "true")
          .option("inferSchema", "true").csv(p.toString),
        sink = Some(Overwrite(new SnapshotTable(spark, s"$lakeRoot/$name"))))
    }
    new Pipeline(seedStages ++ stages)
  }

  // ------------------------------------------------------- lineage docs

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def jarr(xs: Seq[String]): String =
    xs.map(jstr).mkString("[", ",", "]")

  /** dbt `manifest.json` analog: every node (model or seed) with its
    * materialization, config, tests, and the DAG edges discovered from
    * `ref()`/`source()` — machine-readable lineage for CI diffing and
    * impact analysis ("what is downstream of X"). */
  def manifestJson(models: Seq[Model], seeds: Seq[String]): String = {
    val seedNodes = seeds.sorted.map { s =>
      s"""{"name":${jstr(s)},"type":"seed","materialized":"table","tags":["seed"],"refs":[],"sources":[],"tests":[]}"""
    }
    val modelNodes = models.sortBy(_.name).map { m =>
      val tests = m.tests.map { t =>
        s"""{"kind":${jstr(t.kind)},"args":${jarr(t.args)},"severity":${
          jstr(if (t.severity == Checks.Warn) "warn" else "error")}}"""
      }.mkString("[", ",", "]")
      s"""{"name":${jstr(m.name)},"type":"model","materialized":${jstr(m.materialized)},""" +
        s""""tags":${jarr(m.tags.toSeq.sorted)},"refs":${jarr(m.refs)},""" +
        s""""sources":${jarr(m.sources)},"unique_key":${jarr(m.uniqueKey)},""" +
        s""""order_by":${jarr(m.orderBy)},"partition_by":${jarr(m.partitionBy)},""" +
        s""""tests":$tests}"""
    }
    val edges = models.sortBy(_.name).flatMap { m =>
      m.refs.map(r =>
        s"""{"from":${jstr(r)},"to":${jstr(m.name)},"kind":"ref"}""") ++
        m.sources.map(s =>
          s"""{"from":${jstr(s)},"to":${jstr(m.name)},"kind":"source"}""")
    }
    s"""{"nodes":${(seedNodes ++ modelNodes).mkString("[", ",", "]")},""" +
      s""""edges":${edges.mkString("[", ",", "]")}}"""
  }

  /** Self-contained HTML DAG (dbt `docs generate` analog, same
    * no-dependency posture as [[Pipeline.toHtml]]): nodes laid out
    * left-to-right by dependency depth, SVG edges, and a per-model table
    * of materializations and tests. Sources render as a distinct node
    * kind (they are external tables, not built stages). */
  def lineageHtml(models: Seq[Model], seeds: Seq[String]): String = {
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val sources = models.flatMap(_.sources).distinct.sorted
    val kinds: Map[String, String] =
      (seeds.map(_ -> "seed") ++ sources.map(_ -> "source") ++
        models.map(m => m.name -> m.materialized)).toMap
    val parents: Map[String, Seq[String]] =
      models.map(m => m.name -> (m.refs ++ m.sources)).toMap
    // depth = longest path from any root; roots (seeds/sources/no-dep
    // models) sit at 0. writeDocs runs BEFORE load()'s DAG validation,
    // so a cyclic ref() graph must fail here with a named cycle, not a
    // StackOverflowError (getOrElseUpdate memoizes only after return).
    val depthMemo = scala.collection.mutable.Map[String, Int]()
    val inProgress = scala.collection.mutable.LinkedHashSet[String]()
    def depth(n: String): Int = depthMemo.getOrElse(n, {
      require(!inProgress.contains(n),
        s"cyclic ref() graph: ${(inProgress.dropWhile(_ != n).toSeq :+ n).mkString(" -> ")}")
      inProgress += n
      val d = parents.get(n).filter(_.nonEmpty)
        .map(ps => 1 + ps.map(depth).max).getOrElse(0)
      inProgress -= n
      depthMemo(n) = d
      d
    })
    val all = (seeds ++ sources ++ models.map(_.name)).distinct
    val byLevel = all.groupBy(depth).toSeq.sortBy(_._1)
      .map { case (d, ns) => d -> ns.sorted }
    val (colW, rowH, boxW, boxH) = (230, 64, 190, 36)
    val pos: Map[String, (Int, Int)] = byLevel.flatMap { case (d, ns) =>
      ns.zipWithIndex.map { case (n, i) =>
        n -> (30 + d * colW, 30 + i * rowH)
      }
    }.toMap
    val width = 60 + byLevel.size * colW
    val height = 60 + byLevel.map(_._2.size).max * rowH
    val edgeSvg = models.flatMap { m =>
      (m.refs ++ m.sources).map { p =>
        val (x1, y1) = pos(p); val (x2, y2) = pos(m.name)
        val (sx, sy) = (x1 + boxW, y1 + boxH / 2)
        val (tx, ty) = (x2, y2 + boxH / 2)
        s"""<path d="M $sx $sy C ${sx + 40} $sy, ${tx - 40} $ty, $tx $ty"/>"""
      }
    }.mkString("\n")
    val nodeSvg = all.map { n =>
      val (x, y) = pos(n)
      val k = kinds(n)
      s"""<g class="node $k"><rect x="$x" y="$y" rx="6" width="$boxW" height="$boxH"/>""" +
        s"""<text x="${x + boxW / 2}" y="${y + 16}">${esc(n)}</text>""" +
        s"""<text class="kind" x="${x + boxW / 2}" y="${y + 30}">${esc(k)}</text></g>"""
    }.mkString("\n")
    val rows = models.sortBy(_.name).map { m =>
      val tests =
        if (m.tests.isEmpty) "&mdash;"
        else m.tests.map(t =>
          esc(s"${t.kind} ${t.args.mkString(" ")}") +
            (if (t.severity == Checks.Warn) " <em>(warn)</em>" else ""))
          .mkString("<br>")
      s"<tr><td>${esc(m.name)}</td><td>${esc(m.materialized)}</td>" +
        s"<td>${esc(m.tags.toSeq.sorted.mkString(", "))}</td>" +
        s"<td>${esc((m.refs ++ m.sources).mkString(", "))}</td><td>$tests</td></tr>"
    }.mkString("\n")
    s"""<!DOCTYPE html>
       |<html><head><meta charset="utf-8"><title>graft lineage</title>
       |<style>
       |body{font-family:sans-serif;margin:2em}
       |svg{border:1px solid #eee}
       |svg path{fill:none;stroke:#a9b4c0;stroke-width:1.5}
       |svg rect{fill:#f4f7fa;stroke:#5b7a99}
       |.seed rect{fill:#fff6e0;stroke:#c9a227}
       |.source rect{fill:#efe7f7;stroke:#7a5b99}
       |.merge rect,.insert_overwrite rect,.scd2 rect{fill:#e5f2e8;stroke:#2e7d4f}
       |svg text{text-anchor:middle;font-size:12px;fill:#1c2733}
       |svg text.kind{font-size:9px;fill:#66717e}
       |table{border-collapse:collapse;margin-top:1.5em}
       |td,th{border:1px solid #ccc;padding:4px 10px;text-align:left;vertical-align:top}
       |</style></head><body>
       |<h1>Model lineage</h1>
       |<svg width="$width" height="$height">
       |$edgeSvg
       |$nodeSvg
       |</svg>
       |<table>
       |<tr><th>model</th><th>materialized</th><th>tags</th><th>depends on</th><th>tests</th></tr>
       |$rows
       |</table></body></html>""".stripMargin
  }

  /** `dbt docs generate`: parse the project and write
    * `outDir/manifest.json` + `outDir/lineage.html`. Pure parsing — no
    * SparkSession, no lake access — so docs stay generatable from a
    * checkout alone. */
  def writeDocs(modelsDir: String, outDir: String,
                seedsDir: Option[String] = None): Unit = {
    val (models, seedFiles) = parseProjectFiles(modelsDir, seedsDir)
    val seeds = seedFiles.map(_.getFileName.toString.stripSuffix(".csv"))
    val out = Paths.get(outDir)
    Files.createDirectories(out)
    Files.writeString(out.resolve("manifest.json"), manifestJson(models, seeds))
    Files.writeString(out.resolve("lineage.html"), lineageHtml(models, seeds))
  }
}
