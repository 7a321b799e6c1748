package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.ops.{ChainedIvm, IncrementalAgg, IncrementalJoin, JoinTreeIvm,
  MinMaxAgg}
import graft.sinks.AppendOnlyStore

/** PERSISTED serve registry: the durable twin of the in-memory
  * [[MaterializedAggRewrite]]/[[MaterializedJoinRewrite]] registries.
  *
  * Those registries are process-local ConcurrentHashMaps, so without
  * this a restarted session silently answers every dashboard query
  * from raw scans until some code path re-registers — correct, but the
  * 100 TB reader pays a full fact scan for a query the maintained
  * store answers from partials. [[record]] therefore writes a
  * reconstruction DESCRIPTOR (paths, keys, spec columns — never
  * closures) to `_SERVES.json` under a chosen directory, and
  * [[restore]] re-opens the stores from those descriptors and
  * re-registers through the SAME registration path a live writer uses,
  * so the served plan is identical across the session boundary
  * (ServeCatalogSpec pins the q199/q210-style scan-paths assert across
  * a simulated restart). [[graft.GraftSession.getOrCreate]] restores
  * automatically when `spark.graft.servesDir` (or `GRAFT_SERVES_DIR`)
  * names the catalog directory.
  *
  * '''Freshness contract.''' A descriptor cannot carry the writer's
  * in-memory `fresh()` guard, so a restored registration serves the
  * store's CURRENT COMMITTED state unconditionally. Recording an entry
  * is therefore the single-writer's assertion that the store is kept
  * current for as long as the entry exists — remove it ([[remove]])
  * before letting raw inputs run ahead of maintenance, exactly as a
  * database MV registry expects `DROP MATERIALIZED VIEW` before the
  * base table diverges. A live writer that wants a tighter window
  * passes its own `fresh` to [[record]], which applies to THIS
  * process's registration only.
  *
  * The file is single-writer (read-modify-rename, the engine-wide
  * store posture); entries dedupe by their serve target, so
  * re-recording after a store migration just overwrites.
  */
object ServeCatalog {

  /** Conf key (and env-var fallback `GRAFT_SERVES_DIR`) naming the
    * directory whose `_SERVES.json` [[graft.GraftSession.getOrCreate]]
    * restores at session build. */
  val ConfKey = "spark.graft.servesDir"

  private val FileName = "_SERVES.json"

  /** One reconstructible registration. Every field is data (paths,
    * column names, sizes) — reconstruction re-opens the stores. */
  sealed trait Entry {
    /** The serve target — entries dedupe on it. */
    def id: String
  }

  /** A maintained single-source aggregate ([[IncrementalAgg]] store):
    * `GROUP BY keyCols` aggregates over `source` answer from partials. */
  final case class AggServe(source: String, storeRoot: String,
                            keyCols: Seq[String], sumCols: Seq[String])
      extends Entry {
    def id: String = s"agg:$source"
  }

  /** A maintained single-source extrema multiset ([[MinMaxAgg]] store):
    * min/max/percentile_disc/percentile_cont of `valCol` GROUP BY
    * `keyCols` over `source` answer from the value multiset. */
  final case class ExtremaServe(source: String, storeRoot: String,
                                keyCols: Seq[String], valCol: String)
      extends Entry {
    def id: String = s"extrema:$source"
  }

  /** A maintained binary-join chain ([[ChainedIvm]] layout under
    * `chainRoot`): aggregates over `left ⋈ right` serve from the
    * cheapest level — agg partials, then the optional extrema
    * multiset, then the join-state multiset. */
  final case class ChainServe(left: String, right: String,
                              on: Seq[String], chainRoot: String,
                              buckets: Int,
                              aggKeyCols: Seq[String],
                              aggSumCols: Seq[String],
                              extremaKeyCols: Seq[String] = Nil,
                              extremaValCol: String = "")
      extends Entry {
    def id: String = s"chain:$left⋈$right"
  }

  /** A maintained left-deep join tree ([[JoinTreeIvm]] layout under
    * `treeRoot`): the whole serve LATTICE of
    * [[JoinTreeIvm.registerServe]] — every join prefix plus the
    * optional full-tree agg/extrema levels. */
  final case class TreeServe(paths: Seq[String], keys: Seq[Seq[String]],
                             treeRoot: String, buckets: Int,
                             aggKeyCols: Seq[String] = Nil,
                             aggSumCols: Seq[String] = Nil,
                             outerLast: Boolean = false,
                             extremaKeyCols: Seq[String] = Nil,
                             extremaValCol: String = "")
      extends Entry {
    def id: String = s"tree:${paths.mkString("⋈")}"
  }

  // ------------------------------------------------------------- apply

  private def aggStore(spark: SparkSession, root: String) =
    new AppendOnlyStore(spark, root, prefixCol = "__agg_key",
      prefixChars = 1)

  /** The [[MaterializedAggRewrite.MvDef]] of a [[MinMaxAgg]] store —
    * the extrema serve level ([[ChainedIvm.extremaServe]]'s shape). */
  private def extremaMvDef(store: AppendOnlyStore,
                           es: MinMaxAgg.Spec): MaterializedAggRewrite.MvDef =
    MaterializedAggRewrite.MvDef(
      keyCols = es.keyCols, sumCols = Nil,
      current = () => MinMaxAgg.current(store, es),
      minCols = Seq(es.valCol), maxCols = Seq(es.valCol),
      discQuantileCurrent = Map(es.valCol -> { ps =>
        ps.foldLeft(MinMaxAgg.quantilesDisc(store, es, ps)) { (d, p) =>
          d.withColumnRenamed(MinMaxAgg.quantileLabel(p),
            s"__qd_${math.round(p * 1e6)}")
        }
      }),
      contQuantileCurrent = Map(es.valCol -> { ps =>
        ps.foldLeft(MinMaxAgg.quantilesCont(store, es, ps)) { (d, p) =>
          d.withColumnRenamed(MinMaxAgg.contLabel(p),
            s"__qc_${math.round(p * 1e6)}")
        }
      }),
      countRowsExact = false)

  /** Register `entry` in the in-memory registries — the ONE
    * registration path shared by live recording and restore, so the
    * served plans are identical across a session boundary. */
  def applyEntry(spark: SparkSession, entry: Entry,
                 fresh: () => Boolean = () => true): Unit = entry match {
    case AggServe(source, root, keyCols, sumCols) =>
      // the agg rewrite carries no fresh guard (its registrations are
      // store-backed by construction); `fresh` applies to the join
      // shapes below only
      val store = aggStore(spark, root)
      val spec = IncrementalAgg.Spec(keyCols, sumCols)
      MaterializedAggRewrite.register(source,
        MaterializedAggRewrite.MvDef(keyCols, sumCols,
          () => IncrementalAgg.current(store, spec)))
    case ExtremaServe(source, root, keyCols, valCol) =>
      val store = aggStore(spark, root)
      MaterializedAggRewrite.register(source,
        extremaMvDef(store, MinMaxAgg.Spec(keyCols, valCol)))
    case ChainServe(left, right, on, chainRoot, buckets,
                    aggKeys, aggSums, exKeys, exVal) =>
      val exSpec =
        if (exVal.nonEmpty) Some(MinMaxAgg.Spec(exKeys, exVal)) else None
      val chain = ChainedIvm.stores(spark, chainRoot, on,
        IncrementalAgg.Spec(aggKeys, aggSums), buckets, exSpec)
      MaterializedJoinRewrite.register(left, right,
        MaterializedJoinRewrite.JoinMv(on,
          org.apache.spark.sql.catalyst.plans.Inner,
          () => ChainedIvm.currentJoin(chain), fresh,
          aggServe = Seq(
            MaterializedAggRewrite.MvDef(aggKeys, aggSums,
              () => ChainedIvm.currentAgg(chain))) ++
            exSpec.map(_ => ChainedIvm.extremaServe(chain)).toSeq))
    case TreeServe(paths, keys, treeRoot, buckets, aggKeys, aggSums,
                   outerLast, exKeys, exVal) =>
      val st = JoinTreeIvm.stores(spark, treeRoot, keys, buckets,
        aggSpec =
          if (aggSums.nonEmpty || aggKeys.nonEmpty)
            Some(IncrementalAgg.Spec(aggKeys, aggSums))
          else None,
        outerLast = outerLast,
        extremaSpec =
          if (exVal.nonEmpty) Some(MinMaxAgg.Spec(exKeys, exVal))
          else None)
      JoinTreeIvm.registerServe(st, paths, fresh)
  }

  // ----------------------------------------------------------- persist

  private implicit val formats: org.json4s.Formats =
    org.json4s.DefaultFormats +
      org.json4s.ShortTypeHints(List(classOf[AggServe],
        classOf[ExtremaServe], classOf[ChainServe], classOf[TreeServe]),
        typeHintFieldName = "kind")

  private def file(dir: String) = new Path(dir, FileName)

  private def readAll(spark: SparkSession, dir: String): Seq[Entry] = {
    val p = file(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Nil
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    org.json4s.jackson.JsonMethods.parse(text).extract[List[Entry]]
  }

  private def writeAll(spark: SparkSession, dir: String,
                       entries: Seq[Entry]): Unit = {
    val p = file(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir))
    val tmp = new Path(dir, s".$FileName.tmp")
    val out = fs.create(tmp, true)
    try out.write(org.json4s.jackson.Serialization.writePretty(entries)
      .getBytes("UTF-8"))
    finally out.close()
    fs.delete(p, false)
    require(fs.rename(tmp, p), s"could not publish $p")
  }

  /** Register `entry` now (with this process's `fresh` guard) AND
    * persist its descriptor under `dir` for future sessions. */
  def record(spark: SparkSession, dir: String, entry: Entry,
             fresh: () => Boolean = () => true): Unit = {
    applyEntry(spark, entry, fresh)
    val kept = readAll(spark, dir).filterNot(_.id == entry.id)
    writeAll(spark, dir, kept :+ entry)
  }

  /** Drop the entry serving `id` from the persisted catalog (the
    * in-memory registration, if any, is left to its owner). */
  def remove(spark: SparkSession, dir: String, id: String): Unit =
    writeAll(spark, dir, readAll(spark, dir).filterNot(_.id == id))

  def list(spark: SparkSession, dir: String): Seq[Entry] =
    readAll(spark, dir)

  /** Re-register every persisted entry — the session-build hook. */
  def restore(spark: SparkSession, dir: String): Seq[Entry] = {
    val entries = readAll(spark, dir)
    entries.foreach(applyEntry(spark, _))
    entries
  }

  /** [[restore]] from the conf-keyed directory, when one is set. */
  def restore(spark: SparkSession): Seq[Entry] = {
    val dir = spark.conf.get(ConfKey,
      sys.env.getOrElse("GRAFT_SERVES_DIR", ""))
    if (dir.isEmpty) Nil else restore(spark, dir)
  }
}
