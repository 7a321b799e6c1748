package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-table ATOMIC publish — the engine's analog of Nessie's `main`
  * ref committing a whole catalog state at once (reference
  * `infra/trino/etc/catalog/iceberg.properties:2-5`: one versioned ref
  * spans every Iceberg table; WAP rationale `README.md:62`).
  *
  * [[SnapshotTable.publish]] swaps ONE table's pointer. A pipeline that
  * promotes N curated tables with N pointer swaps exposes a mixed state
  * mid-promote: a reader can see table A new and table B old. This class
  * removes that window with a catalog-level ref:
  *
  * {{{
  *   <root>/<table>/snapshot=N/   immutable snapshots (SnapshotTable dirs)
  *   <root>/_REF.<seq>            "name version" lines; max seq wins
  * }}}
  *
  * Staging writes table snapshots but moves NO pointer; [[commit]] writes
  * one new `_REF.<seq>` file (tmp-write + atomic rename, the same
  * protocol as the per-table pointer) mapping EVERY table to its
  * version. A reader pins the ref once ([[snapshot]]) and resolves all
  * tables through it, so it observes all-old or all-new — never mixed.
  * Old refs give catalog-level time travel and make rollback a plain
  * re-commit of an older mapping.
  *
  * Scale posture: the ref file is O(|tables|) bytes and the commit is one
  * rename regardless of data size — identical cost at 100 TB. Single
  * committer contract (as with Nessie's ref: concurrent commits need a
  * CAS loop, out of scope here; last rename wins).
  */
class TableSetRef(spark: SparkSession, root: String) {

  private val rootPath = new Path(root)
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The per-table SnapshotTable (for staging, auditing, time travel). */
  def table(name: String): SnapshotTable =
    new SnapshotTable(spark, new Path(rootPath, name).toString)

  private def refSeqs(): Seq[(Long, Path)] =
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq.map(_.getPath).flatMap { p =>
      val name = p.getName
      if (name.startsWith("_REF.") && !name.contains("tmp"))
        name.stripPrefix("_REF.").toLongOption.map(_ -> p)
      else None
    }

  private def parseRef(p: Path): Map[String, Long] = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](1024)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toString("UTF-8").linesIterator.filter(_.nonEmpty).map { line =>
        val i = line.lastIndexOf(' ')
        line.substring(0, i) -> line.substring(i + 1).toLong
      }.toMap
    } finally in.close()
  }

  /** The current committed table→version mapping (empty before the first
    * commit). Each call re-resolves; use [[snapshot]] to pin. */
  def currentRef(): Map[String, Long] = {
    val seqs = refSeqs()
    if (seqs.isEmpty) Map.empty else parseRef(seqs.maxBy(_._1)._2)
  }

  /** A PINNED view of the table set: every read resolves against the
    * one ref observed at construction — the consistency unit. */
  final class TableSetSnapshot private[TableSetRef] (
      val versions: Map[String, Long]) {
    def read(name: String): DataFrame = {
      val v = versions.getOrElse(name,
        throw new IllegalStateException(s"table $name not in ref $versions"))
      table(name).readVersion(v)
    }
  }

  def snapshot(): TableSetSnapshot = new TableSetSnapshot(currentRef())

  /** Stage one table's next snapshot (writes data, moves NO pointer).
    * Returns the staged version for [[commit]]. */
  def stage(name: String, df: DataFrame,
            partitionBy: Seq[String] = Nil): Long =
    table(name).stage(df, partitionBy)

  /** Atomically publish a new catalog state: the given versions are
    * merged OVER the current ref (tables not mentioned keep their
    * version) and the result becomes one new `_REF.<seq>` file via
    * tmp-write + rename. Staged-but-uncommitted snapshots stay
    * invisible; a crash before the rename leaves the old ref intact. */
  def commit(versions: Map[String, Long]): Map[String, Long] = {
    versions.foreach { case (name, v) =>
      require(fs.exists(new Path(new Path(rootPath, name), s"snapshot=$v")),
        s"table $name snapshot $v not staged under $root")
      require(!name.contains("\n"), s"table name must be single-line: $name")
    }
    val merged = currentRef() ++ versions
    val seqs = refSeqs()
    val next = (seqs.map(_._1) :+ 0L).max + 1
    val body = merged.toSeq.sortBy(_._1)
      .map { case (n, v) => s"$n $v" }.mkString("\n")
    val tmp = new Path(rootPath, s"_REF_tmp${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(rootPath, s"_REF.$next")))
      throw new IllegalStateException(s"ref swap failed for $root")
    // GC old refs best-effort, keeping the newest 4 for in-flight readers
    seqs.sortBy(-_._1).drop(3).foreach { case (_, p) => fs.delete(p, false) }
    merged
  }

  /** Catalog-level rollback: re-commit the mapping of an older ref seq
    * (the newest ref older than `beforeSeq`), returning it. */
  def rollbackTo(versions: Map[String, Long]): Map[String, Long] = {
    versions.foreach { case (name, v) =>
      require(fs.exists(new Path(new Path(rootPath, name), s"snapshot=$v")),
        s"cannot roll back $name to vacuumed snapshot $v")
    }
    commit(versions)
  }
}
