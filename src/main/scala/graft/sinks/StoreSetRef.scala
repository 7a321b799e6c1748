package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Cross-STORE atomic read consistency — [[TableSetRef]]'s all-old-or-
  * all-new contract for [[AppendOnlyStore]]-backed serving surfaces.
  *
  * A multi-store maintenance step (the RTBF drain feeding the BM25
  * index, the near-dup admission store and the CC labels per
  * micro-batch; a join tree committing level stores, aggregate and
  * extrema per batch) commits its surfaces SEQUENTIALLY, so a reader
  * listing the stores directly can observe surface A post-batch and
  * surface B pre-batch. Copy-based snapshots would fix that at
  * state-sized cost per batch; this class fixes it at MANIFEST cost:
  * the writer calls [[commit]] once per batch AFTER all surfaces
  * committed, recording every store's physical file listing in one
  * `_SSREF.<seq>` file (tmp-write + atomic rename — the engine's
  * pointer protocol), and a reader resolves every surface through one
  * pinned ref ([[snapshot]] → [[AppendOnlyStore.pinned]] views), so it
  * observes all-old or all-new — never mixed.
  *
  * Scale posture: a ref is O(total files) bytes — manifest-scale, the
  * same ledger an Iceberg snapshot keeps — and the commit is one
  * rename regardless of data size. Pinned listings survive one
  * subsequent compaction per store (the [[AppendOnlyStore.read]]
  * retention rule); refs older than the newest four are GC'd, bounding
  * both ledger size and how stale a pinned reader can be. Single
  * committer per ref (the drains' single-writer contract).
  */
class StoreSetRef(spark: SparkSession, root: String,
                  stores: Map[String, AppendOnlyStore]) {

  private val rootPath = new Path(root)
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private implicit val formats: org.json4s.Formats =
    org.json4s.DefaultFormats

  private def refSeqs(): Seq[(Long, Path)] =
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq.map(_.getPath).flatMap { p =>
      val name = p.getName
      if (name.startsWith("_SSREF.") && !name.contains("tmp"))
        name.stripPrefix("_SSREF.").toLongOption.map(_ -> p)
      else None
    }

  private def parseRef(p: Path): Map[String, Seq[String]] = {
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    org.json4s.jackson.JsonMethods.parse(text)
      .extract[Map[String, List[String]]]
  }

  /** Atomically publish the CURRENT state of every store as one ref.
    * Call once per batch, after every surface's append committed. */
  def commit(): Long = {
    val listing = stores.map { case (n, st) => n -> st.fileListing() }
    val seqs = refSeqs()
    val next = (seqs.map(_._1) :+ 0L).max + 1
    fs.mkdirs(rootPath)
    val tmp = new Path(rootPath, s"_SSREF_tmp${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(org.json4s.jackson.Serialization.write(listing)
      .getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, new Path(rootPath, s"_SSREF.$next")))
      throw new IllegalStateException(s"store-set ref swap failed at $root")
    // keep the newest 4 refs for in-flight pinned readers
    seqs.sortBy(-_._1).drop(3).foreach { case (_, p) => fs.delete(p, false) }
    next
  }

  /** The latest committed ref's sequence, if any. */
  def currentSeq(): Option[Long] = refSeqs().map(_._1).maxOption

  /** One CONSISTENT read handle: every store pinned to the same
    * committed ref. Reads through these views observe the exact state
    * [[commit]] published — all-old or all-new across every surface,
    * never a mid-batch mix. Requires at least one commit. */
  def snapshot(): Map[String, AppendOnlyStore] = {
    val seqs = refSeqs()
    require(seqs.nonEmpty, s"no store-set ref committed yet under $root")
    snapshotAt(seqs.maxBy(_._1)._1)
  }

  /** [[snapshot]] pinned to a specific ref — set-level time travel.
    * Validates the pinned listings UP FRONT: a retained ref's files
    * survive only ONE subsequent compaction per store (the
    * [[AppendOnlyStore.read]] retention rule), so an older ref whose
    * files a second compaction already deleted must fail HERE with a
    * clear expiry error — fast, at snapshot time — rather than as a
    * partial read or a missing-file failure deep inside a job. One
    * existence probe per pinned file: manifest cost, same order as
    * reading the ref itself. */
  def snapshotAt(seq: Long): Map[String, AppendOnlyStore] = {
    val p = new Path(rootPath, s"_SSREF.$seq")
    require(fs.exists(p), s"no store-set ref $seq under $root")
    val listing = parseRef(p)
    stores.map { case (n, st) =>
      val files = listing.getOrElse(n, Nil)
      val gone = files.filterNot(f => fs.exists(new Path(f)))
      if (gone.nonEmpty)
        throw new IllegalStateException(
          s"store-set ref $seq under $root expired by compaction: " +
            s"surface '$n' lost ${gone.size}/${files.size} pinned " +
            s"files (first: ${gone.head}); pin a newer ref")
      n -> st.pinned(files)
    }
  }
}
