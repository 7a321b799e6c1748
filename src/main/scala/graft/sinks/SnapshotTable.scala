package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Debezium

/** Versioned parquet table with atomic publish — the engine's stand-in for
  * Iceberg+Nessie (SURVEY.md §1.1, §7.4.1).
  *
  * Layout:
  * {{{
  *   <root>/snapshot=N/          immutable parquet snapshot (optionally
  *                               partitioned by user columns)
  *   <root>/_LATEST.<seq>        pointer files containing N; max seq wins
  * }}}
  *
  * Write protocol = Write-Audit-Publish (reference README.md:62,108-116):
  * `stage()` writes snapshot N+1 but does NOT move the pointer; callers
  * audit (run checks against `readVersion(n)`); `publish(n)` swaps the
  * pointer via write-temp + atomic rename. Readers only ever follow
  * `_LATEST`, so a failed/unaudited write is invisible. Old snapshots give
  * time travel (`readVersion`) until `vacuum`.
  *
  * Scale posture: a merge here rewrites the table (read latest ∪ updates →
  * latest-per-key → write N+1). That is the correct shape for
  * dimension/curated tables (small relative to facts). For a 100 TB
  * date-partitioned raw layer, use `mergeInPlaceByPartition` instead:
  * dynamic-partition-overwrite rewrites only the partitions that contain
  * updated keys — bounded IO when updates cluster in recent dates, at the
  * cost of snapshot history for that table.
  */
class SnapshotTable(spark: SparkSession, root: String) {

  private val rootPath = new Path(root)
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val latestPtr = new Path(rootPath, "_LATEST")

  private def snapDir(n: Long) = new Path(rootPath, s"snapshot=$n")

  // Pointer protocol: publish writes a NEW file `_LATEST.<seq>` (tmp-write +
  // rename-to-fresh-name — atomic on HDFS/local, single-object PUT on S3)
  // and readers resolve the max-seq pointer. There is never a
  // delete-then-recreate window: the previous pointer stays on disk until a
  // later publish garbage-collects seqs older than the newest few, so a
  // concurrent reader always finds a pointer. Sequence order (not version
  // order) wins, which is what makes `rollback` a plain publish of an older
  // version. A bare legacy `_LATEST` file is still honored on read.

  private def pointerSeqs(): Seq[(Long, Path)] =
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq
      .map(_.getPath)
      .flatMap { p =>
        val name = p.getName
        if (name.startsWith("_LATEST.") && !name.contains("tmp"))
          name.stripPrefix("_LATEST.").toLongOption.map(_ -> p)
        else None
      }

  private def readPointer(p: Path): Long = {
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](256)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toString("UTF-8").trim.toLong
    } finally in.close()
  }

  def latestVersion: Option[Long] = {
    val seqs = pointerSeqs()
    if (seqs.nonEmpty) Some(readPointer(seqs.maxBy(_._1)._2))
    else if (fs.exists(latestPtr)) Some(readPointer(latestPtr))
    else None
  }

  def exists: Boolean = latestVersion.isDefined

  def read(): DataFrame = latestVersion match {
    case Some(n) => readVersion(n)
    case None => throw new IllegalStateException(s"no published snapshot at $root")
  }

  def readVersion(n: Long): DataFrame =
    spark.read.parquet(snapDir(n).toString)

  /** Change-data-feed between two published snapshots (Iceberg changelog /
    * Delta CDF analog): keyed insert/update/delete rows, computed from the
    * immutable snapshot dirs via [[graft.ops.ScdOps.snapshotDiff]]. */
  def diffVersions(from: Long, to: Long, keyCols: Seq[String]): DataFrame =
    graft.ops.ScdOps.snapshotDiff(readVersion(from), readVersion(to), keyCols)

  /** Write a new immutable snapshot without publishing (the W of WAP).
    * Version allocation skips past STAGED-but-unpublished snapshots too
    * (not just the published pointer), so consecutive stages — e.g. a
    * [[TableSetRef]] catalog promoting several generations before any
    * commit — never clobber each other's immutable dirs. */
  def stage(df: DataFrame, partitionBy: Seq[String] = Nil): Long = {
    val staged =
      if (!fs.exists(rootPath)) Nil
      else fs.listStatus(rootPath).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("snapshot="))
        .flatMap(_.stripPrefix("snapshot=").toLongOption)
    val next = (staged ++ latestVersion.toSeq :+ 0L).max + 1
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(snapDir(next).toString)
    next
  }

  /** Atomically repoint the table to snapshot n (the P of WAP). Writes a
    * fresh `_LATEST.<seq>` pointer (never deletes-then-recreates), so
    * concurrent readers always observe SOME published pointer. Older
    * pointers beyond the newest few are garbage-collected best-effort —
    * the max-seq pointer is never deleted. */
  def publish(n: Long): Unit = {
    require(fs.exists(snapDir(n)), s"snapshot $n not staged at $root")
    val seqs = pointerSeqs()
    val next = (seqs.map(_._1) :+ 0L).max + 1
    val tmp = new Path(rootPath, s"_LATEST_tmp${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(rootPath, s"_LATEST.$next")))
      throw new IllegalStateException(s"pointer swap failed for $root -> $n")
    // migrate away from a legacy bare _LATEST, then GC stale seq pointers
    // (keep the newest 4 so in-flight readers that already listed still
    // find their file)
    if (fs.exists(latestPtr)) fs.delete(latestPtr, false)
    seqs.sortBy(-_._1).drop(3).foreach { case (_, p) => fs.delete(p, false) }
  }

  /** stage + publish in one step (non-audited write). */
  def overwrite(df: DataFrame, partitionBy: Seq[String] = Nil): Long = {
    val n = stage(df, partitionBy)
    publish(n)
    n
  }

  /** Merge-upsert (reference K3, `incremental_strategy='merge'` /
    * `unique_key`): latest version of each key wins, updates beating
    * existing rows on order-ties. Idempotent — re-merging the same updates
    * produces identical content. Returns the published version. */
  def merge(updates: DataFrame, keys: Seq[String], orderCols: Seq[Column],
            partitionBy: Seq[String] = Nil): Long = {
    val merged = mergedFrame(updates, keys, orderCols)
    val n = stage(merged, partitionBy)
    publish(n)
    n
  }

  /** Merge with audit hook: stages the merged snapshot, runs `audit` on it,
    * publishes only if audit passes (full WAP loop). */
  def mergeAudited(updates: DataFrame, keys: Seq[String], orderCols: Seq[Column],
                   audit: DataFrame => Boolean,
                   partitionBy: Seq[String] = Nil): Option[Long] = {
    val merged = mergedFrame(updates, keys, orderCols)
    val n = stage(merged, partitionBy)
    if (audit(readVersion(n))) { publish(n); Some(n) }
    else { fs.delete(snapDir(n), true); None }
  }

  private def mergedFrame(updates: DataFrame, keys: Seq[String],
                          orderCols: Seq[Column]): DataFrame = {
    val upd = updates.withColumn("__src", lit(1))
    val base = latestVersion match {
      case Some(_) =>
        // schema evolution: columns new in `updates` appear (NULL for
        // existing rows); columns dropped from `updates` persist (NULL for
        // new rows) — additive evolution, Iceberg-style, no rewrite of old
        // data semantics
        read().withColumn("__src", lit(0))
          .unionByName(upd, allowMissingColumns = true)
      case None => upd
    }
    Debezium.latestPerKey(base, keys, orderCols :+ col("__src")).drop("__src")
  }

  /** Compact the published snapshot into ~`targetRowsPerFile`-row files —
    * the small-files remedy for streaming/merge-heavy tables (a 100 TB
    * table fed by micro-batches degrades into millions of tiny parquet
    * files; scan cost is per-file). Writes a new snapshot, preserving
    * history.
    *
    * `clusterBy` additionally range-partitions and sorts the rewrite on
    * the given columns (the OPTIMIZE ... ZORDER analog for the
    * single-key case): each output file then covers a narrow, mostly
    * non-overlapping key range, so parquet footer min/max statistics let
    * a selective scan skip whole files/row-groups — the layout
    * investment that turns "scan 100 TB" into "scan the 3 files that
    * can contain the key". Non-overlap is asserted in
    * SnapshotTableSpec. */
  def compact(targetRowsPerFile: Long = 1000000L,
              partitionBy: Seq[String] = Nil,
              clusterBy: Seq[Column] = Nil,
              zorderBy: Seq[String] = Nil,
              zorderBits: Int = 6): Long = {
    require(clusterBy.isEmpty || zorderBy.isEmpty,
      "clusterBy and zorderBy are mutually exclusive layouts")
    val df = read()
    val rows = df.count()
    val files = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val laid =
      if (zorderBy.nonEmpty) {
        // multi-column skipping: files cover hyper-rectangles, not ranges
        val bounds = zorderBy.map(c => ZOrder.boundsFor(df, c, zorderBits))
        val z = ZOrder.zvalue(zorderBy.map(col).zip(bounds), zorderBits)
        df.withColumn("__z", z)
          .repartitionByRange(files, col("__z"))
          .sortWithinPartitions(col("__z"))
          .drop("__z")
      } else if (clusterBy.isEmpty) df.repartition(files)
      else df.repartitionByRange(files, clusterBy: _*)
        .sortWithinPartitions(clusterBy: _*)
    val n = stage(laid, partitionBy)
    publish(n)
    n
  }

  /** Keep only the newest `retain` snapshots (the published one always
    * survives) — bounded time-travel history. */
  def expireSnapshots(retain: Int): Unit = latestVersion.foreach { cur =>
    val st = fs.listStatus(rootPath)
    st.filter(s => s.isDirectory && s.getPath.getName.startsWith("snapshot="))
      .map(s => s.getPath.getName.stripPrefix("snapshot=").toLong)
      .sorted.reverse.drop(retain)
      .filter(_ != cur)
      .foreach(v => fs.delete(snapDir(v), true))
  }

  /** Scale path for huge date-partitioned tables: rewrite ONLY the
    * partitions that contain updated keys, via dynamic partition overwrite
    * into a stable (non-snapshot) data dir. Reads back just the affected
    * partitions (partition pruning), merges, overwrites those partitions.
    * No snapshot history — bounded IO instead. */
  def mergeInPlaceByPartition(updates: DataFrame, keys: Seq[String],
                              orderCols: Seq[Column], partCol: String): Unit = {
    val dataDir = new Path(rootPath, "data").toString
    val exists = fs.exists(new Path(dataDir))
    val merged = if (!exists) {
      Debezium.latestPerKey(updates, keys, orderCols)
    } else {
      val parts = updates.select(partCol).distinct()
      val affected = spark.read.parquet(dataDir)
        .join(broadcast(parts), Seq(partCol), "left_semi") // partition-pruned scan
        .withColumn("__src", lit(0))
      Debezium.latestPerKey(
        affected.unionByName(updates.withColumn("__src", lit(1))),
        keys, orderCols :+ col("__src")).drop("__src")
    }
    merged.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(dataDir)
  }

  /** dbt `incremental_strategy='insert_overwrite'`: the batch's partitions
    * REPLACE the table's same partitions in the stable data dir (dynamic
    * partition overwrite); untouched partitions are not read or written.
    * No key matching — the batch is the new truth for every partition it
    * contains. Rewrite IO is proportional to the touched partitions, the
    * right shape when a 100 TB table takes daily partition refreshes; the
    * trade is no snapshot history for this table (same contract as
    * [[mergeInPlaceByPartition]]). */
  def insertOverwritePartitions(df: DataFrame, partCol: String): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol)
      .parquet(new Path(rootPath, "data").toString)

  /** Whether the stable (non-snapshot) data dir has been written — the
    * existence test for in-place tables, as [[exists]] is for published
    * snapshots. */
  def existsInPlace: Boolean = fs.exists(new Path(rootPath, "data"))

  def readInPlace(): DataFrame =
    spark.read.parquet(new Path(rootPath, "data").toString)

  /** Roll back to an earlier retained snapshot — WAP's undo: the pointer
    * swap is the same atomic publish, no data movement. */
  def rollback(to: Long): Unit = publish(to)

  /** Table history from filesystem METADATA alone — no data read: one
    * row per retained snapshot (published or staged-only) with file
    * count, byte size, and last-modified time. The `DESCRIBE HISTORY`
    * analog; time travel targets come from here
    * (`readVersion`/`rollback`/`diffVersions`). */
  def history(): DataFrame = {
    val sp = spark
    import sp.implicits._
    val cur = latestVersion
    val rows = fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("snapshot="))
      .map { s =>
        val v = s.getPath.getName.stripPrefix("snapshot=").toLong
        var nFiles = 0L; var bytes = 0L; var modified = 0L
        val it = fs.listFiles(s.getPath, true)
        while (it.hasNext) {
          val f = it.next()
          nFiles += 1; bytes += f.getLen
          modified = math.max(modified, f.getModificationTime)
        }
        (v, cur.contains(v), nFiles, bytes, modified)
      }
      .sortBy(_._1)
    rows.toDF("version", "is_current", "n_files", "size_bytes",
      "modified_ms")
  }

  /** Drop all snapshots older than the published one. */
  def vacuum(): Unit = latestVersion.foreach { keep =>
    val st = fs.listStatus(rootPath)
    st.filter(s => s.isDirectory && s.getPath.getName.startsWith("snapshot=") &&
        s.getPath.getName.stripPrefix("snapshot=").toLong != keep)
      .foreach(s => fs.delete(s.getPath, true))
  }
}
