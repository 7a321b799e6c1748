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
  *   <root>/_LATEST              pointer file containing N
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

  def latestVersion: Option[Long] = {
    if (!fs.exists(latestPtr)) None
    else {
      val in = fs.open(latestPtr)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](256)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(buf.toString("UTF-8").trim.toLong)
      } finally in.close()
    }
  }

  def exists: Boolean = latestVersion.isDefined

  def read(): DataFrame = latestVersion match {
    case Some(n) => readVersion(n)
    case None => throw new IllegalStateException(s"no published snapshot at $root")
  }

  def readVersion(n: Long): DataFrame =
    spark.read.parquet(snapDir(n).toString)

  /** Write a new immutable snapshot without publishing (the W of WAP). */
  def stage(df: DataFrame, partitionBy: Seq[String] = Nil): Long = {
    val next = latestVersion.getOrElse(0L) + 1
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(snapDir(next).toString)
    next
  }

  /** Atomically repoint _LATEST to snapshot n (the P of WAP). */
  def publish(n: Long): Unit = {
    require(fs.exists(snapDir(n)), s"snapshot $n not staged at $root")
    val tmp = new Path(rootPath, s"_LATEST.tmp${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(n.toString.getBytes("UTF-8")) finally out.close()
    // rename over the old pointer: atomic on HDFS/local; on S3 a small-file
    // PUT — last-writer-wins, still a single-object swap.
    if (fs.exists(latestPtr)) fs.delete(latestPtr, false)
    if (!fs.rename(tmp, latestPtr))
      throw new IllegalStateException(s"pointer swap failed for $root -> $n")
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
    * history. */
  def compact(targetRowsPerFile: Long = 1000000L,
              partitionBy: Seq[String] = Nil): Long = {
    val df = read()
    val rows = df.count()
    val files = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    val n = stage(df.repartition(files), partitionBy)
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

  def readInPlace(): DataFrame =
    spark.read.parquet(new Path(rootPath, "data").toString)

  /** Roll back to an earlier retained snapshot — WAP's undo: the pointer
    * swap is the same atomic publish, no data movement. */
  def rollback(to: Long): Unit = publish(to)

  /** Drop all snapshots older than the published one. */
  def vacuum(): Unit = latestVersion.foreach { keep =>
    val st = fs.listStatus(rootPath)
    st.filter(s => s.isDirectory && s.getPath.getName.startsWith("snapshot=") &&
        s.getPath.getName.stripPrefix("snapshot=").toLong != keep)
      .foreach(s => fs.delete(s.getPath, true))
  }
}
