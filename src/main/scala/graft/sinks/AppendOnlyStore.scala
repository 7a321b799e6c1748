package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only, hash-prefix-partitioned parquet store — the scale-correct
  * home for cross-batch dedup state (corpus fingerprints, LSH bucket
  * keys, seen-ID sets).
  *
  * The contract a 100 TB incremental pipeline needs and a snapshot table
  * cannot give it: per-batch write IO proportional to the BATCH, not the
  * accumulated store. `append` adds new parquet files under existing
  * prefix partitions and never touches prior files; a snapshot-table
  * `overwrite(read().union(new))` rewrites the entire store every batch —
  * at 10⁹ accumulated fingerprints that is a ~40 GB read+write per
  * micro-batch, growing forever (the round-1 scale blocker).
  *
  * Layout:
  * {{{
  *   <root>/data.G/prefix=XX/part-*.parquet   generation G's files
  *   <root>/_GEN.<seq>                        pointer files: max seq wins
  * }}}
  * `prefix` is the first `prefixChars` hex chars of the key (default 2 →
  * 256 stable partitions, sized for stores in the 10⁹-row class; use 1 →
  * 16 for small/medium stores where per-file constant costs dominate), so
  * compaction can rewrite one prefix at a time and reads could prune.
  *
  * Compaction swaps GENERATIONS behind the same pointer protocol
  * SnapshotTable's publish uses: the compacted rewrite lands in a fresh
  * `data.(G+1)` directory, a new pointer file makes it current, and
  * generation G's files are retained until the NEXT compaction — so a
  * reader pinned to a pre-compaction listing keeps streaming files that
  * still exist (the round-1 formulation renamed-and-deleted the live
  * directory under such readers). Appends are single-writer by contract
  * (one ingesting pipeline per store), matching every incremental-dedup
  * call site; concurrent READERS are safe at any point.
  *
  * Crash semantics: an interrupted append can leave a batch's files
  * partially committed. For dedup state this is benign — duplicate
  * fingerprint rows only over-suppress nothing (anti-join semantics are
  * set semantics), and a replayed batch re-appends rows that are
  * duplicates in the store, not in the corpus. An interrupted compact
  * leaves an unpublished `data.G+1`, which the next compact overwrites.
  */
class AppendOnlyStore(spark: SparkSession, root: String,
                      prefixCol: String = "fingerprint",
                      prefixChars: Int = 2) {

  private val rootPath = new Path(root)
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  // legacy un-generationed layout (round-1 stores): honored as generation 0
  private val legacyDir = new Path(rootPath, "data")

  private def pointerSeqs(): Seq[(Long, Path)] =
    if (!fs.exists(rootPath)) Nil
    else fs.listStatus(rootPath).toSeq.map(_.getPath).flatMap { p =>
      val name = p.getName
      if (name.startsWith("_GEN.") && !name.contains("tmp"))
        name.stripPrefix("_GEN.").toLongOption.map(_ -> p)
      else None
    }

  private def readPointer(p: Path): Long = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in).mkString.trim.toLong
    finally in.close()
  }

  private def currentGen: Long = {
    val seqs = pointerSeqs()
    if (seqs.nonEmpty) readPointer(seqs.maxBy(_._1)._2) else 0L
  }

  private def genDir(g: Long): Path =
    if (g == 0L && fs.exists(legacyDir)) legacyDir
    else new Path(rootPath, s"data.$g")

  private def publishGen(g: Long): Unit = {
    val next = (pointerSeqs().map(_._1) :+ 0L).max + 1
    val tmp = new Path(rootPath, s"_GEN_tmp${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(g.toString.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new Path(rootPath, s"_GEN.$next")))
      throw new IllegalStateException(s"generation pointer swap failed at $root")
  }

  def exists: Boolean = dataFiles().nonEmpty

  /** True once anything was ever appended (schema recorded) — stays true
    * after a full retraction empties the data files. */
  def hasSchema: Boolean = fs.exists(schemaPath)

  /** The session this store was opened under (for callers synthesizing
    * empty frames before the first append). */
  def session: SparkSession = spark

  /** The store's root directory (for plan assertions over serve paths). */
  def location: String = root

  // ------------------------------------------- applied-batch manifest
  // Same design as IncrementalJoin's side manifest: a batch id gains a
  // `.started` marker before its data lands and a `.done` marker after,
  // under `<root>/_applied` — OUTSIDE the generation directories, so
  // compaction's generation swap never disturbs it. `.done` makes a
  // replay of a COMMITTED batch a physical no-op even after compaction
  // has folded its rows into Compacted stamps (where the read-side
  // (key, batch_id) dedup could no longer catch it); a `.started`
  // without `.done` is a mid-write crash whose retry re-appends rows
  // that the read/compaction dedup absorbs — but only so long as no
  // compaction intervenes, which is why [[compactWith]] refuses while
  // any batch is in flight.

  private def appliedDir = new Path(rootPath, "_applied")
  private def marker(name: String) = new Path(appliedDir, name)
  private def touchMarker(name: String): Unit = {
    fs.mkdirs(appliedDir)
    val o = fs.create(marker(name), true); o.close()
  }

  /** True iff `batchId` committed fully (its replay must be a no-op). */
  def hasApplied(batchId: Long): Boolean =
    fs.exists(marker(s"$batchId.done"))

  /** Batch ids with a `.started` marker but no `.done` twin. */
  def inFlightBatches: Seq[String] = {
    if (!fs.exists(appliedDir)) return Nil
    val names = fs.listStatus(appliedDir).toSeq.map(_.getPath.getName)
    val done = names.filter(_.endsWith(".done"))
      .map(_.stripSuffix(".done")).toSet
    names.filter(_.endsWith(".started"))
      .map(_.stripSuffix(".started")).filterNot(done.contains).sorted
  }

  /** [[append]] under the manifest: exactly-once per `batchId` across
    * crash-replays, compactions included. Returns false for a committed
    * replay (nothing written). Single-writer, like all store writes. */
  def appendOnce(df: DataFrame, batchId: Long): Boolean = {
    if (hasApplied(batchId)) return false
    touchMarker(s"$batchId.started")
    append(df)
    touchMarker(s"$batchId.done")
    true
  }

  /** Full store scan (anti-join / probe side of incremental dedup).
    * Read-only: the per-batch cost is one scan of ~fixed-width rows,
    * never a write.
    *
    * Snapshot-isolated: pinned to the file listing at call time, so a
    * lazy plan built over this frame is unaffected by files appended
    * later — in particular, a batch's anti-join never sees the batch's
    * OWN fingerprints when the plan re-evaluates after `append` — and
    * survives one concurrent compaction (the superseded generation's
    * files are retained until the following one). */
  def read(): DataFrame = {
    val dir = genDir(currentGen)
    val files = dataFiles()
    if (files.isEmpty) {
      // A store whose every row was retracted (signed IVM) compacts to
      // ZERO data files — a legal state a serve path must still read.
      // The schema recorded at first append types the empty frame;
      // spark.read.parquet() with no files cannot infer one.
      require(fs.exists(schemaPath),
        s"store $root is empty and has no recorded schema — nothing " +
          "was ever appended")
      val in = fs.open(schemaPath)
      val json = try scala.io.Source.fromInputStream(in).mkString
                 finally in.close()
      val schema = org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    } else spark.read.option("basePath", dir.toString).parquet(files: _*)
  }

  private def schemaPath = new Path(rootPath, "_schema.json")

  /** Record the read-side schema once (data columns + the `prefix`
    * partition column, typed string) so [[read]] stays well-typed after
    * a full retraction empties the store. */
  private def recordSchema(df: DataFrame): Unit =
    if (!fs.exists(schemaPath)) {
      val o = fs.create(schemaPath, true)
      try o.write(df.schema.json.getBytes("UTF-8")) finally o.close()
    }

  /** Append a batch: writes ONLY the batch's own files. The batch is
    * clustered on the prefix before the write — one batch-sized shuffle —
    * so each task writes a handful of files instead of every task
    * touching every prefix (unclustered, an N-task batch appends up to
    * N×256 near-empty files; measured ~10× slower on the subsequent
    * store scans than the shuffle it saves). */
  def append(df: DataFrame): Unit = {
    val withPrefix =
      df.withColumn("prefix", substring(col(prefixCol), 1, prefixChars))
    recordSchema(withPrefix)
    withPrefix.repartition(col("prefix"))
      .write.mode("append").partitionBy("prefix").parquet(genDir(currentGen).toString)
  }

  /** Compact the store into ~1 file per prefix partition (the small-files
    * remedy for micro-batch appends), also dropping duplicate rows a
    * crash-replay may have appended. Writes a NEW generation and retires
    * the one before the previous — readers pinned to the outgoing
    * generation keep their files until the next compact. */
  def compact(): Unit = compactWith(_.dropDuplicates(prefixCol))

  /** [[compact]] with a caller-supplied fold applied to the store
    * contents before the rewrite — e.g. re-aggregating partial-aggregate
    * rows down to one per key ([[graft.ops.IncrementalAgg]]) instead of
    * the dedup-state default `dropDuplicates`. The fold must preserve the
    * `prefixCol` column and the store's row semantics (folding rows of a
    * key into fewer rows of the same key is fine; moving rows across
    * `prefixCol` values is not).
    *
    * INCREMENTAL per-prefix compaction: only prefixes holding more than
    * `maxFilesUntouched` files are folded through the cluster (read →
    * fold → shuffle → write); every other prefix's directory is copied
    * into the new generation verbatim at the storage layer — no decode,
    * no shuffle, no executor compute. A prefix folded once stays a
    * single file until new appends touch it, so steady-state compaction
    * cost is proportional to the ingest since the last quiescence
    * window, not to accumulated store size (the same posture as
    * [[graft.ops.IncrementalJoin.compactSides]]' `__bg` rewrites; at
    * 100 TB the copy is a storage-layer transfer — on S3 a server-side
    * COPY — while the old full fold was a full-store decode+shuffle).
    * Correctness needs no full fold: every consumer's read path already
    * folds/dedups lazily (that is what makes appends cheap), so leaving
    * a single-file prefix unfolded is result-invariant by the store
    * contract. A store whose every prefix is already compact no-ops
    * entirely — no new generation, no pointer churn.
    *
    * The fold operates per key and keys never cross prefixes, so
    * restricting its input to the dirty prefixes cannot change what it
    * computes for them. */
  def compactWith(fold: DataFrame => DataFrame,
                  maxFilesUntouched: Int = 1): Unit = {
    // folding a crashed (started-but-uncommitted) batch's rows into the
    // compacted stamps would break the retry's (key, batch_id) dedup —
    // same refusal as IncrementalJoin.requireQuiescent
    val inFlight = inFlightBatches
    require(inFlight.isEmpty,
      s"refusing to compact $root: batches started but never committed " +
        s"(${inFlight.mkString(", ")}) — retry them to completion first")
    val cur = currentGen
    val next = cur + 1
    val curDir = genDir(cur)
    // group the current generation's files by their prefix directory
    val byPrefix = dataFiles().map(new Path(_))
      .groupBy(_.getParent.getName)
    val dirty = byPrefix.filter(_._2.size > maxFilesUntouched).keySet
    if (dirty.isEmpty) return // fully compact already: generation stands
    val clean = byPrefix.keySet -- dirty
    val dirtyFiles = byPrefix.filter(kv => dirty.contains(kv._1))
      .values.flatten.map(_.toString).toSeq
    val in = spark.read.option("basePath", curDir.toString)
      .parquet(dirtyFiles: _*)
    fold(in)
      .withColumn("prefix", substring(col(prefixCol), 1, prefixChars))
      .repartition(col("prefix"))
      .write.mode("overwrite").partitionBy("prefix")
      .parquet(genDir(next).toString)
    // Carrying clean prefixes into the new generation is a CLIENT-SIDE
    // byte copy (FileUtil.copy streams through this JVM) — NOT a
    // server-side COPY; a rename is not an option because the outgoing
    // generation must keep its files until the NEXT compaction for
    // pinned readers. The copies are independent per prefix directory,
    // so they run on a thread pool: wall-clock is the largest prefix,
    // not the sum. On an object store, swap the copy lambda for the
    // store's server-side COPY (S3 CopyObject) or a generation manifest
    // that references prior-generation directories in place — the
    // steady-state DATA cost is already ingest-proportional (clean
    // prefixes are one already-folded file); this transfer is the
    // remaining term, bounded by accumulated state size.
    if (clean.nonEmpty) {
      val conf = spark.sparkContext.hadoopConfiguration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(16, clean.size))
      try {
        val tasks = clean.toSeq.sorted.map { p =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            override def call(): Unit = {
              val ok = org.apache.hadoop.fs.FileUtil.copy(
                fs, new Path(curDir, p), fs, new Path(genDir(next), p),
                false, true, conf)
              if (!ok) throw new IllegalStateException(
                s"per-prefix compaction: copying untouched prefix $p " +
                  s"into generation $next failed at $root")
            }
          })
        }
        tasks.foreach(_.get()) // propagate the first failure
      } finally pool.shutdown()
    }
    publishGen(next)
    val stale = genDir(cur - 1) // resolves to the legacy dir for gen 0
    if (cur > 0 && fs.exists(stale)) fs.delete(stale, true)
  }

  /** Data files in the CURRENT generation (for append-only assertions). */
  def dataFiles(): Seq[String] = {
    val dir = genDir(currentGen)
    if (!fs.exists(dir)) return Nil
    val it = fs.listFiles(dir, true)
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        buf += f.getPath.toString
    }
    buf.toSeq
  }
}
