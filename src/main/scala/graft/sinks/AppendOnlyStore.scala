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
  *   <root>/data.G/prefix=XX/part-*.parquet   generation G's own files
  *   <root>/_MANIFEST.G                       prefix → prior-generation
  *                                            prefix dirs referenced
  *                                            IN PLACE (no copy)
  *   <root>/_GEN.<seq>                        pointer files: max seq wins
  * }}}
  * `prefix` is the first `prefixChars` hex chars of the key (default 2 →
  * 256 stable partitions, sized for stores in the 10⁹-row class; use 1 →
  * 16 for small/medium stores where per-file constant costs dominate), so
  * compaction can rewrite one prefix at a time and reads could prune.
  *
  * Compaction swaps GENERATIONS behind the same pointer protocol
  * SnapshotTable's publish uses: the compacted rewrite of the DIRTY
  * prefixes lands in a fresh `data.(G+1)` directory, every clean
  * prefix's existing directory is referenced in place by the new
  * generation's manifest (ZERO data bytes read, moved, or copied —
  * steady-state compaction IO is ingest-proportional, never
  * state-proportional), a new pointer file makes the generation
  * current, and the files generation G resolved are retained until the
  * NEXT compaction — so a reader pinned to a pre-compaction listing
  * keeps streaming files that still exist. Appends are single-writer by
  * contract (one ingesting pipeline per store), matching every
  * incremental-dedup call site; concurrent READERS are safe at any
  * point.
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

  // ------------------------------------------- generation manifest
  // A generation's logical contents = its own data.G files PLUS every
  // prefix directory its manifest references in a PRIOR generation's
  // directory. Compaction writes only the dirty prefixes and carries
  // the clean ones by reference — the zero-copy posture that keeps
  // compaction IO ∝ ingest while accumulated state grows unbounded.
  // References are resolved flat at manifest-write time (a referenced
  // dir is always a physical directory, never another reference), so
  // reads are one level deep regardless of generation count.

  private def manifestPath(g: Long) = new Path(rootPath, s"_MANIFEST.$g")

  /** Prefix-dir references of generation `g` (possibly several physical
    * dirs per prefix when `maxFilesUntouched` > 1 left a clean prefix's
    * files split across generations). */
  private def manifestRefs(g: Long): Seq[(String, Path)] = {
    val p = manifestPath(g)
    if (!fs.exists(p)) Nil
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in).mkString
                 finally in.close()
      text.linesIterator.filter(_.nonEmpty).map { line =>
        val i = line.indexOf('\t')
        line.substring(0, i) -> new Path(line.substring(i + 1))
      }.toSeq
    }
  }

  private def writeManifest(g: Long, refs: Seq[(String, Path)]): Unit = {
    val tmp = new Path(rootPath, s"_MANIFEST_tmp${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(refs.sortBy(r => (r._1, r._2.toString))
      .map { case (n, d) => s"$n\t$d" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, manifestPath(g)))
      throw new IllegalStateException(s"manifest publish failed at $root")
  }

  private def listParquet(dir: Path): Seq[String] = {
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

  private def prefixDirsUnder(dir: Path): Seq[Path] =
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("prefix="))

  /** Every physical prefix directory generation `g` resolves (its own
    * plus manifest references) — the retention unit for GC. */
  private def referencedPrefixDirs(g: Long): Set[String] =
    (prefixDirsUnder(genDir(g)).map(_.toString) ++
      manifestRefs(g).map(_._2.toString)).toSet

  /** Read a resolved file set with partition-column (`prefix=XX`)
    * inference intact: one basePath per physical generation dir,
    * unioned. */
  private def readFiles(files: Seq[String]): DataFrame =
    files.groupBy(f => new Path(f).getParent.getParent)
      .toSeq.sortBy(_._1.toString)
      .map { case (base, fsq) =>
        spark.read.option("basePath", base.toString).parquet(fsq: _*)
      }
      .reduce(_.unionByName(_))

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
  def read(): DataFrame = readAt(dataFiles())

  /** The store's current physical file listing — the pin unit for
    * cross-store consistent reads ([[StoreSetRef]]). Stable only under
    * the store's single-writer contract (record it between batches). */
  def fileListing(): Seq[String] = dataFiles()

  /** A READ-ONLY view pinned to an explicit file listing (normally one
    * a [[StoreSetRef]] committed): `read()`/`exists` resolve exactly
    * those files regardless of appends or compactions since — pinned
    * files survive one subsequent compaction, the same retention
    * [[read]]'s own snapshot isolation rests on. Every read-side
    * consumer ([[graft.ops.IncrementalAgg.current]], BM25, CC labels,
    * join-state folds) takes the store handle, so a pinned view slots
    * into any of them unchanged. Mutations raise. */
  def pinned(files: Seq[String]): AppendOnlyStore = {
    val outer = this
    new AppendOnlyStore(spark, root, prefixCol, prefixChars) {
      override def read(): DataFrame = outer.readAt(files)
      override def exists: Boolean = files.nonEmpty
      override def append(df: DataFrame): Unit =
        throw new UnsupportedOperationException(
          s"pinned view of $root is read-only")
      override def compactWith(fold: DataFrame => DataFrame,
                               maxFilesUntouched: Int): Unit =
        throw new UnsupportedOperationException(
          s"pinned view of $root is read-only")
    }
  }

  private[sinks] def readAt(files: Seq[String]): DataFrame = {
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
    } else readFiles(files)
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
    * fold → shuffle → write); every other prefix is carried by
    * REFERENCE — the new generation's manifest points at the clean
    * prefix's existing directory in place, so ZERO data-file bytes are
    * read, copied, or moved for untouched state (GenerationManifestSpec
    * gates exactly that). A prefix folded once stays a single file
    * until new appends touch it, so steady-state compaction cost is
    * proportional to the ingest since the last quiescence window, not
    * to accumulated store size — at 100 TB the difference between a
    * bounded maintenance op and a full-store transfer through one JVM.
    * Correctness needs no full fold: every consumer's read path already
    * folds/dedups lazily (that is what makes appends cheap), so leaving
    * a single-file prefix unfolded is result-invariant by the store
    * contract. A store whose every prefix is already compact no-ops
    * entirely — no new generation, no pointer churn.
    *
    * Superseded files (the pre-fold files of dirty prefixes) are
    * retained until the NEXT compaction, exactly the old retention
    * contract: a reader pinned to the outgoing generation's listing
    * keeps every file it resolved through one concurrent compaction.
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
    // group the RESOLVED file set (own + referenced) by prefix name
    val byPrefix = dataFiles().map(new Path(_))
      .groupBy(_.getParent.getName)
    val dirty = byPrefix.filter(_._2.size > maxFilesUntouched).keySet
    if (dirty.isEmpty) return // fully compact already: generation stands
    val clean = byPrefix.keySet -- dirty
    val dirtyFiles = byPrefix.filter(kv => dirty.contains(kv._1))
      .values.flatten.map(_.toString).toSeq
    fold(readFiles(dirtyFiles))
      .withColumn("prefix", substring(col(prefixCol), 1, prefixChars))
      .repartition(col("prefix"))
      .write.mode("overwrite").partitionBy("prefix")
      .parquet(genDir(next).toString)
    // clean prefixes: referenced in place, resolved flat (the reference
    // target is always the physical directory holding the files, never
    // a chain through intermediate manifests)
    if (clean.nonEmpty)
      writeManifest(next, clean.toSeq.flatMap { p =>
        byPrefix(p).map(_.getParent).distinct.map(d => p -> d)
      })
    publishGen(next)
    gcSuperseded(cur, next)
  }

  /** Delete physical prefix directories no generation ≥ `cur` resolves:
    * the outgoing generation `cur` keeps everything it referenced (the
    * pinned-reader retention window), `next` keeps its own; anything
    * older and unreferenced is superseded twice over and goes. */
  private def gcSuperseded(cur: Long, next: Long): Unit = {
    val keep = referencedPrefixDirs(cur) ++ referencedPrefixDirs(next)
    val gens = fs.listStatus(rootPath).toSeq.map(_.getPath).flatMap { p =>
      val n = p.getName
      if (n == "data") Some(0L -> p)
      else if (n.startsWith("data.") && !n.contains("tmp"))
        n.stripPrefix("data.").toLongOption.map(_ -> p)
      else None
    }
    gens.filter(_._1 < cur).foreach { case (_, dir) =>
      prefixDirsUnder(dir).foreach { pd =>
        if (!keep.contains(pd.toString)) fs.delete(pd, true)
      }
      if (prefixDirsUnder(dir).isEmpty) fs.delete(dir, true)
    }
    // manifests of generations older than the retention window are
    // never read again (resolution is flat; GC keys on cur/next only)
    fs.listStatus(rootPath).toSeq.map(_.getPath).foreach { p =>
      val n = p.getName
      if (n.startsWith("_MANIFEST.") && !n.contains("tmp") &&
          n.stripPrefix("_MANIFEST.").toLongOption.exists(_ < cur))
        fs.delete(p, false)
    }
  }

  /** Data files the CURRENT generation resolves — its own plus every
    * manifest-referenced prefix directory (for append-only assertions
    * and the read path). */
  def dataFiles(): Seq[String] = {
    val g = currentGen
    listParquet(genDir(g)) ++
      manifestRefs(g).flatMap { case (_, d) => listParquet(d) }
  }
}
