package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.ops.{IncrementalFullOuterJoin, IncrementalJoin, IncrementalOuterJoin}

/** Streaming maintenance twin for [[graft.ops.IncrementalJoin]] — the
  * join member of the `maintain*AvailableNow` family (aggregates,
  * distinct sketches, heavy hitters, quantiles, set overlap).
  *
  * Each side of the join is a file-stream directory (the CDC-topic twin
  * this engine uses everywhere a broker would sit). A drain runs the
  * side's new files through `AvailableNow` micro-batches; every batch
  * applies one Δ-rule append — delta ⋈ other-side state — so stream-side
  * work per batch is batch-sized, and the maintained join is read (and
  * compacted) OFF the hot path, exactly like the agg stores.
  *
  * Sides drain SEQUENTIALLY, not concurrently: all three stores are
  * single-writer (the engine-wide store contract), and the Δ-rule
  * guarantees the final multiset is interleaving-invariant, so
  * serializing the drains loses nothing but latency. Batch ids are
  * namespaced per side (`rightIdOffset`) because the two checkpoints
  * both count from zero; a crash-replayed micro-batch re-applies the
  * same files under the same id and dedupes away inside the store
  * (IncrementalJoinSpec / q163 gate the replay path).
  *
  * Restart-resume is inherited from the file source: a second drain
  * against the same checkpoint processes ONLY files added since, with
  * continuing batch ids — append-to-a-side-and-refresh costs one delta
  * join, never a recompute (JoinStreamSpec gates this).
  */
object JoinStream {

  /** Default namespace distance between the two sides' batch-id spaces. */
  val RightIdOffset: Long = 1L << 32

  /** Drain one side's new files into the maintained join.
    *
    * @param parquetDir    the side's topic-dir of parquet files
    * @param schema        the side's row schema (file streams need it)
    * @param stores        the three IVM stores (see [[IncrementalJoin.stores]])
    * @param on            join-key column names (shared across sides)
    * @param isLeft        which Δ-rule this side applies
    * @param checkpointDir this side's OWN streaming checkpoint
    * @param idOffset      added to every micro-batch id — keep the two
    *                      sides' id spaces disjoint */
  def drainSideAvailableNow(spark: SparkSession, parquetDir: String,
                            schema: StructType,
                            stores: IncrementalJoin.Stores,
                            on: Seq[String], isLeft: Boolean,
                            checkpointDir: String,
                            idOffset: Long = 0L): Unit = {
    val q = spark.readStream.schema(schema).parquet(parquetDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (isLeft)
          IncrementalJoin.appendLeft(stores, batch, on, batchId + idOffset)
        else
          IncrementalJoin.appendRight(stores, batch, on, batchId + idOffset)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Drain left then right (sequential single-writer drains), returning
    * the maintained join multiset. `checkpointRoot` holds one checkpoint
    * per side, so repeated calls are incremental refreshes. */
  def maintainJoinAvailableNow(spark: SparkSession,
                               leftDir: String, leftSchema: StructType,
                               rightDir: String, rightSchema: StructType,
                               stores: IncrementalJoin.Stores,
                               on: Seq[String],
                               checkpointRoot: String): DataFrame = {
    drainSideAvailableNow(spark, leftDir, leftSchema, stores, on,
      isLeft = true, checkpointDir = s"$checkpointRoot/left")
    drainSideAvailableNow(spark, rightDir, rightSchema, stores, on,
      isLeft = false, checkpointDir = s"$checkpointRoot/right",
      idOffset = RightIdOffset)
    IncrementalJoin.current(stores)
  }

  /** [[drainSideAvailableNow]] for the LEFT OUTER variant: every
    * micro-batch applies [[IncrementalOuterJoin]]'s Δ-rule (inner pairs
    * + signed unmatched maintenance). Same checkpointing, same
    * batch-id-namespace contract, same replay story (the manifest makes
    * re-applied micro-batches no-ops). */
  def drainOuterSideAvailableNow(spark: SparkSession, parquetDir: String,
                                 schema: StructType,
                                 stores: IncrementalOuterJoin.Stores,
                                 on: Seq[String], isLeft: Boolean,
                                 checkpointDir: String,
                                 idOffset: Long = 0L): Unit = {
    val q = spark.readStream.schema(schema).parquet(parquetDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (isLeft)
          IncrementalOuterJoin.appendLeft(stores, batch, on, batchId + idOffset)
        else
          IncrementalOuterJoin.appendRight(stores, batch, on, batchId + idOffset)
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** LEFT OUTER twin of [[maintainJoinAvailableNow]]: drains both sides
    * through the outer Δ-rule and returns the maintained left-outer
    * multiset (unmatched lefts null-extended). The RIGHT side drains
    * FIRST so its schema lands before left rows decide their
    * matched/unmatched split — order is otherwise immaterial (the
    * signed-multiset rule is interleaving-invariant). A right topic
    * with no files yet yields no batches, so the read still requires at
    * least one drained right file ([[IncrementalOuterJoin.current]]'s
    * documented schema contract). */
  def maintainLeftOuterAvailableNow(spark: SparkSession,
                                    leftDir: String, leftSchema: StructType,
                                    rightDir: String, rightSchema: StructType,
                                    stores: IncrementalOuterJoin.Stores,
                                    on: Seq[String],
                                    checkpointRoot: String): DataFrame = {
    drainOuterSideAvailableNow(spark, rightDir, rightSchema, stores, on,
      isLeft = false, checkpointDir = s"$checkpointRoot/right",
      idOffset = RightIdOffset)
    drainOuterSideAvailableNow(spark, leftDir, leftSchema, stores, on,
      isLeft = true, checkpointDir = s"$checkpointRoot/left")
    IncrementalOuterJoin.current(stores)
  }

  /** FULL OUTER twin: both sides drain through
    * [[IncrementalFullOuterJoin]]'s symmetric signed Δ-rule. Both sides
    * need at least one drained file before the first read (both schemas
    * feed the null extensions). */
  def maintainFullOuterAvailableNow(spark: SparkSession,
                                    leftDir: String, leftSchema: StructType,
                                    rightDir: String, rightSchema: StructType,
                                    stores: IncrementalFullOuterJoin.Stores,
                                    on: Seq[String],
                                    checkpointRoot: String): DataFrame = {
    def drain(dir: String, schema: StructType, isLeft: Boolean,
              ckpt: String, idOffset: Long): Unit = {
      val q = spark.readStream.schema(schema).parquet(dir)
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          if (isLeft)
            IncrementalFullOuterJoin.appendLeft(stores, batch, on,
              batchId + idOffset)
          else
            IncrementalFullOuterJoin.appendRight(stores, batch, on,
              batchId + idOffset)
          ()
        }
        .start()
      q.awaitTermination()
    }
    drain(leftDir, leftSchema, isLeft = true,
      s"$checkpointRoot/left", idOffset = 0L)
    drain(rightDir, rightSchema, isLeft = false,
      s"$checkpointRoot/right", idOffset = RightIdOffset)
    IncrementalFullOuterJoin.current(stores)
  }

  /** Drain a Debezium envelope TOPIC (the `.jsonl` topic-twin layout,
    * same contract as [[CdcStream.ingestAvailableNow]]) into one side of
    * a maintained join as SIGNED deltas: every micro-batch maps its
    * envelopes through [[graft.sources.Debezium.signedDeltas]]
    * (c/r → +after, u → −before +after, d → −before) and applies one
    * signed Δ-rule append. This is the seam the reference's CDC models
    * lack — their raw layer DROPS deletes, so a takedown never reaches
    * downstream joins; here a delete wave flows through at delta cost
    * and [[IncrementalJoin.current]] nets it away exactly.
    *
    * Because signed deltas commute, the maintained multiset is invariant
    * to how the file source carves the backlog into micro-batches AND to
    * envelope arrival order across batches — replay safety comes from
    * the store's applied-batch-id manifest, exactly like the unsigned
    * drains. */
  def drainCdcSignedAvailableNow(spark: SparkSession, topicDir: String,
                                 rowSchema: StructType,
                                 stores: IncrementalJoin.Stores,
                                 on: Seq[String], isLeft: Boolean,
                                 checkpointDir: String,
                                 idOffset: Long = 0L,
                                 maxFilesPerTrigger: Option[Int] = None): Long = {
    var batches = 0L
    val q = CdcStream.readJsonlStream(spark, topicDir, maxFilesPerTrigger)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val signed = graft.sources.Debezium.signedDeltas(batch, rowSchema)
        if (isLeft)
          IncrementalJoin.appendLeftDelta(stores, signed, on,
            batchId + idOffset)
        else
          IncrementalJoin.appendRightDelta(stores, signed, on,
            batchId + idOffset)
        batches += 1
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }

  /** Drain a Debezium topic twin into a CHAINED IVM
    * ([[graft.ops.ChainedIvm]]): each micro-batch's signed deltas flow
    * through the join Δ-rule AND on into the downstream maintained
    * aggregate in one append — CDC topic → join MV → dashboard
    * aggregate, current end-to-end at delta cost per micro-batch.
    *
    * Exactly-once for the WHOLE chain rides the join's applied-batch-id
    * manifest: a checkpoint-replayed micro-batch re-presents the same
    * files under the same id and is a no-op before the downstream tap
    * fires (ChainedIvmSpec). Same commutativity argument as the
    * un-chained signed drain: the final chain state is invariant to the
    * file-to-micro-batch carving. */
  def drainCdcChainAvailableNow(spark: SparkSession, topicDir: String,
                                rowSchema: StructType,
                                chain: graft.ops.ChainedIvm.Stores,
                                isLeft: Boolean,
                                checkpointDir: String,
                                idOffset: Long = 0L,
                                maxFilesPerTrigger: Option[Int] = None): Long = {
    var batches = 0L
    val q = CdcStream.readJsonlStream(spark, topicDir, maxFilesPerTrigger)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val signed = graft.sources.Debezium.signedDeltas(batch, rowSchema)
        if (isLeft)
          graft.ops.ChainedIvm.appendLeftDelta(chain, signed,
            batchId + idOffset)
        else
          graft.ops.ChainedIvm.appendRightDelta(chain, signed,
            batchId + idOffset)
        batches += 1
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }

  /** Drain a Debezium topic twin into one LEAF of a maintained join
    * TREE ([[graft.ops.JoinTreeIvm]]): each micro-batch's signed deltas
    * cascade through every level the leaf can reach — and into the
    * tree's optional downstream aggregate — in one append. This is the
    * n-ary dashboard kept current from CDC topics: one topic per
    * source table, one drain per topic, delta cost per micro-batch at
    * every level.
    *
    * Exactly-once for the whole cascade rides the ENTRY level's
    * applied-batch-id manifest (JoinTreeIvmSpec): a checkpoint-replayed
    * micro-batch no-ops before its tap fires. Leaves drain
    * SEQUENTIALLY (single-writer store contract); the Δ-rule makes the
    * final state interleaving-invariant. Per-leaf micro-batch ids need
    * no offsets — the tree namespaces ids by leaf internally — but
    * distinct drains of the SAME leaf (restart-resume shares the
    * checkpoint, so this only matters for deliberate multi-topic
    * feeds) must keep `idOffset` spaces disjoint. That requirement is
    * ENFORCED, not just documented: each drain claims
    * `<treeRoot>/drains/leaf<leaf>_<ckptHash>` recording its idOffset,
    * and a second checkpoint claiming the same leaf at an
    * already-claimed offset fails fast — without the claim its batch
    * ids would collide with the first drain's in the entry manifest
    * and its data would be silently swallowed as replay no-ops. */
  def drainCdcTreeLeafAvailableNow(spark: SparkSession, topicDir: String,
                                   rowSchema: StructType,
                                   tree: graft.ops.JoinTreeIvm.Stores,
                                   leaf: Int,
                                   checkpointDir: String,
                                   idOffset: Long = 0L,
                                   maxFilesPerTrigger: Option[Int] = None,
                                   setRef: Option[graft.sinks.StoreSetRef] =
                                     None): Long = {
    claimLeafDrain(spark, tree, leaf, idOffset, checkpointDir)
    var batches = 0L
    val q = CdcStream.readJsonlStream(spark, topicDir, maxFilesPerTrigger)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val signed = graft.sources.Debezium.signedDeltas(batch, rowSchema)
        graft.ops.JoinTreeIvm.appendLeafDelta(tree, leaf, signed,
          batchId + idOffset)
        // the cascade committed every level + downstream store: publish
        // ONE cross-store ref so a reader pinning it never sees the
        // aggregate ahead of the multiset (or vice versa)
        setRef.foreach(_.commit())
        batches += 1
        ()
      }
      .start()
    q.awaitTermination()
    batches
  }

  /** Claim (leaf, idOffset) for one checkpoint under
    * `<treeRoot>/drains/` — a tiny persisted marker per (leaf,
    * checkpoint) pair. Resume under the SAME checkpoint re-reads its
    * own marker and proceeds; a DIFFERENT checkpoint claiming the same
    * leaf must present an idOffset no other checkpoint holds, because
    * two drains counting micro-batches from zero in one id space make
    * the second drain's batches collide with committed ids in the
    * tree's entry manifest — absorbed as exactly-once replay no-ops,
    * i.e. silent data loss. Markers are one line (`idOffset`) plus the
    * claiming checkpoint path; written via temp-file + rename so a
    * crashed claim never leaves a readable half-marker. */
  private def claimLeafDrain(spark: SparkSession,
                             tree: graft.ops.JoinTreeIvm.Stores,
                             leaf: Int, idOffset: Long,
                             checkpointDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val ckpt = new Path(checkpointDir).toUri.toString
    val dir = new Path(graft.ops.JoinTreeIvm.rootOf(tree), "drains")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hash = java.security.MessageDigest.getInstance("MD5")
      .digest(ckpt.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    val mine = new Path(dir, s"leaf${leaf}_$hash")
    def read(p: Path): (Long, String) = {
      val in = fs.open(p)
      try {
        val lines = scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().toList
        (lines.head.toLong, lines(1))
      } finally in.close()
    }
    if (fs.exists(mine)) {
      val (prevOff, _) = read(mine)
      require(prevOff == idOffset,
        s"checkpoint $ckpt previously drained leaf $leaf at " +
          s"idOffset=$prevOff, now asked for $idOffset — changing the " +
          "offset mid-stream would re-id committed micro-batches")
      return // restart-resume: same checkpoint, same offset
    }
    fs.mkdirs(dir)
    val others = Option(fs.globStatus(new Path(dir, s"leaf${leaf}_*")))
      .getOrElse(Array.empty)
    others.foreach { st =>
      val (off, owner) = read(st.getPath)
      require(off != idOffset,
        s"leaf $leaf of tree ${graft.ops.JoinTreeIvm.rootOf(tree)} is " +
          s"already drained by checkpoint $owner at idOffset=$off; a " +
          "second drain in the same id space would collide in the entry " +
          "manifest and be silently swallowed as replays — give this " +
          "drain a disjoint idOffset (e.g. spaced by RightIdOffset)")
    }
    val tmp = new Path(dir, s".leaf${leaf}_$hash.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$idOffset\n$ckpt\n".getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, mine)) {
      // lost a race to a concurrent claimer — re-run the checks
      fs.delete(tmp, false)
      claimLeafDrain(spark, tree, leaf, idOffset, checkpointDir)
    }
  }
}
