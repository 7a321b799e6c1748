package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.ops.DedupOps
import graft.sinks.{AppendOnlyStore, SnapshotTable}

/** Streaming corpus ingestion with cross-batch exact dedup: documents
  * arrive as files (the object-store drop pattern), each micro-batch is
  * deduped against the accumulated fingerprint store, and only novel docs
  * enter the corpus. AvailableNow + checkpoint = each file processed once;
  * the dedup itself is idempotent (replayed docs hash to known
  * fingerprints), so crash-recovery double-processing is harmless —
  * the streaming twin of [[DedupOps.incrementalExactDedup]].
  *
  * State never lives in the stream: fingerprints (~40 B/doc) live in an
  * append-only prefix-partitioned store, so a 100 TB corpus's dedup state
  * is a few TB of hashes joined per batch — not executor memory, and each
  * micro-batch WRITES only its own fingerprints (append), never the
  * accumulated store.
  */
object CorpusStream {

  /** Streaming-NATIVE dedup for continuous pipelines: fingerprint each doc
    * and drop duplicates inside the watermark horizon via Spark's
    * state-store (`dropDuplicatesWithinWatermark`). State is BOUNDED —
    * fingerprints older than the watermark are evicted — which is the
    * right trade for "suppress the re-crawl storm" dedup where duplicate
    * arrivals cluster in time; cross-all-time dedup remains
    * [[ingestDedupedAvailableNow]]'s append-only store (no horizon, but
    * external state). The two compose: in-stream suppression first shrinks
    * every micro-batch before the store join. */
  def dedupWithinWatermark(docs: DataFrame, textCol: String,
                           eventTimeCol: String, delay: String): DataFrame =
    docs.withColumn("fingerprint",
        graft.ops.TextOps.fingerprint(col(textCol)))
      .withWatermark(eventTimeCol, delay)
      .dropDuplicatesWithinWatermark("fingerprint")

  def ingestDedupedAvailableNow(spark: SparkSession, docsDir: String,
                                schema: StructType,
                                corpus: SnapshotTable,
                                fingerprints: AppendOnlyStore,
                                checkpointDir: String,
                                textCol: String = "text",
                                idCol: String = "doc_id"): Unit = {
    val q = spark.readStream.schema(schema).parquet(docsDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val admitted = DedupOps.incrementalExactDedup(
          batch, textCol, idCol, fingerprints)
        if (!admitted.isEmpty) {
          // merge keyed on id: idempotent under replay
          corpus.merge(admitted, Seq(idCol), Seq(col(idCol)))
        }
        ()
      }
      .start()
    q.awaitTermination()
  }

  /** Near-dup twin of [[ingestDedupedAvailableNow]]: each micro-batch is
    * admitted iff it is not a MinHash-LSH near-duplicate of anything
    * already ingested ([[DedupOps.incrementalMinhashDedup]] — bucket-key
    * store, append-only, store scanned but never shuffled or rewritten).
    * Replay-idempotent for the same reason the exact path is: a replayed
    * doc's buckets are already in the store, so it is rejected, and the
    * corpus merge is keyed on the id. */
  /** Streaming maintenance of the SEARCH index — the twin for
    * [[graft.ops.IncrementalTextIndex]]: a signed document topic (insert
    * +1, takedown −1, edit as −old/+new under one micro-batch) keeps the
    * inverted index and doc lengths current; BM25 serving never re-reads
    * the topic. Replayed micro-batches no-op at the store manifest via
    * the foreachBatch id, so checkpoint recovery is exactly-once per
    * batch even across compactions. Per-batch work: one tokenize + two
    * batch-sized appends — the IVM invariant at stream cadence. */
  def maintainTextIndexAvailableNow(spark: SparkSession, docsDir: String,
                                    schema: StructType,
                                    index: graft.ops.IncrementalTextIndex.Stores,
                                    checkpointDir: String,
                                    textCol: String = "text",
                                    deltaCol: Option[String] = None,
                                    maxFilesPerTrigger: Option[Int] = None): Long = {
    val n = new java.util.concurrent.atomic.AtomicLong(0L)
    var r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(m =>
      r = r.option("maxFilesPerTrigger", m.toString))
    val q = r.parquet(docsDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.IncrementalTextIndex.appendDelta(
          index, batch, textCol, batchId, deltaCol)
        n.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    n.get()
  }

  /** The END-TO-END right-to-be-forgotten drain: ONE signed document
    * topic (insert +1, takedown −1) maintains, in a single AvailableNow
    * pass with one checkpoint, every serving surface a takedown must
    * reach:
    *
    *  1. the SEARCH index ([[graft.ops.IncrementalTextIndex]]) — a
    *     taken-down doc leaves the served BM25 ranking;
    *  2. the near-dup ADMISSION store ([[DedupOps
    *     .signedMinhashDedupVerified]]) — its LSH memberships net to
    *     zero, freeing the shingle group for future twins (the q191
    *     contract), with the takedown probed against live membership
    *     first so retracting a never-admitted doc cannot leave a
    *     negative net;
    *  3. the dup-CLUSTER labels ([[graft.ops.IncrementalCc]] signed
    *     CC over an all-live-docs membership store) — the doc's
    *     verified near-dup edges are derived from the PRE-removal
    *     store and retracted, so it leaves the served labels and a
    *     component it bridged splits exactly (the q200 contract).
    *
    * Per micro-batch: tokenize + candidate-bounded store probes +
    * batch-sized appends — each store's manifest makes checkpoint
    * replays exactly-once (sub-writes use deterministic ids 2·bid and
    * 2·bid+1 where one micro-batch writes a store twice). Contract: a
    * single micro-batch must not insert and delete near-dup-related
    * docs together (deletes are resolved against pre-batch state);
    * `lookup` maps every topic id to its text (ids are append-stable —
    * an edit is a takedown plus a new id on this pipeline). */
  def maintainRtbfAvailableNow(spark: SparkSession, docsDir: String,
                               schema: StructType,
                               index: graft.ops.IncrementalTextIndex.Stores,
                               admission: AppendOnlyStore,
                               members: AppendOnlyStore,
                               cc: graft.ops.IncrementalCc.SignedStores,
                               lookup: DataFrame,
                               checkpointDir: String,
                               textCol: String = "text",
                               idCol: String = "doc_id",
                               deltaCol: String = "__delta",
                               threshold: Double = 1.0,
                               k: Int = 32, bands: Int = 8,
                               maxFilesPerTrigger: Option[Int] = None,
                               setRef: Option[graft.sinks.StoreSetRef] = None,
                               midBatch: () => Unit = () => ()): Long = {
    import graft.ops.{DedupOps, IncrementalCc, IncrementalTextIndex}
    val n = new java.util.concurrent.atomic.AtomicLong(0L)
    var r = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(m =>
      r = r.option("maxFilesPerTrigger", m.toString))
    val q = r.parquet(docsDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, bid: Long) =>
        val batch = batch0.persist()
        try {
          // 1. search index (signed, batch-sized appends)
          IncrementalTextIndex.appendDelta(index, batch, textCol, bid,
            Some(deltaCol))
          // injectable mid-batch seam (CrossSurfaceRefSpec): the index
          // has this batch, the admission store and labels do not yet —
          // a StoreSetRef reader must still see all-old
          midBatch()
          val ins = batch.filter(col(deltaCol) > 0)
            .select(col(idCol), col(textCol))
          val del = batch.filter(col(deltaCol) < 0)
            .select(col(idCol), col(textCol))
          // 3a. cluster edges derive from the PRE-batch membership
          // state: an insert's edges reach the docs live before it, a
          // takedown's −1 edges are exactly the edges its admit-time
          // twins hold
          val insPairs = DedupOps.signedNearDupPairs(ins, textCol, idCol,
            members, lookup, threshold, k, bands)
          val delPairs = DedupOps.signedNearDupPairs(del, textCol, idCol,
            members, lookup, threshold, k, bands)
          val ccDelta = insPairs.withColumn("__delta", lit(1L))
            .unionByName(delPairs.withColumn("__delta", lit(-1L)))
          IncrementalCc.appendDelta(cc, ccDelta, bid,
            srcCol = "id1", dstCol = "id2")
          // 3b. all-live-docs membership maintenance
          DedupOps.nearDupAdd(members, ins, textCol, idCol, 2 * bid,
            k, bands)
          DedupOps.nearDupTakedown(members, del, textCol, idCol,
            2 * bid + 1, k, bands)
          // 2. admission store: q191 semantics — admit inserts against
          // the live admitted set, retract only admitted takedowns
          DedupOps.signedMinhashDedupVerified(ins, textCol, idCol,
            admission, corpus = lookup, threshold, batchId = 2 * bid,
            k = k, bands = bands)
          val admDel = DedupOps.liveMembers(admission, del, textCol,
            idCol, k, bands)
          DedupOps.nearDupTakedown(admission, admDel, textCol, idCol,
            2 * bid + 1, k, bands)
          // every surface committed: publish ONE cross-store ref so a
          // concurrent reader pinning it sees this batch on all three
          // surfaces or on none
          setRef.foreach(_.commit())
          ()
        } finally {
          batch.unpersist(blocking = false)
          ()
        }
        n.incrementAndGet()
        ()
      }
      .start()
    q.awaitTermination()
    n.get()
  }

  /** The RTBF drain's serving surfaces as one [[graft.sinks.StoreSetRef]]
    * store map — construct the ref over these (same root as the drain's
    * stores or anywhere durable), pass it to [[maintainRtbfAvailableNow]]
    * and read via [[rtbfSnapshot]]. */
  def rtbfSurfaces(index: graft.ops.IncrementalTextIndex.Stores,
                   admission: AppendOnlyStore, members: AppendOnlyStore,
                   cc: graft.ops.IncrementalCc.SignedStores)
      : Map[String, AppendOnlyStore] = Map(
    "index_postings" -> index.postings, "index_docs" -> index.docs,
    "index_stats" -> index.stats, "admission" -> admission,
    "members" -> members, "cc_labels" -> cc.labels,
    "cc_edges" -> cc.edges)

  /** A CONSISTENT read handle over the drain's three surfaces: typed
    * store handles whose reads all resolve the same committed ref —
    * all-old or all-new, never a mid-batch mix. */
  def rtbfSnapshot(ref: graft.sinks.StoreSetRef, idCol: String)
      : (graft.ops.IncrementalTextIndex.Stores, AppendOnlyStore,
         graft.ops.IncrementalCc.SignedStores) = {
    val s = ref.snapshot()
    (graft.ops.IncrementalTextIndex.Stores(
      s("index_postings"), s("index_docs"), s("index_stats"), idCol),
      s("admission"),
      graft.ops.IncrementalCc.SignedStores(s("cc_labels"), s("cc_edges")))
  }

  def ingestNearDedupedAvailableNow(spark: SparkSession, docsDir: String,
                                    schema: StructType,
                                    corpus: SnapshotTable,
                                    buckets: AppendOnlyStore,
                                    checkpointDir: String,
                                    textCol: String = "text",
                                    idCol: String = "doc_id",
                                    bands: Int = 16, k: Int = 64): Unit = {
    val q = spark.readStream.schema(schema).parquet(docsDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val admitted = DedupOps.incrementalMinhashDedup(
          batch, textCol, idCol, buckets, k = k, bands = bands)
        if (!admitted.isEmpty) {
          corpus.merge(admitted, Seq(idCol), Seq(col(idCol)))
        }
        ()
      }
      .start()
    q.awaitTermination()
  }
}
