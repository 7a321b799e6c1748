package graft.ops

import graft.ops.Lineage.LineageSyntax
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM corpus curation, each designed for the
  * 100 TB shape:
  *
  *  - exact: hash-groupBy on a content fingerprint — one shuffle keyed by
  *    a 128-bit hash, no text moves across the wire;
  *  - MinHash+LSH: shingle → k minhashes → b bands → bucket-join; only
  *    bucket-colliding pairs are verified, so cost is ~linear in corpus
  *    size instead of O(n²);
  *  - SimHash: 64-bit signature + banded hamming join (pigeonhole);
  *  - n-gram Jaccard: inverted-index self-join with a frequent-shingle cap
  *    (a shingle appearing in >maxDf docs is dropped — the classic
  *    stop-shingle guard that keeps the index join from quadratic blowup).
  *
  * No UDFs, no driver-side loops: everything is `functions._` + joins, so
  * Catalyst/AQE handle partitioning, skew, and codegen.
  */
object DedupOps {

  // --------------------------------------------------------------- exact

  /** Exact dedup: canonical row per normalized-content fingerprint (lowest
    * id wins). Returns the input columns + `fingerprint` + `dup_count`. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = df.withColumn("fingerprint", TextOps.fingerprint(col(textCol)))
    val w = Window.partitionBy(col("fingerprint"))
    fp.withColumn("dup_count", count(lit(1)).over(w))
      .withColumn("__rn", row_number().over(w.orderBy(col(idCol))))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Incremental (cross-batch) exact dedup — the production shape: dedup
    * each arriving batch against the accumulated corpus fingerprint store,
    * admit only novel documents, APPEND the batch's new fingerprints. The
    * store carries (fingerprint, first idCol) only — ~40 bytes/doc
    * regardless of document size, so the anti-join side stays tiny
    * relative to a 100 TB corpus. Per-batch write IO is proportional to
    * the batch (append-only files), never to the accumulated store — the
    * previous snapshot-table formulation rewrote the whole fingerprint
    * table every batch, which at 10⁹ docs is an unbounded-growth ~40 GB
    * read+write per micro-batch. Returns the admitted (novel,
    * batch-deduped) rows. */
  def incrementalExactDedup(batch: DataFrame, textCol: String, idCol: String,
                            fingerprints: graft.sinks.AppendOnlyStore): DataFrame = {
    val batchDeduped = exactDedup(batch, textCol, idCol).drop("dup_count")
    val novel =
      if (fingerprints.exists)
        batchDeduped.join(fingerprints.read().select("fingerprint"),
          Seq("fingerprint"), "left_anti")
      else batchDeduped
    val admitted = novel.cache()
    fingerprints.append(admitted.select(col("fingerprint"), col(idCol)))
    admitted
  }

  // ----------------------------------------- incremental near-dup (LSH)

  /** Batch's LSH bucket keys: one row per (doc, band) with the
    * (band_idx, band_hash) pair collapsed into a single 16-hex-char
    * `bucket_key` — the string form the [[graft.sinks.AppendOnlyStore]]
    * prefix-partitions on. */
  private def bucketKeys(batch: DataFrame, textCol: String, idCol: String,
                         k: Int, bands: Int, shingleLen: Int,
                         seed: Long): DataFrame = {
    val sigs = minhashSignatures(batch, textCol, idCol, k, shingleLen, seed)
    lshBuckets(sigs, idCol, bands, k / bands)
      .select(col(idCol),
        lower(hex(xxhash64(col("band_idx"), col("band_hash")))).as("bucket_key"))
  }

  /** Batch doc ids whose bucket keys collide with the accumulated store.
    *
    * Join shape is the 100 TB-critical part: the store side is a plain
    * SCAN (fixed-width key rows, no shuffle, no rewrite) and the
    * batch-sized side broadcasts, so per-batch cost is one pass over the
    * store + batch-sized work. `broadcastBatch = false` falls back to a
    * shuffled join for batches too large to broadcast. */
  private[graft] def crossBatchHits(batchBuckets: DataFrame, idCol: String,
                                    store: graft.sinks.AppendOnlyStore,
                                    broadcastBatch: Boolean): DataFrame = {
    val probe = if (broadcastBatch) broadcast(batchBuckets) else batchBuckets
    store.read().select(col("bucket_key"))
      .join(probe, Seq("bucket_key"))
      .select(col(idCol)).distinct()
  }

  /** Incremental (cross-batch) MinHash-LSH near-dedup — the streaming-
    * ingestion twin of [[incrementalExactDedup]] for NEAR duplicates.
    *
    * The accumulated corpus is represented ONLY by its LSH bucket keys
    * (bands × 8-byte keys per doc, content never stored): a new doc is a
    * near-duplicate iff it shares any bucket with the store (standard
    * banded-LSH decision, same b/r trade-off as [[minhashNearDups]]'s
    * candidate stage). Within the batch, bucket-colliding docs cluster via
    * [[dupClusters]] and only each cluster's canonical (smallest id)
    * survives; a cluster whose canonical collides with the store is
    * rejected wholesale (near-dup-of-a-dup is a dup — deterministic and
    * order-independent across batch replays).
    *
    * Per-batch IO contract (the scale guarantee, asserted in
    * IncrementalNearDupSpec): store reads are one scan, store writes are
    * an APPEND of the admitted docs' keys; nothing ever rewrites or
    * shuffles the accumulated store. Docs shorter than one shingle have no
    * buckets and are always admitted (they cannot near-dup anything).
    *
    * Returns the admitted batch rows. */
  def incrementalMinhashDedup(batch: DataFrame, textCol: String, idCol: String,
                              buckets: graft.sinks.AppendOnlyStore,
                              k: Int = 64, bands: Int = 16,
                              shingleLen: Int = 3, seed: Long = 42L,
                              maxBucketSize: Int = 1000,
                              broadcastBatch: Boolean = true): DataFrame = {
    // batch-sized; referenced by the within-batch grouping, the store
    // probe, and the final append — materialize once
    val bk = bucketKeys(batch, textCol, idCol, k, bands, shingleLen, seed)
      .cutLineage()
    val withinDups = dupClusters(
      bk.groupBy(col("bucket_key"))
        .agg(array_sort(collect_list(col(idCol))).as("ids"))
        .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucketSize)
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
            |  transform(slice(ids, i + 2, size(ids)),
            |            y -> struct(x AS id1, y AS id2))))""".stripMargin)).as("p"))
        .select(col("p.id1"), col("p.id2")).distinct())
      .filter(!col("is_canonical"))
      .select(col("node").as(idCol))
    val rejected =
      if (buckets.exists)
        withinDups.unionByName(
          crossBatchHits(bk, idCol, buckets, broadcastBatch)).distinct()
      else withinDups
    val admitted = batch.join(rejected, Seq(idCol), "left_anti").cache()
    buckets.append(
      bk.join(admitted.select(col(idCol)), Seq(idCol), "left_semi")
        .select(col("bucket_key"), col(idCol)))
    admitted
  }

  /** Verified incremental near-dedup: like [[incrementalMinhashDedup]],
    * but a bucket collision can only reject a document after exact
    * shingle-set Jaccard >= `threshold` confirms it — banded-LSH false
    * positives (docs that share a band by chance) survive. The price is
    * re-reading the COLLIDING docs' text: `corpus` (the previously
    * admitted docs, id + text — in the streaming path, the corpus
    * snapshot itself) is semi-joined down to candidate ids before any
    * shingling, so verification work scales with the candidate set, never
    * the corpus. Store IO contract is unchanged: one scan, batch-sized
    * append, no rewrite.
    *
    * At `threshold = 1.0` the rejection rule degenerates to exact
    * shingle-set equality, which is what makes this op oracle-checkable
    * end-to-end (q77): admitted == "smallest doc id of its shingle-set
    * group, batches arriving in id order". */
  def incrementalMinhashDedupVerified(batch: DataFrame, textCol: String,
                                      idCol: String,
                                      buckets: graft.sinks.AppendOnlyStore,
                                      corpus: DataFrame, threshold: Double,
                                      k: Int = 64, bands: Int = 16,
                                      shingleLen: Int = 3, seed: Long = 42L,
                                      maxBucketSize: Int = 1000,
                                      broadcastBatch: Boolean = true): DataFrame = {
    val bk = bucketKeys(batch, textCol, idCol, k, bands, shingleLen, seed)
      .cutLineage()
    val withinPairs = bk.groupBy(col("bucket_key"))
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucketSize)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(x AS id1, y AS id2))))""".stripMargin)).as("p"))
      .select(col("p.id1"), col("p.id2")).distinct()
      .withColumn("is_cross", lit(false))
    val probe = if (broadcastBatch) broadcast(bk) else bk
    val crossPairs =
      if (buckets.exists)
        buckets.read().withColumnRenamed(idCol, "id1")
          .join(probe.withColumnRenamed(idCol, "id2"), Seq("bucket_key"))
          .select(col("id1"), col("id2")).distinct()
          .withColumn("is_cross", lit(true))
      else withinPairs.limit(0)
    // candidate pairs are tiny (bucket collisions only); the verification
    // joins reference them twice each — pin them
    val cand = withinPairs.unionByName(crossPairs).cutLineage()
    val candIds = cand.select(col("id1").as(idCol))
      .unionByName(cand.select(col("id2").as(idCol))).distinct()
    val lookup = batch.select(col(idCol), col(textCol))
      .unionByName(corpus.select(col(idCol), col(textCol)))
      .join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol), TextOps.shingles(col(textCol), shingleLen).as("sh"))
      .cutLineage()
    val verified = cand
      .join(lookup.select(col(idCol).as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(lookup.select(col(idCol).as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("inter",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("inter") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")) >= threshold)
      .select(col("id1"), col("id2"), col("is_cross"))
      .cutLineage()
    val withinDups = dupClusters(verified.filter(!col("is_cross")))
      .filter(!col("is_canonical"))
      .select(col("node").as(idCol))
    val rejected = withinDups
      .unionByName(verified.filter(col("is_cross")).select(col("id2").as(idCol)))
      .distinct()
    val admitted = batch.join(rejected, Seq(idCol), "left_anti").cache()
    buckets.append(
      bk.join(admitted.select(col(idCol)), Seq(idCol), "left_semi")
        .select(col("bucket_key"), col(idCol)))
    admitted
  }

  // ------------------------ takedown-aware near-dup (signed LSH store)

  /** Spec of the SIGNED bucket-membership store backing
    * [[signedMinhashDedupVerified]]: one maintained count per
    * (bucket_key, doc) — an [[IncrementalAgg]] store, so signed deltas,
    * the applied-batch replay manifest, and per-prefix incremental
    * compaction are all inherited. A taken-down doc's memberships net
    * to zero and stop rejecting newcomers — the right-to-be-forgotten
    * semantics the append-only store in [[incrementalMinhashDedup]]
    * cannot express. */
  def signedBucketSpec(idCol: String): IncrementalAgg.Spec =
    IncrementalAgg.Spec(Seq("bucket_key", idCol), Nil)

  /** Open the signed membership store (16 hash-prefix directories). */
  def signedBucketStore(spark: org.apache.spark.sql.SparkSession,
                        root: String): graft.sinks.AppendOnlyStore =
    new graft.sinks.AppendOnlyStore(spark, root,
      prefixCol = "__agg_key", prefixChars = 1)

  /** LIVE (bucket_key, id) memberships colliding with the batch's keys:
    * the store's partials are semi-joined down to the batch's bucket
    * keys BEFORE the net-multiplicity refold, so the refold shuffles a
    * candidate-bounded slice, never the accumulated state. */
  private def liveCollisions(store: graft.sinks.AppendOnlyStore,
                             bk: DataFrame, idCol: String,
                             broadcastBatch: Boolean): DataFrame = {
    val keys = bk.select(col("bucket_key")).distinct()
    val probe = if (broadcastBatch) broadcast(keys) else keys
    store.read()
      .join(probe, Seq("bucket_key"), "left_semi")
      .dropDuplicates("bucket_key", idCol, "__batch_id")
      .groupBy(col("bucket_key"), col(idCol))
      .agg(sum(col("__cnt")).as("__net"))
      .filter(col("__net") > 0)
      .select(col("bucket_key"), col(idCol))
  }

  /** [[incrementalMinhashDedupVerified]] against a SIGNED membership
    * store: admission is decided against the docs currently LIVE in the
    * store (inserts minus takedowns), and the admitted batch's
    * memberships land as +1 deltas under `batchId` — exactly-once across
    * crash-replays via the store manifest, and (unlike the unsigned
    * variant) the RETURNED admitted set is replay-stable too: a replayed
    * batch's own stored keys are ignored via the id1 ≠ id2 guard.
    *
    * `corpus` must be the currently-live admitted docs (id + text) — the
    * text lookup for exact-Jaccard verification of cross-batch bucket
    * collisions; it is semi-joined to candidate ids before any
    * shingling, so verification work tracks the candidate set. Per-batch
    * IO: tokenize + one candidate-bounded store probe + a batch-sized
    * append; the state is never rewritten outside compaction
    * ([[IncrementalAgg.compact]] with [[signedBucketSpec]]). */
  def signedMinhashDedupVerified(batch: DataFrame, textCol: String,
                                 idCol: String,
                                 store: graft.sinks.AppendOnlyStore,
                                 corpus: DataFrame, threshold: Double,
                                 batchId: Long,
                                 k: Int = 64, bands: Int = 16,
                                 shingleLen: Int = 3, seed: Long = 42L,
                                 maxBucketSize: Int = 1000,
                                 broadcastBatch: Boolean = true): DataFrame = {
    val bk = bucketKeys(batch, textCol, idCol, k, bands, shingleLen, seed)
      .cutLineage()
    val withinPairs = bk.groupBy(col("bucket_key"))
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucketSize)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(x AS id1, y AS id2))))""".stripMargin)).as("p"))
      .select(col("p.id1"), col("p.id2")).distinct()
      .withColumn("is_cross", lit(false))
    val crossPairs =
      if (store.exists)
        liveCollisions(store, bk, idCol, broadcastBatch)
          .withColumnRenamed(idCol, "id1")
          .join((if (broadcastBatch) broadcast(bk) else bk)
            .withColumnRenamed(idCol, "id2"), Seq("bucket_key"))
          // a replayed batch sees its own first-run memberships: self-
          // pairs are replay artifacts, not duplicates
          .filter(col("id1") =!= col("id2"))
          .select(col("id1"), col("id2")).distinct()
          .withColumn("is_cross", lit(true))
      else withinPairs.limit(0)
    val cand = withinPairs.unionByName(crossPairs).cutLineage()
    val candIds = cand.select(col("id1").as(idCol))
      .unionByName(cand.select(col("id2").as(idCol))).distinct()
    val lookup = batch.select(col(idCol), col(textCol))
      .unionByName(corpus.select(col(idCol), col(textCol)))
      .join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol), TextOps.shingles(col(textCol), shingleLen).as("sh"))
      .cutLineage()
    val verified = cand
      .join(lookup.select(col(idCol).as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(lookup.select(col(idCol).as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("inter",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("inter") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")) >= threshold)
      .select(col("id1"), col("id2"), col("is_cross"))
      .cutLineage()
    val withinDups = dupClusters(verified.filter(!col("is_cross")))
      .filter(!col("is_canonical"))
      .select(col("node").as(idCol))
    val rejected = withinDups
      .unionByName(verified.filter(col("is_cross")).select(col("id2").as(idCol)))
      .distinct()
    val admitted = batch.join(rejected, Seq(idCol), "left_anti").cache()
    IncrementalAgg.appendDelta(store,
      bk.join(admitted.select(col(idCol)), Seq(idCol), "left_semi")
        .select(col("bucket_key"), col(idCol))
        .withColumn("__delta", lit(1L)),
      signedBucketSpec(idCol), batchId, "__delta")
    admitted
  }

  /** Retract removed docs from the signed membership store: re-present
    * each removed doc's text (same k/bands/shingleLen/seed as at admit —
    * LSH keys are deterministic in (text, params), so the −1 deltas land
    * on exactly the rows the admit stored and net them to zero). Replays
    * of `batchId` are no-ops via the store manifest. Cost tracks the
    * takedown wave, never the corpus. */
  def nearDupTakedown(store: graft.sinks.AppendOnlyStore,
                      removed: DataFrame, textCol: String, idCol: String,
                      batchId: Long,
                      k: Int = 64, bands: Int = 16,
                      shingleLen: Int = 3, seed: Long = 42L): Unit =
    IncrementalAgg.appendDelta(store,
      bucketKeys(removed, textCol, idCol, k, bands, shingleLen, seed)
        .withColumn("__delta", lit(-1L)),
      signedBucketSpec(idCol), batchId, "__delta")

  /** [[nearDupTakedown]]'s insert twin: land `docs`' LSH memberships as
    * +1 deltas WITHOUT any admission decision — the maintenance write
    * for an all-live-docs membership store (the candidate index a
    * maintained dup-CLUSTER layer probes), as opposed to the
    * admitted-only store [[signedMinhashDedupVerified]] keeps. */
  def nearDupAdd(store: graft.sinks.AppendOnlyStore,
                 docs: DataFrame, textCol: String, idCol: String,
                 batchId: Long,
                 k: Int = 64, bands: Int = 16,
                 shingleLen: Int = 3, seed: Long = 42L): Unit =
    IncrementalAgg.appendDelta(store,
      bucketKeys(docs, textCol, idCol, k, bands, shingleLen, seed)
        .withColumn("__delta", lit(1L)),
      signedBucketSpec(idCol), batchId, "__delta")

  /** The subset of `docs` holding ANY live membership in the signed
    * store — the "was admitted and not yet taken down" probe a
    * streaming takedown runs BEFORE retracting (retracting a
    * never-admitted doc would leave a visible negative net). Read-only;
    * candidate-bounded like every store probe here. */
  def liveMembers(store: graft.sinks.AppendOnlyStore, docs: DataFrame,
                  textCol: String, idCol: String,
                  k: Int = 64, bands: Int = 16,
                  shingleLen: Int = 3, seed: Long = 42L): DataFrame = {
    if (!store.exists) return docs.limit(0)
    val bk = bucketKeys(docs, textCol, idCol, k, bands, shingleLen, seed)
    docs.join(
      liveCollisions(store, bk, idCol, broadcastBatch = true)
        .select(col(idCol)).distinct(),
      Seq(idCol), "left_semi")
  }

  /** VERIFIED near-dup pairs of `batch` — within the batch AND against
    * the docs live in the signed membership store — as canonicalized
    * distinct (id1 < id2) edges: the edge feed for a maintained
    * dup-cluster layer ([[IncrementalCc]]'s signed CC). Exact
    * shingle-set Jaccard ≥ `threshold` verifies every LSH candidate, so
    * the pair set is a pure function of (live texts, batch texts).
    * READ-ONLY: no membership is appended — callers maintain
    * memberships separately ([[nearDupAdd]]/[[nearDupTakedown]]), AFTER
    * deriving the pairs they need; in particular a takedown wave
    * derives its −1 edges from the PRE-removal store. `lookup` must
    * cover the texts of every live candidate id (a superset is fine —
    * it is semi-joined to candidates before shingling). */
  def signedNearDupPairs(batch: DataFrame, textCol: String, idCol: String,
                         store: graft.sinks.AppendOnlyStore,
                         lookup: DataFrame, threshold: Double,
                         k: Int = 64, bands: Int = 16,
                         shingleLen: Int = 3, seed: Long = 42L,
                         maxBucketSize: Int = 1000,
                         broadcastBatch: Boolean = true): DataFrame = {
    val bk = bucketKeys(batch, textCol, idCol, k, bands, shingleLen, seed)
      .cutLineage()
    val withinPairs = bk.groupBy(col("bucket_key"))
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucketSize)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(x AS id1, y AS id2))))""".stripMargin)).as("p"))
      .select(col("p.id1"), col("p.id2")).distinct()
    val crossPairs =
      if (store.exists)
        liveCollisions(store, bk, idCol, broadcastBatch)
          .withColumnRenamed(idCol, "id1")
          .join((if (broadcastBatch) broadcast(bk) else bk)
            .withColumnRenamed(idCol, "id2"), Seq("bucket_key"))
          .filter(col("id1") =!= col("id2"))
          .select(col("id1"), col("id2")).distinct()
      else withinPairs.limit(0)
    val cand = withinPairs.unionByName(crossPairs).cutLineage()
    val candIds = cand.select(col("id1").as(idCol))
      .unionByName(cand.select(col("id2").as(idCol))).distinct()
    val texts = batch.select(col(idCol), col(textCol))
      .unionByName(lookup.select(col(idCol), col(textCol)))
      .join(candIds, Seq(idCol), "left_semi")
      .dropDuplicates(idCol)
      .select(col(idCol), TextOps.shingles(col(textCol), shingleLen).as("sh"))
      .cutLineage()
    cand
      .join(texts.select(col(idCol).as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(texts.select(col(idCol).as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("inter",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("inter") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")) >= threshold)
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"))
      .distinct()
  }

  // ------------------------------------------------------------- minhash

  /** Deterministic MinHash coefficient pairs (a,b) over the Mersenne prime
    * 2^31-1; a,b < p so a*h+b stays in signed-64 range. */
  private def coeffs(k: Int, seed: Long): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
  }
  private val P = 2147483647L // 2^31 - 1

  /** MinHash signatures: `sig` = array<long> of length k.
    *
    * Formulated as explode(shingle-hashes) → k scalar `min` aggregates →
    * reassemble array: the shingling+hashing runs ONCE per doc (not once
    * per permutation — the naive array<->transform form recomputes the
    * shingle set k times, measured 35× slower), the k permutations are
    * cheap codegen'd arithmetic on a scalar, and partial aggregation
    * combines map-side so the only shuffle carries k longs per doc.
    * That per-doc fixed width (~k*8 bytes regardless of document size) is
    * what makes MinHash-LSH shuffle-light at 100 TB. */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
                        k: Int = 64, shingleLen: Int = 3,
                        seed: Long = 42L): DataFrame = {
    val hashed = df.select(col(idCol),
      explode(TextOps.shingleHashes(col(textCol), shingleLen)).as("h"))
    val aggs = coeffs(k, seed).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(col("h") * a + b, lit(P))).as(s"__m$i")
    }
    hashed.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
      .select(col(idCol),
        array((0 until k).map(i => col(s"__m$i")): _*).as("sig"))
  }

  /** LSH band buckets: (band_idx, band_hash, id). Docs sharing any bucket
    * are candidate pairs. bands*rowsPerBand must equal k. */
  def lshBuckets(sigs: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandRows = (0 until bands).map { b =>
      struct(lit(b).as("band_idx"),
        xxhash64(concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))).as("band_hash"))
    }
    sigs.select(col(idCol), explode(array(bandRows: _*)).as("band"))
      .select(col(idCol), col("band.band_idx"), col("band.band_hash"))
  }

  /** Candidate pairs from bucket collisions (id1 < id2, distinct), via
    * grouped posting lists: ONE shuffle on (band_idx, band_hash), sort
    * each bucket's id list, emit ordered pairs with array lambdas. The
    * bucket-size cap bounds per-bucket work at maxBucketSize² (degenerate
    * buckets from boilerplate content are dropped, same guard as the
    * n-gram stop-shingle cap). The windowed-self-join formulation this
    * replaces evaluated the whole signature pipeline once per join side
    * and shuffled it three times — posting lists scan it once. */
  def lshCandidatePairs(buckets: DataFrame, idCol: String,
                        maxBucketSize: Int = 1000): DataFrame =
    buckets.groupBy(col("band_idx"), col("band_hash"))
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxBucketSize)
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids)),
          |            y -> struct(x AS id1, y AS id2))))""".stripMargin)).as("p"))
      .select(col("p.id1"), col("p.id2")).distinct()

  /** Full MinHash-LSH near-dup pipeline: signatures → buckets → candidate
    * pairs → exact-Jaccard verification on shingle sets. Returns pairs
    * with `jaccard >= threshold`. Verification joins shingle arrays only
    * for candidates — the corpus text itself never self-joins. */
  def minhashNearDups(df: DataFrame, textCol: String, idCol: String,
                      threshold: Double, k: Int = 64, bands: Int = 16,
                      shingleLen: Int = 3, seed: Long = 42L): DataFrame = {
    val sigs = minhashSignatures(df, textCol, idCol, k, shingleLen, seed)
    // the candidate-pair list is referenced three times below (two id
    // projections + the verification join) — materialize the signature →
    // band → bucket-join pipeline ONCE; the pair list itself is tiny
    val pairs = lshCandidatePairs(
      lshBuckets(sigs, idCol, bands, k / bands), idCol).cutLineage()
    // Verification cost must scale with the CANDIDATE set, not the
    // corpus: semi-join down to docs that appear in some pair before
    // shingling for exact Jaccard (naively, the sets subtree shingles the
    // ENTIRE corpus — and twice, once per join side). The lineage cut
    // materializes the now-small sets once for both joins.
    val candIds = pairs.select(col("id1").as(idCol))
      .unionByName(pairs.select(col("id2").as(idCol))).distinct()
    val sets = df.join(candIds, Seq(idCol), "left_semi")
      .select(col(idCol), TextOps.shingles(col(textCol), shingleLen).as("sh"))
      .cutLineage()
    pairs
      .join(sets.select(col(idCol).as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sets.select(col(idCol).as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("jaccard", round(
        col("inter") / (size(col("sh1")) + size(col("sh2")) - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  // ------------------------------------------------------------- simhash

  /** SimHash per document: per-token hash bits, popcount per bit over
    * tokens, majority → bit. One explode + one groupBy (single shuffle on
    * the doc id, partial-aggregated map-side). `bitOf(j)` extracts bit j
    * of the per-token hash as a 0/1 LONG column.
    *
    * The per-bit counters ride PACKED: four 16-bit lanes per long, so a
    * 32-bit signature aggregates 8 long sums (+ the token count) instead
    * of 32 conditional ±1 sums. Lane-wise addition is exact as long as no
    * lane overflows — each lane counts set bits ≤ n_tokens, so the op
    * refuses documents over 65535 tokens (`raise_error`) rather than
    * silently corrupting neighbor lanes. Majority test `2·pop > n` is
    * algebraically the old `Σ±1 > 0`, so signatures are bit-identical to
    * the unpacked form — while the generated aggregate is ~4× narrower
    * (measured: cold 3.8→1.3 s, warm 1.16→0.90 s on the q28 corpus;
    * the cold win is the much smaller codegen unit). */
  private def simhashFromBits(tok: DataFrame, idCol: String, bits: Int,
                              bitOf: Int => Column): DataFrame = {
    require(bits % 4 == 0, s"bits must be a multiple of 4, got $bits")
    val nLongs = bits / 4
    val packed = (0 until nLongs).map { g =>
      (0 until 4).map(p => shiftleft(bitOf(4 * g + p), 16 * p)).reduce(_ + _)
        .as(s"p$g")
    }
    val aggCols = (0 until nLongs).map(g => sum(col(s"p$g")).as(s"s$g")) :+
      count(lit(1)).as("n")
    val agg = tok.select(col(idCol) +: packed: _*)
      .groupBy(col(idCol)).agg(aggCols.head, aggCols.tail: _*)
    val sim = (0 until bits).map { j =>
      val pop = shiftright(col(s"s${j / 4}"), 16 * (j % 4)).bitwiseAND(lit(0xFFFFL))
      when(pop * 2 > col("n"), shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    agg.select(col(idCol),
      when(col("n") >= 65536L,
        raise_error(lit("simhash: document exceeds 65535 tokens; " +
          "packed 16-bit bit-counters would overflow")))
        .otherwise(sim).as("simhash"))
  }

  private def tokenized(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("tok"))

  /** 64-bit SimHash on xxhash64 token hashes — the production path (one
    * 64-bit hash per token, no string hashing beyond xxhash64). */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = tokenized(df, textCol, idCol)
      .select(col(idCol), xxhash64(col("tok")).as("h"))
    simhashFromBits(tok, idCol, bits = 64,
      bitOf = j => shiftright(col("h"), j).bitwiseAND(1))
  }

  /** 32-bit PORTABLE SimHash: per-token bit j is the high bit of hex char
    * j of md5(token). md5 is standardized, so any engine (the DuckDB
    * oracle included) computes the identical signature — this is the
    * cross-engine-checkable twin of [[simhash]], sharing the same
    * aggregation/banding machinery.
    *
    * The hex digits are materialized as four 32-bit ints via `conv`
    * (8 hex chars each), so each of the 32 bit tests in the aggregate is
    * a shift-and-mask on a long — the original per-bit
    * `substring(md5, j+1, 1).isin("8".."f")` formulation re-sliced the
    * hex string 32× per token (measured ~2× slower end-to-end). Alias
    * boundaries (md5 → hx, conv → v0..v3) survive CollapseProject, so
    * md5 runs once and conv four times per token. */
  def simhashPortable(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tok = tokenized(df, textCol, idCol)
      .select(col(idCol), md5(col("tok")).as("hx"))
      .select(col(idCol) +: (0 until 4).map { c =>
        conv(substring(col("hx"), c * 8 + 1, 8), 16, 10).cast("long").as(s"v$c")
      }: _*)
    // high bit of hex char (8c + p) = bit 4*(7-p)+3 of v_c
    simhashFromBits(tok, idCol, bits = 32, bitOf = j =>
      shiftright(col(s"v${j / 8}"), 4 * (7 - j % 8) + 3).bitwiseAND(1))
  }

  /** SimHash near-dup pairs with hamming distance <= maxDist, found by the
    * pigeonhole band join: split the `sigBits`-bit signature into
    * maxDist+1 chunks — any pair within maxDist matches exactly on >=1
    * chunk, so the join is equi (hash-partitionable) and the hamming check
    * runs only on collisions. Recall is provably 1.0 (pigeonhole), so the
    * output EQUALS the brute-force hamming join — which is what lets the
    * DuckDB oracle cross-check the banded plan exactly. */
  def simhashNearDups(sims: DataFrame, idCol: String, maxDist: Int = 3,
                      sigBits: Int = 64): DataFrame = {
    val chunks = maxDist + 1
    val width = sigBits / chunks
    // The band self-join references the signature pipeline on BOTH sides,
    // and canonicalization does not line the two subtrees up for
    // ReusedExchange (measured: the whole tokenize→hash→agg pipeline ran
    // twice, ~40% of q28's runtime). Signatures are 16 bytes/doc —
    // materialize them once, explicitly.
    val sigsOnly = sims.select(col(idCol), col("simhash")).cutLineage()
    val banded = sigsOnly.select(col(idCol), col("simhash"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * width)
            .bitwiseAND((1L << width) - 1).as("chunk_val"))
      }: _*)).as("b"))
      .select(col(idCol), col("simhash"), col("b.chunk"), col("b.chunk_val"))
    // Plain equi-self-join on the chunk key: the shuffle under both sides
    // is identical, so ReusedExchange evaluates the signature pipeline
    // ONCE and the join streams pairs through codegen. (A grouped
    // posting-list formulation was tried and measured ~60% SLOWER here —
    // with wide 2^width buckets its collect_list/array_sort/struct-copy
    // overhead buys nothing, because unlike lshCandidatePairs there is no
    // window-cap above the exchange for it to eliminate.) */
    val l = banded.select(col("chunk"), col("chunk_val"),
      col(idCol).as("id1"), col("simhash").as("s1"))
    val r = banded.select(col("chunk"), col("chunk_val"),
      col(idCol).as("id2"), col("simhash").as("s2"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        bit_count(col("s1").bitwiseXOR(col("s2"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ------------------------------------------------- decontamination

  /** Benchmark decontamination: flag every corpus document that shares at
    * least one word n-gram with an evaluation/benchmark set — the
    * standard guard against test-set leakage into training data (n=13
    * word-grams is the common published choice; smaller n for short
    * texts). Adds boolean `is_contaminated`.
    *
    * Shape at 100 TB: the corpus side is one explode into 8-byte
    * `xxhash64` gram keys (full 64-bit universe — NOT the 2^31 MinHash
    * universe, whose birthday collisions would false-flag at corpus
    * scale) and a semi-join; the benchmark gram set is tiny (eval suites,
    * not corpora), so AQE broadcasts it and the corpus never shuffles.
    * The contaminated-id set (small) then broadcast-joins back. */
  def contaminationFlags(corpus: DataFrame, textCol: String, idCol: String,
                         benchmark: DataFrame, benchTextCol: String,
                         n: Int = 13): DataFrame = {
    val grams = corpus.select(col(idCol),
      explode(TextOps.shingleHashesRaw(col(textCol), n)).as("g"))
    val benchGrams = benchmark.select(
      explode(TextOps.shingleHashesRaw(col(benchTextCol), n)).as("g"))
      .distinct()
    val contaminated = grams.join(benchGrams, Seq("g"), "left_semi")
      .select(col(idCol)).distinct().withColumn("__c", lit(true))
    corpus.join(contaminated, Seq(idCol), "left")
      .withColumn("is_contaminated", coalesce(col("__c"), lit(false)))
      .drop("__c")
  }

  /** The filtering form: corpus minus contaminated documents. */
  def decontaminate(corpus: DataFrame, textCol: String, idCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 13): DataFrame =
    contaminationFlags(corpus, textCol, idCol, benchmark, benchTextCol, n)
      .filter(!col("is_contaminated")).drop("is_contaminated")

  // ------------------------------------------------- repeated substrings

  /** Cross-document repeated-substring spans — the exact-substring dedup
    * signal of Lee et al. 2022 ("Deduplicating Training Data Makes
    * Language Models Better"), which found verbatim repeats that
    * document-level near-dedup misses. A token window of length `n` is
    * "repeated" when its content occurs in >= `minDocs` distinct docs;
    * adjacent repeated windows merge into maximal spans, so each output
    * row is one contiguous repeated region `[span_start, span_end)` in
    * token offsets (the removal unit for substring-level dedup).
    *
    * Shape at 100 TB (same as decontamination, vs. the paper's in-memory
    * suffix array which cannot shard): windows become 8-byte xxhash64
    * keys with positions; the doc-frequency filter is a (gram, doc)
    * distinct + count — two hash shuffles on the gram key; survivors
    * semi-join back (AQE broadcasts when the repeated set is small), and
    * span merging is a per-doc gaps-and-islands window, partitioned by
    * doc id — no global sort, no self-join on text. */
  def repeatedSpans(df: DataFrame, textCol: String, idCol: String,
                    n: Int = 32, minDocs: Int = 2): DataFrame = {
    val pos = df.select(col(idCol),
      posexplode(TextOps.shingleHashesRawAll(col(textCol), n)).as(Seq("pos", "g")))
    val repeated = pos.select(col("g"), col(idCol)).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("__docs"))
      .filter(col("__docs") >= minDocs)
      .select(col("g"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    pos.join(repeated, Seq("g"), "left_semi")
      .withColumn("__island", col("pos") - row_number().over(w))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + n).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("__island")
  }

  // ------------------------------------------------- duplicate clustering

  /** Connected components over a near-dup pair list — the stage that turns
    * pairwise dedup output (MinHash/SimHash/Jaccard/cosine pairs) into
    * duplicate CLUSTERS so one canonical document per cluster survives.
    * Returns (node, component) with component = min node id reachable.
    *
    * Algorithm: iterative min-label propagation. Each round every node
    * takes the min of its own label and its neighbors' labels; labels only
    * decrease, and the iteration stops when a round changes nothing. Each
    * round is two hash-partitioned shuffles (a join keyed on node + a
    * groupBy min with map-side partial agg) over (node, label) pairs —
    * 16 bytes/node regardless of document size — and rounds ≈ component
    * diameter. Near-dup graphs are locally dense (clusters of copies), so
    * diameters are small; a corpus-scale run converges in a handful of
    * rounds. [[Lineage.cut]] truncates lineage each round so the plan
    * does not grow with iterations (the classic iterative-Spark trap);
    * set `spark.graft.checkpointDir` for the fault-tolerant cut on a
    * real cluster.
    * For adversarial long-chain graphs use
    * [[connectedComponentsAlternating]] — same contract, same per-round
    * shuffle shape, O(log n) rounds regardless of diameter; this variant
    * now REFUSES (require) to return partially-propagated labels when
    * maxIter is hit. */
  def connectedComponents(edges: DataFrame, srcCol: String = "id1",
                          dstCol: String = "id2", maxIter: Int = 25): DataFrame = {
    // materialize the (possibly expensive) edge pipeline ONCE — the
    // symmetric union below references it twice, and every iteration
    // rejoins it
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .cutLineage()
    val sym = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    var labels = sym.groupBy("src").agg(min(col("dst")).as("mn"))
      .select(col("src").as("node"), least(col("src"), col("mn")).as("label"))
      .cutLineage()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      // push each node's label to its neighbors, keep the per-node min;
      // each node's OWN previous label rides along (min ignores nulls) so
      // convergence ("no label decreased" — labels only decrease) reads
      // off the same aggregate instead of a second join
      val pushed = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("label"),
          lit(null).cast("long").as("own"))
      val own = labels.select(col("node"), col("label"),
        col("label").as("own"))
      val next = pushed.unionByName(own)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"), min(col("own")).as("old"))
        .cutLineage()
      converged = next.filter(col("label") < col("old")).isEmpty
      labels = next.select(col("node"), col("label"))
    }
    sym.unpersist()
    // an unconverged loop would RETURN PARTIALLY-PROPAGATED LABELS —
    // silently wrong clusters. Rounds track component diameter, so this
    // fires on long-chain graphs; the alternating variant below
    // converges in O(log n) rounds on exactly those shapes.
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds " +
        s"(component diameter exceeds maxIter). Raise maxIter or use " +
        s"connectedComponentsAlternating for high-diameter graphs.")
    labels
  }

  /** Connected components by ALTERNATING large-star/small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * ACM SoCC 2014 — public algorithm): converges in O(log n) rounds
    * REGARDLESS of component diameter, where [[connectedComponents]]'
    * min-label propagation needs diameter-many rounds. Same contract:
    * (node, label) with label = min node id of the component, for every
    * node that appears in an edge; equality with the min-label variant
    * is property-gated in ConnectedComponentsSpec.
    *
    * Per round both stars are one groupBy-min over the (symmetrized)
    * edge list joined back on the center — two hash shuffles of
    * (node, node) pairs, the same per-round shape and size as the
    * min-label variant; the win is ROUND COUNT on chain-y graphs.
    * Edges only re-point toward smaller ids (monotone), so the edge
    * set never grows beyond the symmetrized input. Convergence is the
    * exact fixed point (edge multiset unchanged), checked with a
    * count + except emptiness — no hash-collision coin flip. Lineage
    * cuts via [[Lineage.cut]] like every iterative op.
    *
    * CONTRACT DIFFERENCE from [[connectedComponents]]: the star
    * re-pointing needs a total order with arithmetic comparison, so ids
    * are cast to LONG. Non-numeric ids (UUIDs, content hashes) would
    * cast to null and silently vanish from the edge list — this method
    * REFUSES such input (one validation pass over the edges) instead;
    * hash or dictionary-encode string ids to longs first, or use the
    * min-label [[connectedComponents]], which orders any comparable id
    * type via `least()`. Nodes that appear only in self-loops are kept
    * and label themselves, matching the min-label sibling. */
  def connectedComponentsAlternating(edges: DataFrame,
                                     srcCol: String = "id1",
                                     dstCol: String = "id2",
                                     maxIter: Int = 40): DataFrame = {
    // a non-null id whose LONG cast is null is a non-numeric id — the
    // contract violation that would otherwise drop edges silently
    val badCast = edges.where(
      (col(srcCol).isNotNull && col(srcCol).cast("long").isNull) ||
        (col(dstCol).isNotNull && col(dstCol).cast("long").isNull))
    require(badCast.isEmpty,
      s"connectedComponentsAlternating requires numeric (LONG-castable) " +
        s"node ids in '$srcCol'/'$dstCol'; found non-numeric ids. " +
        s"Hash/dictionary-encode them first, or use connectedComponents " +
        s"(min-label), which handles any orderable id type.")
    // self-loop-only nodes carry no connectivity but ARE part of the
    // contract's output (they label themselves); remember them here
    // because the u =!= v filter below drops their only edges
    val selfNodes = edges
      .select(col(srcCol).cast("long").as("node"))
      .where(col(srcCol).cast("long") === col(dstCol).cast("long"))
      .distinct()
    val e0 = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .cutLineage()
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      val centers = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      sym.join(centers, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // orient every edge (larger, smaller); key = larger endpoint
      val dir = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val centers = dir.groupBy(col("u")).agg(min(col("v")).as("m"))
      dir.join(centers, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(centers)
        .where(col("u") =!= col("v"))
        .distinct()
    }
    var e = e0
    var prevCount = e.count()
    var converged = prevCount == 0
    var iter = 0
    while (!converged && iter < maxIter) {
      iter += 1
      val next = smallStar(largeStar(e)).cutLineage()
      // count first (cheap over the materialized cut; previous round's
      // count is carried, not recomputed) — the exceptAll set-compare
      // only runs when counts agree, i.e. at or near the fixed point
      val nextCount = next.count()
      converged = nextCount == prevCount && next.exceptAll(e).isEmpty
      prevCount = nextCount
      e = next
    }
    require(converged,
      s"alternating connected components did not reach its fixed point " +
        s"in $maxIter rounds — O(log n) bound exceeded, input likely " +
        s"violates the edge contract")
    // fixed point is a star forest: every edge points node → component
    // min; roots label themselves. Self-loop-only nodes fold in as
    // (node, node); groupBy-min (same shuffle the distinct() cost)
    // keeps the component label when a self-loop node is also connected.
    e.select(col("u").as("node"), col("v").as("label"))
      .unionByName(e.select(col("v").as("node"), col("v").as("label")))
      .unionByName(selfNodes.select(col("node"), col("node").as("label")))
      .groupBy(col("node")).agg(min(col("label")).as("label"))
  }

  /** Duplicate clusters from a near-dup pair list: every node annotated
    * with its cluster id (min doc id in the component), the cluster size,
    * and whether it is the canonical survivor. Downstream corpus pruning
    * is `filter(is_canonical)` — plus the untouched docs that never
    * appeared in a pair. */
  def dupClusters(pairs: DataFrame, srcCol: String = "id1",
                  dstCol: String = "id2"): DataFrame = {
    val cc = connectedComponents(pairs, srcCol, dstCol)
      .withColumnRenamed("label", "cluster_id")
    cc.withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
      .withColumn("is_canonical", col("node") === col("cluster_id"))
  }

  /** Quality-policy canonical retention — the step a curation pipeline
    * actually runs AFTER near-dup detection: collapse each duplicate
    * cluster to the single best document by a caller-supplied ordering
    * (e.g. longest text, highest quality score, earliest crawl), instead
    * of [[dupClusters]]' min-id survivor. Docs that never appeared in a
    * pair are their own singleton cluster and always survive.
    *
    * Shape at 100 TB: the component labels are (id, label) pairs for
    * paired docs only — joined back on the id key (hash shuffle, 16
    * bytes/row). The survivor pick is a window partitioned by cluster_id:
    * partition count ≈ cluster count (high parallelism), partition size =
    * cluster size (small by construction of a near-dup graph), so no
    * straggler sort. Returns the retained rows with their `cluster_id`. */
  def keepCanonical(corpus: DataFrame, pairs: DataFrame, idCol: String,
                    qualityOrder: Seq[Column],
                    srcCol: String = "id1", dstCol: String = "id2"): DataFrame = {
    // unique-prefixed label columns so a corpus that itself carries
    // `node`/`label` columns cannot collide with the join plumbing
    val cc = connectedComponents(pairs, srcCol, dstCol)
      .select(col("node").as("__cc_node"), col("label").as("__cc_label"))
    val labeled = corpus.join(cc, corpus(idCol) === cc("__cc_node"), "left")
      .withColumn("cluster_id", coalesce(col("__cc_label"), col(idCol)))
      .drop("__cc_node", "__cc_label")
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(qualityOrder :+ col(idCol).asc: _*)
    labeled.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // -------------------------------------------------------- ngram jaccard

  /** All-pairs n-gram Jaccard via inverted index: explode distinct
    * shingles, drop shingles in > maxDf docs (stop-shingle cap), self-join
    * on shingle to count intersections, then Jaccard from set sizes.
    * Equivalent to the SQL a DuckDB oracle can run — and the scalable
    * alternative to a cross join. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        shingleLen: Int, threshold: Double,
                        maxDf: Int = 100): DataFrame = {
    val inv = df.select(col(idCol),
      explode(TextOps.shingles(col(textCol), shingleLen)).as("g"))
    // set sizes derived from the exploded index (shingles are distinct per
    // doc): the aggregate puts an exchange boundary under the two
    // verification joins, which ReusedExchange then computes ONCE — a
    // plain size(shingles) projection (tried, 2-3× slower end-to-end)
    // re-shingles the corpus once per join side instead
    val sizes = inv.groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    // Pair enumeration WITHOUT a self-join: group the inverted index per
    // gram (one shuffle), apply the document-frequency cap on the posting
    // list size, sort each list, and emit ordered pairs with array
    // lambdas. The cap bounds per-gram work at maxDf², the posting lists
    // are tiny, and the index is scanned once (a self-join evaluates the
    // capped index subtree twice and shuffles it twice — measured 2.4×
    // slower even at bench scale).
    val grouped = inv.groupBy(col("g"))
      .agg(array_sort(collect_list(col(idCol))).as("ids"))
      .filter(size(col("ids")) <= maxDf && size(col("ids")) >= 2)
    val pairs = grouped.select(explode(expr(
      """flatten(transform(ids, (x, i) ->
        |  transform(slice(ids, i + 2, size(ids)),
        |            y -> struct(x AS id1, y AS id2))))""".stripMargin)).as("p"))
      .select(col("p.id1"), col("p.id2"))
    val inter = pairs.groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id1"), col("n").as("n1")), Seq("id1"))
      .join(sizes.select(col(idCol).as("id2"), col("n").as("n2")), Seq("id2"))
      .withColumn("jaccard", round(
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }
  /** Cross-source exact-duplication matrix: for every source pair, how
    * many distinct fingerprints appear in BOTH — the standard corpus
    * diagnostic for mirror/scrape overlap and shared boilerplate before
    * choosing mixture weights (a source that is 40% another source
    * should not be weighted as independent data). `prefixTokens` > 0
    * fingerprints only the leading tokens, catching shared intros/
    * templates that full-document hashing misses.
    *
    * Shape at 100 TB: ONE corpus shuffle (groupBy fingerprint with
    * map-side-combined `collect_set(source)` — bounded by |sources|,
    * not occurrences), then pair expansion on the ≤|sources|² arrays of
    * the multi-source fingerprints only. No fingerprint self-join: a
    * join would shuffle the fingerprint table twice and explode on
    * hot keys; the set-then-expand form touches each fingerprint once.
    * `array_sort` pins the pair orientation (src_a < src_b) against
    * collect_set's partition-order nondeterminism. */
  def crossSourceDupMatrix(df: DataFrame, textCol: String,
                           sourceCol: String,
                           prefixTokens: Int = 0): DataFrame = {
    val norm = TextOps.normalize(col(textCol))
    val fpBase =
      if (prefixTokens > 0)
        concat_ws(" ", slice(split(norm, " "), 1, prefixTokens))
      else norm
    df.select(md5(fpBase).as("__f"), col(sourceCol).as("__src"))
      .distinct()
      .groupBy(col("__f"))
      .agg(array_sort(collect_set(col("__src"))).as("__srcs"))
      .where(size(col("__srcs")) > 1)
      .select(col("__f"), col("__srcs"),
        posexplode(col("__srcs")).as(Seq("__pa", "src_a")))
      .select(col("__f"), col("src_a"), col("__pa"),
        posexplode(col("__srcs")).as(Seq("__pb", "src_b")))
      .where(col("__pa") < col("__pb"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
