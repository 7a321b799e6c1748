package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch
import graft.sinks.AppendOnlyStore

/** Incremental SET-OVERLAP maintenance via mergeable KMV sketches — the
  * fourth member of the sketch-IVM family ([[SketchAgg]] HLL distinct,
  * [[QuantileSketchAgg]] KLL quantiles, [[HeavyHitterAgg]] SpaceSaving
  * top-k). HLL answers "how many distinct per key"; KMV additionally
  * answers "how many distinct are SHARED between keys" — audience overlap
  * across sources, contamination overlap across corpus snapshots —
  * because bottom-k sketches intersect (θ-cut) where HLL cannot.
  *
  * Maintenance contract is identical to the siblings: each batch folds to
  * one ≤k-long sketch per key (partial-agg'd — the shuffle carries
  * sketches, never members), sketches APPEND to the store (batch-sized
  * IO), and any current question — per-key distinct, pairwise overlap
  * matrix — re-folds stored sketches alone; the raw history is never
  * re-read. Union of bottom-k sketches is the bottom-k of the union, so
  * maintenance is associative and replay order never changes a result.
  * Crash-replay: partials are stamped with the logical batch id and
  * deduped on (key, batch) at read/compact — replaying a batch cannot
  * double-count.
  *
  * Accuracy regimes (the family posture): below capacity k every sketch
  * is its key's complete distinct-hash set, so overlap counts are EXACT
  * integers (deterministic given data + xxhash64) — the driver-gateable
  * regime; at capacity the θ-cut estimators carry ~1/√(k-2) relative
  * error, gated in KmvSketchSpec.
  *
  * The pairwise combine consumes O(|keys|²) fixed-size sketches on the
  * driver — the documented summary-scale shape (bounded by key count,
  * never data), same as ExactQuantiles' subtotals.
  */
object OverlapAgg {

  /** @param keyCols grouping keys (null-safe via JSON-struct hash)
    * @param setCol  the column whose distinct-set overlap is maintained
    * @param k       sketch capacity: exactness bound below it, ~1/√(k-2)
    *                relative error beyond */
  final case class Spec(keyCols: Seq[String], setCol: String,
                        k: Int = 32768)

  private def aggKey(spec: Spec) =
    IncrementalJoin.storeKey(spec.keyCols.map(col))

  private val CompactedBatchId = Long.MinValue

  private def kmvUdaf(k: Int) =
    udaf(KmvSketch.aggregator(k), Encoders.LONG)

  private def mergeUdaf(k: Int) =
    udaf(KmvSketch.mergeAggregator(k), ExpressionEncoder[Array[Long]]())

  /** Fold one batch: one KMV sketch + row count per key. Hashing runs in
    * whole-stage codegen (`xxhash64`), the aggregator only ever sees
    * longs. Null set-members are skipped (count(DISTINCT) semantics). */
  def partials(batch: DataFrame, spec: Spec, batchId: Long): DataFrame =
    batch.groupBy(spec.keyCols.map(col): _*)
      .agg(kmvUdaf(spec.k)(
          when(col(spec.setCol).isNotNull, xxhash64(col(spec.setCol))))
          .as("__sketch"),
        count(col(spec.setCol)).as("__cnt"))
      .withColumn("__agg_key", aggKey(spec))
      .withColumn("__batch_id", lit(batchId))

  /** Maintain with one batch: batch-sized shuffle + append. Replay-safe
    * under the unique-logical-batch-id contract. */
  def appendBatch(store: AppendOnlyStore, batch: DataFrame, spec: Spec,
                  batchId: Long): Unit =
    store.appendOnce(partials(batch, spec, batchId), batchId)

  private def deduped(store: AppendOnlyStore, spec: Spec): DataFrame =
    IncrementalJoin.clusterByKeys(store.read(), spec.keyCols)
      .dropDuplicates(spec.keyCols :+ "__batch_id")

  /** Current per-key sketch + maintained member count, re-folded from
    * stored sketches alone. */
  def current(store: AppendOnlyStore, spec: Spec): DataFrame =
    deduped(store, spec)
      .groupBy(spec.keyCols.map(col): _*)
      .agg(mergeUdaf(spec.k)(col("__sketch")).as("__sketch"),
        sum(col("__cnt")).as("n_rows"))

  /** Pairwise overlap matrix across single-key-column stores: one row per
    * unordered key pair `(k1 < k2)` with the intersection and union
    * distinct counts (exact while every sketch is below capacity — the
    * [[KmvSketch.exactSetCounts]] regime; use [[KmvSketch.setEstimates]]
    * downstream of [[current]] for the saturated regime). */
  def overlapMatrix(store: AppendOnlyStore, spec: Spec): DataFrame = {
    require(spec.keyCols.size == 1,
      "overlapMatrix emits (k1, k2) pairs — single key column only")
    val spark = store.read().sparkSession
    import spark.implicits._
    val sks = current(store, spec)
      .select(col(spec.keyCols.head).cast("string"), col("__sketch"))
      .as[(String, Array[Long])]
      .collect()
      .sortBy(_._1)
    val rows = for {
      (k1, a) <- sks.toSeq; (k2, b) <- sks.toSeq if k1 < k2
    } yield {
      val (ni, nu) = KmvSketch.exactSetCounts(a, b, spec.k)
      (k1, k2, ni, nu)
    }
    rows.toDF("k1", "k2", "n_common", "n_either")
  }

  /** Collapse each key's sketch rows to one (generation-swapped,
    * result-invariant — see [[IncrementalAgg.compact]]). */
  def compact(store: AppendOnlyStore, spec: Spec): Unit =
    store.compactWith { df =>
      IncrementalJoin.clusterByKeys(df, spec.keyCols)
        .dropDuplicates(spec.keyCols :+ "__batch_id")
        .groupBy(spec.keyCols.map(col): _*)
        .agg(mergeUdaf(spec.k)(col("__sketch")).as("__sketch"),
          sum(col("__cnt")).as("__cnt"))
        .withColumn("__agg_key", aggKey(spec))
        .withColumn("__batch_id", lit(CompactedBatchId))
    }
}
