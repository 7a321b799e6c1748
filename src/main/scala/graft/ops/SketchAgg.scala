package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.AppendOnlyStore

/** Incremental DISTINCT-count maintenance via mergeable HLL sketches —
  * the non-distributive twin of [[IncrementalAgg]] (whose scaladoc
  * defers exactly this case here).
  *
  * `count(DISTINCT x)` cannot be maintained from per-batch counts: the
  * union of two batches' distinct sets is not the sum of their sizes.
  * The mergeable-state answer is Datasketches HLL: each batch folds to
  * one SKETCH per key (`hll_sketch_agg` — partial-agg'd, fixed-size
  * state), the sketches are APPENDED to the store (batch-sized IO,
  * never history-sized), and the current distinct estimate re-folds the
  * stored sketches with `hll_union_agg` — so "daily uniques over 90
  * days" or "global uniques ever" are answered from sketch rows alone,
  * with the raw 100 TB never re-read.
  *
  * Accuracy regimes (same posture as q93's count-min): below the sparse→
  * dense promotion threshold (~thousands of distinct values at the
  * default lgK=12) Datasketches HLL is EXACT, which is what lets q108
  * hash-match a DuckDB `count(DISTINCT …)` oracle; beyond it the
  * estimate carries the published ~1.6%/√(2^lgK) relative error, gated
  * in SketchAggSpec's large-cardinality test.
  *
  * Crash-replay contract matches [[IncrementalAgg]]: partials are
  * stamped with the logical batch id and deduped on (key, batch) at
  * read/compact — replaying a batch cannot double-count.
  */
object SketchAgg {

  /** @param keyCols     grouping keys (null-safe via JSON-struct hash)
    * @param distinctCol the column whose distinct count is maintained
    * @param lgK         Datasketches lgConfigK (4–21): state size 2^lgK
    *                    nibbles, error ~1.6%/√(2^lgK) once dense */
  final case class Spec(keyCols: Seq[String], distinctCol: String,
                        lgK: Int = 12)

  private def aggKey(spec: Spec) =
    IncrementalJoin.storeKey(spec.keyCols.map(col))

  private val CompactedBatchId = Long.MinValue

  /** Fold one batch: one HLL sketch + row count per key. */
  def partials(batch: DataFrame, spec: Spec, batchId: Long): DataFrame =
    batch.groupBy(spec.keyCols.map(col): _*)
      .agg(hll_sketch_agg(col(spec.distinctCol), lit(spec.lgK))
          .as("__sketch"),
        count(lit(1)).as("__cnt"))
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

  /** Current per-key distinct estimate (exact below the sparse
    * threshold) + maintained row count, from stored sketches alone. */
  def current(store: AppendOnlyStore, spec: Spec): DataFrame =
    deduped(store, spec)
      .groupBy(spec.keyCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("__sketch"), lit(true)))
          .as("n_distinct"),
        sum(col("__cnt")).as("n_rows"))

  /** Distinct estimate across ALL keys — one more union over the same
    * stored sketches; no raw-data pass. */
  def globalDistinct(store: AppendOnlyStore, spec: Spec): Long =
    deduped(store, spec)
      .agg(hll_sketch_estimate(hll_union_agg(col("__sketch"), lit(true)))
        .as("d"))
      .head().getLong(0)

  /** Collapse each key's sketch rows to one (generation-swapped,
    * result-invariant, quiescence contract — see
    * [[IncrementalAgg.compact]]). */
  def compact(store: AppendOnlyStore, spec: Spec): Unit =
    store.compactWith { df =>
      IncrementalJoin.clusterByKeys(df, spec.keyCols)
        .dropDuplicates(spec.keyCols :+ "__batch_id")
        .groupBy(spec.keyCols.map(col): _*)
        .agg(hll_union_agg(col("__sketch"), lit(true)).as("__sketch"),
          sum(col("__cnt")).as("__cnt"))
        .withColumn("__agg_key", aggKey(spec))
        .withColumn("__batch_id", lit(CompactedBatchId))
    }
}
