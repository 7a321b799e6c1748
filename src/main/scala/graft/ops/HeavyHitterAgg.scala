package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.functions.SpaceSaving
import graft.sinks.AppendOnlyStore

/** Incremental HEAVY-HITTER maintenance via mergeable SpaceSaving
  * summaries — the fourth leg of the sketch-IVM family
  * ([[IncrementalAgg]]: count/sum/min/max; [[SketchAgg]]: HLL distinct;
  * [[QuantileSketchAgg]]: KLL quantiles; here: top-k frequent items).
  * "Top sections per domain, maintained forever, raw tokens never
  * re-read" becomes: fold each batch to one `capacity`-entry summary per
  * key, APPEND (batch-sized IO), merge-on-read through the same eviction
  * rule — mergeable-summaries composition (Agarwal et al., PODS 2012)
  * over Metwally et al.'s SpaceSaving (ICDT 2005).
  *
  * Accuracy regimes (the family's standard posture): with capacity ≥ the
  * key's distinct-item count NOTHING is ever evicted, counts are EXACT
  * and error is zero — that regime is what the q125 driver gate
  * hash-matches against a plain GROUP BY oracle. Past capacity the
  * classic guarantees hold per summary and are preserved by merge:
  * overestimation ≤ N/capacity, and any item with true frequency >
  * N/capacity is present (gated in HeavyHitterAggSpec).
  *
  * Crash-replay contract matches the rest of the family: partials carry
  * the logical batch id and dedupe on (key, batch) at read/compact — a
  * replayed batch cannot double-count.
  */
object HeavyHitterAgg {

  /** @param keyCols  grouping keys (null-safe via JSON-struct hash)
    * @param itemCol  the item column whose frequency ranking is maintained
    * @param capacity summary size: exactness bound below it; beyond it,
    *                 the N/capacity overestimation knob */
  final case class Spec(keyCols: Seq[String], itemCol: String,
                        capacity: Int = 64)

  private def aggKey(spec: Spec) =
    IncrementalJoin.storeKey(spec.keyCols.map(col))

  private val CompactedBatchId = Long.MinValue

  private def ssUdaf(capacity: Int) =
    udaf(SpaceSaving.aggregator(capacity), Encoders.STRING)

  private def mergeUdaf(capacity: Int) =
    udaf(SpaceSaving.mergeAggregator(capacity),
      ExpressionEncoder[Seq[SpaceSaving.HeavyHitter]]())

  /** Fold one batch: one SpaceSaving summary + item count per key. The
    * Aggregator partial-aggregates map-side, so the shuffle carries
    * `capacity` triples per task — never the items themselves. */
  def partials(batch: DataFrame, spec: Spec, batchId: Long): DataFrame =
    // null items are excluded like count(col)/GROUP BY would — otherwise
    // they'd enter the summary but not __cnt, skewing n_rows
    batch.where(col(spec.itemCol).isNotNull)
      .groupBy(spec.keyCols.map(col): _*)
      .agg(ssUdaf(spec.capacity)(col(spec.itemCol).cast("string"))
          .as("__sketch"),
        count(col(spec.itemCol)).as("__cnt"))
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

  /** Current top-`k` items per key from stored summaries alone: merged
    * summary, exploded to one ranked row per item with its count estimate
    * and maximum overcount. */
  def current(store: AppendOnlyStore, spec: Spec, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    deduped(store, spec)
      .groupBy(spec.keyCols.map(col): _*)
      .agg(mergeUdaf(spec.capacity)(col("__sketch")).as("__m"),
        sum(col("__cnt")).as("n_rows"))
      .select(spec.keyCols.map(col) ++ Seq(col("n_rows"),
        posexplode(slice(col("__m"), 1, k))): _*)
      .select(spec.keyCols.map(col) ++ Seq(col("n_rows"),
        (col("pos") + 1).cast("long").as("rk"),
        col("col.item").as("item"),
        col("col.count").as("est_count"),
        col("col.error").as("max_overcount")): _*)
  }

  /** Collapse each key's summary rows to one (generation-swapped,
    * result-invariant below capacity, quiescence contract — see
    * [[IncrementalAgg.compact]]). */
  def compact(store: AppendOnlyStore, spec: Spec): Unit =
    store.compactWith { df =>
      IncrementalJoin.clusterByKeys(df, spec.keyCols)
        .dropDuplicates(spec.keyCols :+ "__batch_id")
        .groupBy(spec.keyCols.map(col): _*)
        .agg(mergeUdaf(spec.capacity)(col("__sketch")).as("__sketch"),
          sum(col("__cnt")).as("__cnt"))
        .withColumn("__agg_key", aggKey(spec))
        .withColumn("__batch_id", lit(CompactedBatchId))
    }
}
