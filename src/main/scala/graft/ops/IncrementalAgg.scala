package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.AppendOnlyStore

/** Incremental materialized-aggregate maintenance (IVM for the
  * distributive aggregates): keep per-key `count` + `sum`s current across
  * an unbounded batch stream without ever re-reading the raw data.
  *
  * Each batch folds to per-key PARTIAL rows (one shuffle of the batch,
  * map-side combined) which are APPENDED to an [[AppendOnlyStore]] —
  * per-batch IO is proportional to the batch's key count, never to
  * history (same contract as incremental dedup, and the same reason a
  * snapshot-table `overwrite(read ∪ new)` is banned at 100 TB). Reading
  * the current aggregate re-folds the partials: `sum(count)`, `sum(sum)`
  * — exact because count/sum are distributive; avg derives as sum/count.
  * Periodic [[compact]] collapses a key's accumulated partials to one row
  * (bounding read amplification by compaction cadence) via the store's
  * generation swap, so pinned readers are never disturbed.
  *
  * Non-distributive aggregates (distinct counts, quantiles) need sketch
  * state instead — see the HLL/quantile posture in q51; this module is
  * deliberately exact-only.
  */
object IncrementalAgg {

  /** @param keyCols grouping key columns (null key values allowed — the
    *                internal hash key is null-safe via a JSON struct)
    * @param sumCols numeric columns to maintain sums for; each batch
    *                partial stores them as `__sum_<col>`
    * @param minCols columns to maintain minimums for (`__min_<col>`)
    * @param maxCols columns to maintain maximums for (`__max_<col>`) —
    *                with sum/count these complete the distributive
    *                aggregates (per-key watermarks, freshness, bounds) */
  final case class Spec(keyCols: Seq[String], sumCols: Seq[String],
                        minCols: Seq[String] = Nil,
                        maxCols: Seq[String] = Nil)

  /** Null-safe stable hash of the key tuple — the store's prefix column. */
  private def aggKey(spec: Spec) =
    md5(to_json(struct(spec.keyCols.map(col): _*)))

  /** The batch id [[compact]] stamps on folded rows — below any real
    * batch id, so a fold is never mistaken for a replayed append. */
  private val CompactedBatchId = Long.MinValue

  private def partialAggs(spec: Spec) =
    spec.sumCols.map(c => sum(col(c)).as(s"__sum_$c")) ++
      // per-column NON-NULL counts: what avg divides by (count(*) would
      // silently shift averages of nullable columns)
      spec.sumCols.map(c => count(col(c)).as(s"__cnt_$c")) ++
      spec.minCols.map(c => min(col(c)).as(s"__min_$c")) ++
      spec.maxCols.map(c => max(col(c)).as(s"__max_$c"))

  /** Fold one batch to per-key partial rows (count + per-column
    * sums/mins/maxes), stamped with the batch's id. */
  def partials(batch: DataFrame, spec: Spec, batchId: Long): DataFrame =
    batch.groupBy(spec.keyCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"), partialAggs(spec): _*)
      .withColumn("__agg_key", aggKey(spec))
      .withColumn("__batch_id", lit(batchId))

  /** Maintain the aggregate with one batch: batch-sized shuffle + append.
    *
    * `batchId` must be unique per LOGICAL batch (a streaming foreachBatch
    * id, an ingest sequence number). Replaying a batch with the same id
    * re-appends identical partial rows, which [[current]] and [[compact]]
    * dedupe away — the exactly-once contract under crash-replay, without
    * ever rewriting the store. */
  def appendBatch(store: AppendOnlyStore, batch: DataFrame, spec: Spec,
                  batchId: Long): Unit =
    store.append(partials(batch, spec, batchId))

  /** All stored partials with crash-replay duplicates removed. */
  private def dedupedPartials(store: AppendOnlyStore, spec: Spec): DataFrame =
    store.read().dropDuplicates(spec.keyCols :+ "__batch_id")

  private def refoldAggs(spec: Spec) =
    spec.sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")) ++
      spec.sumCols.map(c => sum(col(s"__cnt_$c")).as(s"cnt_$c")) ++
      spec.minCols.map(c => min(col(s"__min_$c")).as(s"min_$c")) ++
      spec.maxCols.map(c => max(col(s"__max_$c")).as(s"max_$c"))

  /** The current aggregate: re-fold all stored partials. Output columns:
    * keys ++ `n_rows` ++ `sum_<col>` ++ `cnt_<col>` (non-null count —
    * avg's denominator) ++ `min_<col>` ++ `max_<col>`. */
  def current(store: AppendOnlyStore, spec: Spec): DataFrame =
    dedupedPartials(store, spec)
      .groupBy(spec.keyCols.map(col): _*)
      .agg(sum(col("__cnt")).as("n_rows"), refoldAggs(spec): _*)

  /** Collapse each key's partials to a single row (generation-swapped;
    * see [[AppendOnlyStore.compactWith]]). Result-invariant: [[current]]
    * returns the same rows before and after. Single-writer contract: run
    * at ingest quiescence (no batch in flight), like every store
    * compaction. */
  def compact(store: AppendOnlyStore, spec: Spec): Unit =
    store.compactWith { df =>
      val folded =
        spec.sumCols.map(c => sum(col(s"__sum_$c")).as(s"__sum_$c")) ++
          spec.sumCols.map(c => sum(col(s"__cnt_$c")).as(s"__cnt_$c")) ++
          spec.minCols.map(c => min(col(s"__min_$c")).as(s"__min_$c")) ++
          spec.maxCols.map(c => max(col(s"__max_$c")).as(s"__max_$c"))
      df.dropDuplicates(spec.keyCols :+ "__batch_id")
        .groupBy(spec.keyCols.map(col): _*)
        .agg(sum(col("__cnt")).as("__cnt"), folded: _*)
        .withColumn("__agg_key", aggKey(spec))
        .withColumn("__batch_id", lit(CompactedBatchId))
    }
}
