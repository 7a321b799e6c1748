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
    IncrementalJoin.storeKey(spec.keyCols.map(col))

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
    store.appendOnce(partials(batch, spec, batchId), batchId)

  /** [[partials]] for a SIGNED batch: `deltaCol` carries each row's
    * signed multiplicity (+1 insert, −1 delete — a takedown wave maps
    * each removed row to the previously-inserted values with −1). Counts
    * become `sum(delta)` and sums `sum(col · delta)` — the distributive
    * aggregates are linear in the input multiset, so retractions flow
    * through the same partial rows and the read-side re-fold nets them.
    *
    * min/max are NOT retractable from partials (deleting the current
    * minimum needs the runner-up, which the partial discarded) — a spec
    * carrying minCols/maxCols is REFUSED here rather than silently
    * drifting; recompute such aggregates from the raw table after a
    * delete wave, or maintain them without deletes. */
  def partialsSigned(batch: DataFrame, spec: Spec, batchId: Long,
                     deltaCol: String): DataFrame = {
    require(spec.minCols.isEmpty && spec.maxCols.isEmpty,
      "min/max partials are not retractable — a signed batch cannot " +
        "maintain minCols/maxCols (deleting the current extremum needs " +
        "the discarded runner-up); drop them from the Spec or recompute")
    require(batch.columns.contains(deltaCol),
      s"signed batch lacks its multiplicity column '$deltaCol'")
    val dl = col(deltaCol).cast("long")
    val aggs =
      // the product is cast back to the column's own type so the partial
      // row schema matches unsigned appendBatch partials exactly (decimal
      // multiplication would otherwise widen the precision and split the
      // store's parquet schema)
      spec.sumCols.map(c =>
        sum((col(c) * dl).cast(batch.schema(c).dataType)).as(s"__sum_$c")) ++
        spec.sumCols.map(c =>
          sum(when(col(c).isNotNull, dl).otherwise(0L)).as(s"__cnt_$c"))
    batch.groupBy(spec.keyCols.map(col): _*)
      .agg(sum(dl).as("__cnt"), aggs: _*)
      .withColumn("__agg_key", aggKey(spec))
      .withColumn("__batch_id", lit(batchId))
  }

  /** Maintain the aggregate with one SIGNED batch (delete/update waves as
    * negative multiplicities) — same exactly-once replay contract as
    * [[appendBatch]]. Keys whose row count nets to zero vanish from
    * [[current]]; retracting more than was inserted is a contract
    * violation that stays visible as a negative `n_rows` rather than
    * being silently clamped. */
  def appendDelta(store: AppendOnlyStore, batch: DataFrame, spec: Spec,
                  batchId: Long, deltaCol: String = "__delta"): Unit =
    store.appendOnce(partialsSigned(batch, spec, batchId, deltaCol), batchId)

  /** All stored partials with crash-replay duplicates removed,
    * pre-clustered on the keys so the dedup and the refold share one
    * exchange ([[IncrementalJoin.clusterByKeys]]). */
  private def dedupedPartials(store: AppendOnlyStore, spec: Spec): DataFrame =
    IncrementalJoin.clusterByKeys(store.read(), spec.keyCols)
      .dropDuplicates(spec.keyCols :+ "__batch_id")

  private def refoldAggs(spec: Spec) =
    spec.sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")) ++
      spec.sumCols.map(c => sum(col(s"__cnt_$c")).as(s"cnt_$c")) ++
      spec.minCols.map(c => min(col(s"__min_$c")).as(s"min_$c")) ++
      spec.maxCols.map(c => max(col(s"__max_$c")).as(s"max_$c"))

  /** The current aggregate: re-fold all stored partials. Output columns:
    * keys ++ `n_rows` ++ `sum_<col>` ++ `cnt_<col>` (non-null count —
    * avg's denominator) ++ `min_<col>` ++ `max_<col>`. Keys whose signed
    * partials net to zero rows have been fully deleted and vanish;
    * negative nets (over-retraction, a contract violation) stay visible. */
  def current(store: AppendOnlyStore, spec: Spec): DataFrame =
    dedupedPartials(store, spec)
      .groupBy(spec.keyCols.map(col): _*)
      .agg(sum(col("__cnt")).as("n_rows"), refoldAggs(spec): _*)
      .filter(col("n_rows") =!= 0)

  /** [[current]] restricted by a predicate over KEY columns, applied
    * BEFORE the refold so it reaches the store's parquet scan (row-group
    * skipping; and when the store's `prefixCol` is one of the keys, the
    * caller can conjoin a matching `prefix` filter for directory-level
    * pruning). Key-column predicates are sound pre-refold: a key's
    * partials all carry the same key values, so filtering partials and
    * filtering refolded rows select the same keys. */
  def current(store: AppendOnlyStore, spec: Spec,
              keyWhere: org.apache.spark.sql.Column): DataFrame =
    currentFrom(store.read().filter(keyWhere), spec)

  /** The refold over CALLER-RESTRICTED raw partials (a `store.read()`
    * the caller has filtered or semi-joined down — e.g. to a batch's
    * keys). This is how a delta-bounded maintenance step reads state
    * without shuffling it whole: the restriction (a broadcast semi-join
    * against delta-sized keys, or a pushed-down predicate) bounds what
    * the refold's `groupBy` exchanges to the MATCHED partials, while the
    * store itself is only scanned. The restriction must be KEY-COMPLETE:
    * it keeps either all of a key's partial rows or none (any predicate /
    * semi-join on key columns is, since every partial of a key carries
    * identical key values) — a batch-id or value-column restriction
    * would refold a key from half its history and is unsound here. */
  def currentFrom(partials: DataFrame, spec: Spec): DataFrame =
    IncrementalJoin.clusterByKeys(partials, spec.keyCols)
      .dropDuplicates(spec.keyCols :+ "__batch_id")
      .groupBy(spec.keyCols.map(col): _*)
      .agg(sum(col("__cnt")).as("n_rows"), refoldAggs(spec): _*)
      .filter(col("n_rows") =!= 0)

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
      IncrementalJoin.clusterByKeys(df, spec.keyCols)
        .dropDuplicates(spec.keyCols :+ "__batch_id")
        .groupBy(spec.keyCols.map(col): _*)
        .agg(sum(col("__cnt")).as("__cnt"), folded: _*)
        .filter(col("__cnt") =!= 0) // fully-retracted keys leave the store
        .withColumn("__agg_key", aggKey(spec))
        .withColumn("__batch_id", lit(CompactedBatchId))
    }
}
