package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.AppendOnlyStore

/** Incremental QUANTILE maintenance via mergeable KLL sketches — the
  * third leg of the sketch-IVM family ([[IncrementalAgg]]: distributive
  * count/sum/min/max; [[SketchAgg]]: HLL distinct counts; here:
  * rank/quantile state). Quantiles are not distributive — a batch's
  * median tells you nothing about the union — but KLL (Karnin, Lang,
  * Liberty, FOCS 2016; the Datasketches implementation Spark 4 exposes
  * as `kll_*` SQL functions) is a MERGEABLE summary with proven rank
  * error ~1.7%/√? bounded by the k parameter, so "p99 latency per day,
  * maintained forever, raw data never re-read" becomes: fold each batch
  * to one sketch per key, APPEND (batch-sized IO), merge-on-read.
  *
  * Accuracy regimes (the family's standard posture): while a key's
  * total retained item count stays at or below the sketch capacity `k`,
  * KLL performs NO compaction — every value is retained and quantiles
  * are EXACT under the Datasketches INCLUSIVE rank definition
  * (`q(p) = min { v : |{x ≤ v}| / n ≥ p }`), which is precisely SQL's
  * `min(v) FILTER (cume_dist() ≥ p)` — that identity is what lets the
  * driver gate hash-match a DuckDB oracle (q122). Past capacity the
  * published ε·n rank-error bound applies, gated in
  * QuantileSketchAggSpec's large-n test.
  *
  * Crash-replay contract matches the rest of the family: partials are
  * stamped with the logical batch id and deduped on (key, batch) at
  * read/compact — a replayed batch cannot skew ranks.
  */
object QuantileSketchAgg {

  /** @param keyCols  grouping keys (null-safe via JSON-struct hash)
    * @param valueCol the (integer-valued) column whose quantiles are
    *                 maintained — quantize money to cents FIRST, as
    *                 everywhere in this engine
    * @param k        KLL capacity: exactness bound and, beyond it, the
    *                 rank-error/state-size knob (default 200 ≈ 1.65%) */
  final case class Spec(keyCols: Seq[String], valueCol: String,
                        k: Int = 200)

  private def aggKey(spec: Spec) =
    IncrementalJoin.storeKey(spec.keyCols.map(col))

  private val CompactedBatchId = Long.MinValue

  /** Fold one batch: one KLL sketch + row count per key. */
  def partials(batch: DataFrame, spec: Spec, batchId: Long): DataFrame =
    batch.groupBy(spec.keyCols.map(col): _*)
      .agg(kll_sketch_agg_bigint(col(spec.valueCol).cast("long"), spec.k)
          .as("__sketch"),
        count(col(spec.valueCol)).as("__cnt"))
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

  /** Current per-key quantiles at `probs` (columns `q<pct>` with pct =
    * round(p·100)) + maintained non-null count, from stored sketches
    * alone. */
  def current(store: AppendOnlyStore, spec: Spec,
              probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    val merged = deduped(store, spec)
      .groupBy(spec.keyCols.map(col): _*)
      .agg(kll_merge_agg_bigint(col("__sketch"), spec.k).as("__m"),
        sum(col("__cnt")).as("n_rows"))
    val qCols = probs.map { p =>
      kll_sketch_get_quantile_bigint(col("__m"), lit(p))
        .as(s"q${math.round(p * 100)}")
    }
    merged.select(spec.keyCols.map(col) ++ Seq(col("n_rows")) ++ qCols: _*)
  }

  /** Collapse each key's sketch rows to one (generation-swapped,
    * result-invariant below capacity, quiescence contract — see
    * [[IncrementalAgg.compact]]). */
  def compact(store: AppendOnlyStore, spec: Spec): Unit =
    store.compactWith { df =>
      IncrementalJoin.clusterByKeys(df, spec.keyCols)
        .dropDuplicates(spec.keyCols :+ "__batch_id")
        .groupBy(spec.keyCols.map(col): _*)
        .agg(kll_merge_agg_bigint(col("__sketch"), spec.k).as("__sketch"),
          sum(col("__cnt")).as("__cnt"))
        .withColumn("__agg_key", aggKey(spec))
        .withColumn("__batch_id", lit(CompactedBatchId))
    }
}
