package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sinks.AppendOnlyStore

/** RETRACTABLE extrema maintenance: per-key `min`/`max` (and exact
  * distinct-value counts) kept current under SIGNED input deltas —
  * the aggregate family [[IncrementalAgg.partialsSigned]] deliberately
  * REFUSES, closed here with the state it actually requires.
  *
  * Why refusal was right there: min/max are not subtractable. Deleting
  * the current minimum needs the runner-up, which a folded
  * `(key, min)` partial has already discarded. The minimal state that
  * CAN answer it is the per-key VALUE MULTISET — net multiplicity per
  * distinct (key, value) pair — and that is exactly what this store
  * keeps: batches fold to `(key, value, Σδ)` partials (one batch-sized
  * shuffle, map-side combined), reads fold partials to net value
  * groups, drop groups netting zero, and take min/max over the
  * positive groups — so a takedown wave that deletes every copy of the
  * current minimum surfaces the runner-up EXACTLY, with no recompute.
  *
  * Scale posture: state ∝ distinct (key, value) pairs after
  * compaction — the information-theoretic floor for exact retractable
  * extrema (any correct structure must distinguish "minimum has one
  * copy" from "two"). For heavy-duplication columns (status codes,
  * bucketed measures) this is far below row count; for near-unique
  * columns it degrades to input size, the honest cost of exactness —
  * the KLL quantile sketches ([[QuantileSketchAgg]]) are the bounded
  * alternative when approximate extremes suffice. Same store contract
  * as every IVM sibling: append-only partials stamped with the logical
  * batch id, (key, value, batch) dedup makes crash-replays no-ops,
  * generation-swapped [[compact]] bounds read amplification by
  * compaction cadence.
  *
  * Over-retraction (deleting more copies than exist) is a caller
  * contract violation and stays VISIBLE as a negative `n_rows` net,
  * mirroring [[IncrementalJoin]]'s negative-`n` posture — extrema are
  * then computed over the positive groups only, never silently over
  * phantom values.
  */
object MinMaxAgg {

  /** @param keyCols grouping keys (null-safe via JSON-struct hash)
    * @param valCol  the column whose retractable extrema are maintained
    *                (null values are skipped, min/max semantics) */
  final case class Spec(keyCols: Seq[String], valCol: String)

  private def aggKey(spec: Spec) =
    md5(to_json(struct(spec.keyCols.map(col): _*)))

  private val CompactedBatchId = Long.MinValue

  /** Fold one signed batch to `(keys, value, Σδ)` net rows. */
  def partials(batch: DataFrame, spec: Spec, batchId: Long,
               deltaCol: Option[String]): DataFrame = {
    val dl = deltaCol match {
      case Some(c) =>
        require(batch.columns.contains(c),
          s"signed batch lacks its multiplicity column '$c'")
        col(c).cast("long")
      case None => lit(1L)
    }
    batch.filter(col(spec.valCol).isNotNull)
      .groupBy((spec.keyCols :+ spec.valCol).map(col): _*)
      .agg(sum(dl).as("__net"))
      .filter(col("__net") =!= 0) // a −old/+new pair netting 0 in-batch
      .withColumn("__agg_key", aggKey(spec))
      .withColumn("__batch_id", lit(batchId))
  }

  /** Unsigned append: every row at multiplicity +1. */
  def appendBatch(store: AppendOnlyStore, batch: DataFrame, spec: Spec,
                  batchId: Long): Unit =
    store.appendOnce(partials(batch, spec, batchId, None), batchId)

  /** Signed append: deletes/updates as negative multiplicities. */
  def appendDelta(store: AppendOnlyStore, batch: DataFrame, spec: Spec,
                  batchId: Long, deltaCol: String = "__delta"): Unit =
    store.appendOnce(partials(batch, spec, batchId, Some(deltaCol)), batchId)

  /** Net value groups: `(keys, value, net)` with crash-replay
    * duplicates removed and zero nets dropped. The multiset itself —
    * [[current]]'s input, and directly useful for "all distinct values
    * per key" serving. */
  def currentGroups(store: AppendOnlyStore, spec: Spec): DataFrame =
    store.read()
      .dropDuplicates((spec.keyCols :+ spec.valCol) :+ "__batch_id")
      .groupBy((spec.keyCols :+ spec.valCol).map(col): _*)
      .agg(sum(col("__net")).as("net"))
      .filter(col("net") =!= 0)

  /** The maintained extrema: per key `n_rows` (net row count — negative
    * under over-retraction, visibly), `n_vals` (exact distinct values),
    * `min_<valCol>` / `max_<valCol>` over positively-present values.
    * Keys whose groups all net to zero have been fully deleted and
    * vanish. */
  def current(store: AppendOnlyStore, spec: Spec): DataFrame = {
    val v = col(spec.valCol)
    val pos = col("net") > 0
    currentGroups(store, spec)
      .groupBy(spec.keyCols.map(col): _*)
      .agg(sum(col("net")).as("n_rows"),
        count(when(pos, true)).as("n_vals"),
        min(when(pos, v)).as(s"min_${spec.valCol}"),
        max(when(pos, v)).as(s"max_${spec.valCol}"))
  }

  /** Exact top-`k` values per key (descending by default) straight off
    * the value groups — the serving shape "k largest outstanding
    * balances per nation", maintained under deletes for free because
    * the state is the full value multiset. */
  def topK(store: AppendOnlyStore, spec: Spec, k: Int,
           ascending: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(spec.valCol)
    val w = Window.partitionBy(spec.keyCols.map(col): _*)
      .orderBy(if (ascending) v.asc else v.desc)
    currentGroups(store, spec)
      .filter(col("net") > 0)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Exact per-key DISCRETE quantiles over the net value multiset —
    * `percentile_disc` semantics: for each `q`, the smallest value
    * whose cumulative relative frequency reaches `q` (q=0 → min,
    * q=1 → max). Because the state is the full value multiset, these
    * are EXACT and fully retractable — a takedown wave moves every
    * percentile to precisely where a recompute would put it, the
    * guarantee the mergeable-but-unretractable KLL sketches
    * ([[QuantileSketchAgg]]) cannot give. The reach test runs in
    * integer micro-units (`cum·10⁶ ≥ ⌊q·10⁶⌉·total`) so a float
    * boundary like 0.25·N can never round the rank off by one.
    *
    * Cost shape: one running sum over each key's value groups (a
    * window within the key partition — distributed across keys), then
    * a per-key fold; no all-value collect anywhere. Output columns:
    * keys, `n_rows`, one `p<q·100>` column per requested quantile. */
  /** The output-column label [[quantilesDisc]] gives probability `q` —
    * public so registrants wiring the store into a serve path (e.g. a
    * [[graft.plans.MaterializedAggRewrite]] `discQuantileCurrent`
    * provider) can rename deterministically. */
  def quantileLabel(q: Double): String = {
    val ppm = math.round(q * 1e6)
    if (ppm % 10000 == 0) s"p${ppm / 10000}" else s"p${ppm}ppm"
  }

  def quantilesDisc(store: AppendOnlyStore, spec: Spec,
                    qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty, "no quantiles requested")
    val v = col(spec.valCol)
    val keys = spec.keyCols.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(v.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    val cum = currentGroups(store, spec).filter(col("net") > 0)
      .withColumn("__cum", sum(col("net")).over(wOrd))
      .withColumn("__tot", sum(col("net")).over(wAll))
    // column labels: integer-percent quantiles keep the friendly p<pct>
    // form; anything finer is labeled by its exact micro-unit value
    // (p333300ppm), so 0.333 vs 0.334 can never collide and 0.005 is
    // never mislabeled as p1. Collisions (two qs rounding to the same
    // micro-unit) are refused — the duplicate columns would be
    // ambiguous to reference downstream.
    val labels = qs.map { q =>
      require(q >= 0.0 && q <= 1.0, s"quantile out of [0,1]: $q")
      quantileLabel(q)
    }
    require(labels.distinct.size == labels.size,
      s"quantile labels collide: ${labels.mkString(", ")} — requested " +
        "quantiles must be distinct at micro-unit precision")
    val aggs = qs.zip(labels).map { case (q, label) =>
      val ppm = math.round(q * 1e6)
      min(when(col("__cum") * 1000000L >= lit(ppm) * col("__tot"), v))
        .as(label)
    }
    cum.groupBy(keys: _*)
      .agg(max(col("__tot")).as("n_rows"), aggs: _*)
  }

  /** Collapse each (key, value) group's partials to one net row
    * (generation-swapped; result-invariant — zero nets leave the
    * store). Single-writer, at ingest quiescence, like every sibling. */
  def compact(store: AppendOnlyStore, spec: Spec): Unit =
    store.compactWith { df =>
      df.dropDuplicates((spec.keyCols :+ spec.valCol) :+ "__batch_id")
        .groupBy((spec.keyCols :+ spec.valCol).map(col): _*)
        .agg(sum(col("__net")).as("__net"))
        .filter(col("__net") =!= 0)
        .withColumn("__agg_key", aggKey(spec))
        .withColumn("__batch_id", lit(CompactedBatchId))
    }
}
