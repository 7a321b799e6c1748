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
    IncrementalJoin.storeKey(spec.keyCols.map(col))

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
    IncrementalJoin.clusterByKeys(store.read(), spec.keyCols :+ spec.valCol)
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

  /** Conf key: the per-key distinct-value count past which
    * [[quantilesDisc]] abandons the single-partition per-key sort
    * window for the histogram-narrowed selection. The window path
    * sorts ALL of a key's distinct values in ONE task — fine for
    * dimension keys, a straggler (and at 100× a spill) for a hot key
    * over a high-cardinality value domain. */
  val DiscWindowMaxDistinctKey = "spark.graft.minmax.discWindowMaxDistinct"

  private def checkLabels(qs: Seq[Double]): Seq[String] = {
    // column labels: integer-percent quantiles keep the friendly p<pct>
    // form; anything finer is labeled by its exact micro-unit value
    // (p333300ppm), so 0.333 vs 0.334 can never collide and 0.005 is
    // never mislabeled as p1. Collisions (two qs rounding to the same
    // micro-unit) are refused — the duplicate columns would be
    // ambiguous to reference downstream.
    require(qs.nonEmpty, "no quantiles requested")
    val labels = qs.map { q =>
      require(q >= 0.0 && q <= 1.0, s"quantile out of [0,1]: $q")
      quantileLabel(q)
    }
    require(labels.distinct.size == labels.size,
      s"quantile labels collide: ${labels.mkString(", ")} — requested " +
        "quantiles must be distinct at micro-unit precision")
    labels
  }

  def quantilesDisc(store: AppendOnlyStore, spec: Spec,
                    qs: Seq[Double]): DataFrame = {
    val labels = checkLabels(qs)
    val groups = currentGroups(store, spec).filter(col("net") > 0)
    // serve-side skew guard: the window path's per-key sort is ideal
    // while every key's distinct-value count is modest; past the
    // threshold (a hot key over a near-unique value domain) route
    // through histogram narrowing — candidate buckets only are sorted,
    // bit-equal results both regimes (MinMaxAggSpec pins equality).
    // Non-numeric value columns stay on the window path (bucket
    // arithmetic needs an order-preserving numeric cast).
    val numeric = groups.schema(spec.valCol).dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    val threshold = store.session.conf
      .get(DiscWindowMaxDistinctKey, "65536").toLong
    val useHistogram = numeric && {
      val maxNv = groups.groupBy(spec.keyCols.map(col): _*)
        .agg(count(lit(1)).as("__nv"))
        .agg(max(col("__nv"))).collect()(0)
      !maxNv.isNullAt(0) && maxNv.getLong(0) > threshold
    }
    if (useHistogram) discByHistogram(groups, spec, qs, labels)
    else discByWindow(groups, spec, qs, labels)
  }

  private def discByWindow(groups: DataFrame, spec: Spec, qs: Seq[Double],
                           labels: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(spec.valCol)
    val keys = spec.keyCols.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(v.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    val cum = groups
      .withColumn("__cum", sum(col("net")).over(wOrd))
      .withColumn("__tot", sum(col("net")).over(wAll))
    val aggs = qs.zip(labels).map { case (q, label) =>
      val ppm = math.round(q * 1e6)
      min(when(col("__cum") * 1000000L >= lit(ppm) * col("__tot"), v))
        .as(label)
    }
    cum.groupBy(keys: _*)
      .agg(max(col("__tot")).as("n_rows"), aggs: _*)
  }

  /** The hot-key regime: two narrowing passes instead of one per-key
    * global sort. (1) bucket each key's value range into ≤1024 range
    * buckets (the mapping only needs to be MONOTONE in the value, so a
    * lossy double cast of a wide integer is still exact), cumulate
    * bucket counts per key — ≤1024 rows per key reach that window;
    * (2) for each requested rank, sort ONLY the target bucket's rows.
    * The reach condition `cum·10⁶ ≥ ppm·tot` is equivalent to
    * `cum ≥ r` with `r = max(1, ⌈ppm·tot/10⁶⌉)` (cum is integral and
    * strictly increasing across value groups), so picking the value at
    * rank r inside the bucket whose cumulative span covers r is
    * bit-identical to the window path. */
  private def discByHistogram(groups: DataFrame, spec: Spec,
                              qs: Seq[Double],
                              labels: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = 1024
    val v = col(spec.valCol)
    val keys = spec.keyCols.map(col)
    val kn = spec.keyCols
    val g = groups.withColumn("__vd", v.cast("double"))
    val stats = g.groupBy(keys: _*).agg(
      min(col("__vd")).as("__lo"), max(col("__vd")).as("__hi"),
      sum(col("net")).as("__tot"))
    val withB = g.join(stats, kn)
      .withColumn("__bkt", least(lit((B - 1).toLong),
        floor((col("__vd") - col("__lo")) /
          ((col("__hi") - col("__lo") + lit(1.0)) / lit(B.toDouble)))))
    val wB = Window.partitionBy(keys: _*).orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumB = withB.groupBy((keys :+ col("__bkt")): _*)
      .agg(sum(col("net")).as("__bc"))
      .withColumn("__cumb", sum(col("__bc")).over(wB))
    // one (key, ppm, rank) row per requested quantile
    val targets = stats.select((keys :+ col("__tot")): _*)
      .withColumn("__ppm",
        explode(array(qs.map(q => lit(math.round(q * 1e6))): _*)))
      .withColumn("__r", greatest(lit(1L),
        expr("(__ppm * __tot + 999999) div 1000000")))
    // the bucket whose cumulative span first covers rank r, with the
    // count of all strictly-lower buckets riding along
    val tb = targets.join(cumB, kn)
      .filter(col("__cumb") >= col("__r"))
      .groupBy((keys :+ col("__ppm")): _*)
      .agg(min(col("__r")).as("__r"),
        min_by(struct(col("__bkt"), (col("__cumb") - col("__bc"))
          .as("__before")), col("__bkt")).as("__t"))
      .select((keys :+ col("__ppm") :+ col("__r") :+
        col("__t.__bkt").as("__bkt") :+ col("__t.__before")
          .as("__before")): _*)
    // sort ONLY the target bucket's value groups
    val cand = withB.select((keys :+ v :+ col("net") :+ col("__bkt")): _*)
      .join(tb, kn :+ "__bkt")
    val wV = Window.partitionBy((keys :+ col("__ppm")): _*)
      .orderBy(v.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hit = cand.withColumn("__cin", sum(col("net")).over(wV))
      .filter(col("__before") + col("__cin") >= col("__r"))
      .groupBy((keys :+ col("__ppm")): _*).agg(min(v).as("__val"))
    val pivoted = hit.groupBy(keys: _*)
      .pivot("__ppm", qs.map(q => math.round(q * 1e6)))
      .agg(first(col("__val")))
    val renamed = qs.zip(labels).foldLeft(pivoted) { case (d, (q, label)) =>
      d.withColumnRenamed(math.round(q * 1e6).toString, label)
    }
    stats.select((keys :+ col("__tot").as("n_rows")): _*)
      .join(renamed, kn)
      .select((keys :+ col("n_rows")) ++ labels.map(col): _*)
  }

  /** The output-column label [[quantilesCont]] gives probability `q`. */
  def contLabel(q: Double): String = {
    val ppm = math.round(q * 1e6)
    if (ppm % 10000 == 0) s"c${ppm / 10000}" else s"c${ppm}ppm"
  }

  /** Exact per-key CONTINUOUS (interpolated) quantiles over the net
    * value multiset — `percentile_cont` semantics, computed with
    * Catalyst `Percentile`'s exact weighted form
    * `(⌈h⌉−h)·v_lo + (h−⌊h⌋)·v_hi` at `h = (n−1)·q` (NOT the
    * algebraically-equal `lo + (hi−lo)·frac`, which differs in the
    * last ulp), so serving it in place of the builtin is bit-identical.
    * Needs the two rank-adjacent values — the SAME value-multiset
    * state as [[quantilesDisc]], one more conditional min per q.
    * Fully retractable like every read off this store. Output: keys,
    * `n_rows`, one double `c<q·100>` column per quantile. */
  def quantilesCont(store: AppendOnlyStore, spec: Spec,
                    qs: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qs.nonEmpty, "no quantiles requested")
    qs.foreach(q => require(q >= 0.0 && q <= 1.0,
      s"quantile out of [0,1]: $q"))
    val labels = qs.map(contLabel)
    require(labels.distinct.size == labels.size,
      s"quantile labels collide: ${labels.mkString(", ")}")
    val v = col(spec.valCol)
    val keys = spec.keyCols.map(col)
    val wOrd = Window.partitionBy(keys: _*).orderBy(v.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keys: _*)
    val cum = currentGroups(store, spec).filter(col("net") > 0)
      .withColumn("__cum", sum(col("net")).over(wOrd))
      .withColumn("__tot", sum(col("net")).over(wAll))
    // per q: the values at 1-indexed ranks ⌊h⌋+1 and ⌈h⌉+1 (h computed
    // per key inside the reach predicates — __tot is a per-row column
    // there, legal inside an aggregate's argument)
    def h = (col("__tot") - 1).cast("double")
    val aggs = qs.zipWithIndex.flatMap { case (q, i) =>
      val lo = floor(h * lit(q)) + lit(1L)
      val hi = ceil(h * lit(q)) + lit(1L)
      Seq(min(when(col("__cum") >= lo, v)).as(s"__lo_$i"),
        min(when(col("__cum") >= hi, v)).as(s"__hi_$i"))
    }
    val folded = cum.groupBy(keys: _*)
      .agg(max(col("__tot")).as("n_rows"), aggs: _*)
    val outCols = qs.zip(labels).zipWithIndex.map { case ((q, label), i) =>
      val hK = (col("n_rows") - 1).cast("double") * lit(q)
      val fl = floor(hK); val ce = ceil(hK)
      when(ce === fl, col(s"__lo_$i").cast("double"))
        .otherwise(
          (ce.cast("double") - hK) * col(s"__lo_$i").cast("double") +
          (hK - fl.cast("double")) * col(s"__hi_$i").cast("double"))
        .as(label)
    }
    folded.select((keys :+ col("n_rows")) ++ outCols: _*)
  }

  /** Collapse each (key, value) group's partials to one net row
    * (generation-swapped; result-invariant — zero nets leave the
    * store). Single-writer, at ingest quiescence, like every sibling. */
  def compact(store: AppendOnlyStore, spec: Spec): Unit =
    store.compactWith { df =>
      IncrementalJoin.clusterByKeys(df, spec.keyCols :+ spec.valCol)
        .dropDuplicates((spec.keyCols :+ spec.valCol) :+ "__batch_id")
        .groupBy((spec.keyCols :+ spec.valCol).map(col): _*)
        .agg(sum(col("__net")).as("__net"))
        .filter(col("__net") =!= 0)
        .withColumn("__agg_key", aggKey(spec))
        .withColumn("__batch_id", lit(CompactedBatchId))
    }
}
