package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.Lineage.LineageSyntax
import graft.sinks.AppendOnlyStore

/** CHAINED incremental view maintenance: a maintained JOIN whose
  * per-batch Δ-output feeds a maintained AGGREGATE downstream — the
  * two-stage pipeline (`SELECT k, agg(x) FROM A ⋈ B GROUP BY k`) kept
  * current end-to-end at delta cost per batch on either input.
  *
  * This is the STORE-level composition [[graft.plans
  * .MaterializedJoinRewrite]] only simulates at query time: the rewrite
  * re-aggregates the join state on every read (state-sized), while this
  * chain maintains the aggregate itself, so a read folds per-key
  * partials whose count is bounded by compaction cadence — the shape a
  * dashboard-over-100 TB needs.
  *
  * '''The Δ-rule composes.''' The join's per-batch output is a SIGNED
  * value-group multiset (`columns…, __mult` — products of input
  * multiplicities, negative under delete waves). Distributive
  * aggregates are linear in multiplicity, so that Δ-output IS a valid
  * signed input batch for [[IncrementalAgg.appendDelta]]: `count += Σ
  * __mult`, `sum(c) += Σ c·__mult`, per key. No stage ever sees raw
  * history.
  *
  * '''Exactly-once, once.''' The join's applied-batch-id manifest
  * no-ops a replayed batch BEFORE the tap fires, so a replay reaches
  * neither the out store nor the downstream aggregate — the chain
  * inherits the join's replay boundary instead of stacking a second
  * one. A crash INSIDE the window (after the out-append or tap, before
  * the done-marker) re-taps identical partial rows on retry, which the
  * agg store's (keys, batch-id) dedup absorbs. The downstream batch-id
  * space interleaves sides as `2·id` / `2·id + 1` (ids must stay below
  * 2⁶²; both sides of one logical id stay distinct without coordinating
  * the caller's two id sequences).
  *
  * Single-writer per chain, like every store in this engine. min/max
  * specs are refused by [[IncrementalAgg.partialsSigned]] (not
  * retractable) — chain them only on append-only inputs via a separate
  * unsigned aggregate.
  */
object ChainedIvm {

  /** One maintained chain: the join stores + the downstream agg store
    * and its spec (`spec` columns refer to JOIN-OUTPUT columns), plus
    * an optional SECOND downstream — a [[MinMaxAgg]] value-multiset
    * keeping retractable min/max/top-k/quantiles of a join-output
    * column, possibly keyed coarser than the aggregate. Both sinks
    * consume the same Δ-output under the same replay boundary. */
  final case class Stores(join: IncrementalJoin.Stores, on: Seq[String],
                          agg: AppendOnlyStore, spec: IncrementalAgg.Spec,
                          extrema: Option[(AppendOnlyStore, MinMaxAgg.Spec)] =
                            None)

  /** Open a chain under one root (join state under `<root>/join`, the
    * downstream aggregate under `<root>/agg`, the optional extrema
    * multiset under `<root>/extrema`). */
  def stores(spark: SparkSession, root: String, on: Seq[String],
             spec: IncrementalAgg.Spec, buckets: Int = 16,
             extremaSpec: Option[MinMaxAgg.Spec] = None): Stores =
    Stores(IncrementalJoin.stores(spark, s"$root/join", buckets), on,
      new AppendOnlyStore(spark, s"$root/agg",
        prefixCol = "__agg_key", prefixChars = 1), spec,
      extremaSpec.map(es => (new AppendOnlyStore(spark, s"$root/extrema",
        prefixCol = "__agg_key", prefixChars = 1), es)))

  private def tap(c: Stores, downstreamId: Long): DataFrame => Unit =
    dOut => {
      val signed0 = dOut.drop("__jk", "__lbid", "__rbid")
        .withColumnRenamed("__mult", "__delta")
      // two sinks re-read the frame — cut once so the delta join behind
      // it is not recomputed per sink
      val signed =
        if (c.extrema.isDefined) signed0.cutLineage() else signed0
      IncrementalAgg.appendDelta(c.agg, signed, c.spec, downstreamId)
      c.extrema.foreach { case (st, es) =>
        MinMaxAgg.appendDelta(st, signed, es, downstreamId)
      }
    }

  private def append(c: Stores, batch: DataFrame, batchId: Long,
                     isLeft: Boolean, deltaCol: Option[String]): Unit = {
    require(batchId >= 0 && batchId < (1L << 62),
      s"chained batch ids must be in [0, 2^62): $batchId")
    val dsId = 2L * batchId + (if (isLeft) 0L else 1L)
    IncrementalJoin.appendSide(c.join, batch, c.on, batchId, isLeft,
      deltaCol, Some(tap(c, dsId)))
  }

  /** One LEFT-side batch through the whole chain: `Δout = ΔA ⋈ B_state`
    * lands in the join's out store AND as signed partials in the
    * downstream aggregate. */
  def appendLeft(c: Stores, batch: DataFrame, batchId: Long): Unit =
    append(c, batch, batchId, isLeft = true, None)

  /** One RIGHT-side batch through the whole chain. */
  def appendRight(c: Stores, batch: DataFrame, batchId: Long): Unit =
    append(c, batch, batchId, isLeft = false, None)

  /** SIGNED left-side batch (delete/update waves): the retractions flow
    * through the join Δ-rule into negative downstream partials. */
  def appendLeftDelta(c: Stores, batch: DataFrame, batchId: Long,
                      deltaCol: String = "__delta"): Unit =
    append(c, batch, batchId, isLeft = true, Some(deltaCol))

  /** SIGNED right-side batch. */
  def appendRightDelta(c: Stores, batch: DataFrame, batchId: Long,
                       deltaCol: String = "__delta"): Unit =
    append(c, batch, batchId, isLeft = false, Some(deltaCol))

  /** The maintained aggregate — folds the agg store's partials only;
    * never touches the join state, let alone raw inputs. */
  def currentAgg(c: Stores): DataFrame = IncrementalAgg.current(c.agg, c.spec)

  /** The maintained join multiset (same as an un-chained read). */
  def currentJoin(c: Stores): DataFrame = IncrementalJoin.current(c.join)

  /** The maintained extrema (requires an `extremaSpec` at open):
    * per-key `n_rows`/`n_vals`/`min_`/`max_` over the JOIN output. */
  def currentExtrema(c: Stores): DataFrame = {
    val (st, es) = requireExtrema(c)
    MinMaxAgg.current(st, es)
  }

  /** Exact discrete quantiles of the joined column (requires an
    * `extremaSpec` at open) — [[MinMaxAgg.quantilesDisc]] over the
    * maintained value multiset. */
  def quantiles(c: Stores, qs: Seq[Double]): DataFrame = {
    val (st, es) = requireExtrema(c)
    MinMaxAgg.quantilesDisc(st, es, qs)
  }

  private def requireExtrema(c: Stores) = c.extrema.getOrElse(
    throw new IllegalStateException(
      "this chain was opened without an extremaSpec"))

  /** The extrema store as a SERVE LEVEL for the SQL rewrite (requires
    * an `extremaSpec` at open): registered in a
    * [[graft.plans.MaterializedJoinRewrite.JoinMv]]'s `aggServe` list
    * (after the agg level), a `min/max/percentile_disc(p) GROUP BY
    * <extrema keys>` over the raw paths is answered EXACTLY from the
    * [[MinMaxAgg]] value multiset — the retractable store the chain
    * already maintains. `count(*)` is declined at this level
    * (`countRowsExact = false`: the multiset counts non-null values
    * only) so counting queries keep the cheaper agg-partials or
    * join-state path. Registrant contract (see
    * [[graft.plans.MaterializedAggRewrite.MvDef]]): the extrema value
    * column is effectively non-null — groups whose every value is null
    * would vanish from this serve level. */
  def extremaServe(c: Stores): graft.plans.MaterializedAggRewrite.MvDef = {
    val (st, es) = requireExtrema(c)
    graft.plans.MaterializedAggRewrite.MvDef(
      keyCols = es.keyCols, sumCols = Nil,
      current = () => MinMaxAgg.current(st, es),
      minCols = Seq(es.valCol), maxCols = Seq(es.valCol),
      discQuantileCurrent = Map(es.valCol -> { ps =>
        ps.foldLeft(MinMaxAgg.quantilesDisc(st, es, ps)) { (d, p) =>
          d.withColumnRenamed(MinMaxAgg.quantileLabel(p),
            s"__qd_${math.round(p * 1e6)}")
        }
      }),
      contQuantileCurrent = Map(es.valCol -> { ps =>
        ps.foldLeft(MinMaxAgg.quantilesCont(st, es, ps)) { (d, p) =>
          d.withColumnRenamed(MinMaxAgg.contLabel(p),
            s"__qc_${math.round(p * 1e6)}")
        }
      }),
      countRowsExact = false)
  }

  /** Compact every store in the chain (quiescence, single-writer). */
  def compact(c: Stores): Unit = {
    IncrementalJoin.compactOut(c.join)
    IncrementalJoin.compactSides(c.join, c.on)
    IncrementalAgg.compact(c.agg, c.spec)
    c.extrema.foreach { case (st, es) => MinMaxAgg.compact(st, es) }
  }
}
