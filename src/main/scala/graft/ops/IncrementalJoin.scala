package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Lineage.LineageSyntax
import graft.sinks.AppendOnlyStore

/** Incremental materialized-JOIN maintenance (multiset delta-join IVM —
  * the counting semantics of DBToaster / classic Δ-rules, kept exact).
  *
  * Maintains `A ⋈ B` (inner equi-join) across an unbounded stream of
  * append batches on EITHER side without ever re-running the full join:
  *
  * {{{ Δout = ΔA ⋈ B_state          (left append)
  *     Δout = A_state ⋈ ΔB          (right append) }}}
  *
  * Each (a, b) pair materializes exactly once — in whichever side's
  * append arrives second — so per-batch work is one delta-sized shuffle
  * join against the other side's key-clustered state store, never
  * history × history. At 100 TB that is the difference between joining a
  * day's ingest against stored state and re-joining two full corpora per
  * refresh (the `overwrite(recompute)` shape this engine bans).
  *
  * Multiset encoding: every stored row — state and output — is a VALUE
  * GROUP `(columns…, __mult)`: the batch's rows grouped by all columns
  * with their multiplicity counted. Duplicate input rows stay exact
  * (output multiplicity is the product `__mult_l · __mult_r`), and every
  * append is deterministic: a crash-replayed batch re-appends
  * byte-identical rows, which the `(values, batch-id)` dedup in
  * [[current]]/[[compactOut]] collapses — the same exactly-once-under-
  * replay contract as [[IncrementalAgg]], with no rewrite of the store.
  * Output rows carry BOTH origin batch ids (`__lbid`, `__rbid`), so an
  * output group is unique per (values, lbid, rbid) and replay dedup
  * never merges genuinely distinct contributions.
  *
  * All three stores cluster on `__jk` (an md5 of the join-key tuple), so
  * state scans arrive pre-bucketed by key prefix and a delta join reads
  * the store once, hash-partitioned — the [[AppendOnlyStore]] layout
  * contract.
  *
  * Contract: join-key columns share names across sides (`on`); all other
  * column names are disjoint. Appends are single-writer; each logical
  * batch carries a unique id per side. Inner join only — outer variants
  * need retraction rows, which an append-only store cannot express.
  */
object IncrementalJoin {

  final case class Stores(left: AppendOnlyStore, right: AppendOnlyStore,
                          out: AppendOnlyStore)

  /** Open the three stores under one root, all clustered on `__jk`.
    * One hex prefix char (16 buckets): a micro-batched store pays file
    * COUNT on every state re-read, so fewer/bigger buckets beat the
    * dedup-store default of 256 (same choice as the q90 agg store). */
  def stores(spark: org.apache.spark.sql.SparkSession, root: String): Stores =
    Stores(
      new AppendOnlyStore(spark, s"$root/left", prefixCol = "__jk", prefixChars = 1),
      new AppendOnlyStore(spark, s"$root/right", prefixCol = "__jk", prefixChars = 1),
      new AppendOnlyStore(spark, s"$root/out", prefixCol = "__jk", prefixChars = 1))

  private val Compacted = Long.MinValue
  private val Meta = Set("__mult", "__bid", "__lbid", "__rbid")

  private val Reserved = Set("__mult", "__bid", "__jk", "__lbid", "__rbid",
    "prefix")

  /** Fold one batch to deterministic value-groups: all columns grouped,
    * multiplicity counted, batch id and join-key hash stamped. */
  private def fold(batch: DataFrame, on: Seq[String], batchId: Long): DataFrame = {
    val clash = batch.columns.filter(Reserved.contains)
    require(clash.isEmpty,
      s"batch columns ${clash.mkString(", ")} collide with the store's " +
        s"bookkeeping columns (${Reserved.mkString(", ")}) — rename them")
    batch.groupBy(batch.columns.map(col): _*)
      .agg(count(lit(1)).as("__mult"))
      .withColumn("__bid", lit(batchId))
      .withColumn("__jk", md5(to_json(struct(on.map(col): _*))))
  }

  /** A side's current state with crash-replay duplicates removed. */
  private def state(store: AppendOnlyStore): DataFrame = {
    val df = store.read()
    df.drop("prefix")
      .dropDuplicates(df.columns.filter(c => c != "__mult" && c != "prefix"))
  }

  private def deltaJoin(delta: DataFrame, other: DataFrame,
                        on: Seq[String], deltaIsLeft: Boolean): DataFrame = {
    val d = delta
      .withColumnRenamed("__mult", "__mult_d")
      .withColumnRenamed("__bid", "__bid_d")
    val o = other
      .drop("__jk")
      .withColumnRenamed("__mult", "__mult_o")
      .withColumnRenamed("__bid", "__bid_o")
    d.join(o, on)
      .withColumn("__mult", col("__mult_d") * col("__mult_o"))
      .withColumn("__lbid", if (deltaIsLeft) col("__bid_d") else col("__bid_o"))
      .withColumn("__rbid", if (deltaIsLeft) col("__bid_o") else col("__bid_d"))
      .drop("__mult_d", "__mult_o", "__bid_d", "__bid_o")
  }

  /** Apply one LEFT-side batch: `Δout = ΔA ⋈ B_state`, then ΔA is added
    * to the left state. Delta-sized shuffles throughout. The lineage cut
    * only happens when the folded delta is consumed twice (delta join +
    * state append) — the first batch on a side has no join to feed, and
    * a materialization job for a single consumer is pure overhead. */
  def appendLeft(stores: Stores, batch: DataFrame, on: Seq[String],
                 batchId: Long): Unit = {
    val joins = stores.right.exists
    val d = if (joins) fold(batch, on, batchId).cutLineage()
            else fold(batch, on, batchId)
    if (joins)
      stores.out.append(deltaJoin(d, state(stores.right), on, deltaIsLeft = true))
    stores.left.append(d)
  }

  /** Apply one RIGHT-side batch: `Δout = A_state ⋈ ΔB`. */
  def appendRight(stores: Stores, batch: DataFrame, on: Seq[String],
                  batchId: Long): Unit = {
    val joins = stores.left.exists
    val d = if (joins) fold(batch, on, batchId).cutLineage()
            else fold(batch, on, batchId)
    if (joins)
      stores.out.append(deltaJoin(d, state(stores.left), on, deltaIsLeft = false))
    stores.right.append(d)
  }

  /** The current join as a value-multiset: all join columns plus `n`
    * (exact row multiplicity of the equivalent `A ⋈ B`). */
  def current(stores: Stores): DataFrame = {
    if (!stores.out.exists) {
      if (!(stores.left.exists && stores.right.exists))
        throw new IllegalStateException("no batches applied to both sides yet")
      // both sides populated but no key has ever matched: the join is
      // EMPTY, not an error — synthesize the zero-row result with the
      // join's schema (key columns are the sides' shared names, per the
      // operator contract)
      val l = state(stores.left).drop("__mult", "__bid", "__jk")
      val r = state(stores.right).drop("__mult", "__bid", "__jk")
      val on = l.columns.toSeq.filter(r.columns.contains(_))
      return l.limit(0).join(r.limit(0), on)
        .withColumn("n", lit(0L))
    }
    val df = stores.out.read().drop("prefix")
    val valueCols = df.columns.filterNot(c => Meta.contains(c) || c == "__jk")
    df.dropDuplicates(valueCols ++ Seq("__lbid", "__rbid"))
      .groupBy(valueCols.map(col): _*)
      .agg(sum(col("__mult")).as("n"))
  }

  /** Collapse each output value-group's accumulated contributions to one
    * row (generation swap; result-invariant under [[current]]). Run at
    * ingest quiescence, single-writer — the store contract.
    *
    * Compaction MOVES the replay boundary: collapsed rows lose their
    * (lbid, rbid) stamps, so a crash-replay of a batch applied BEFORE
    * the compaction regenerates pairs the dedup can no longer match and
    * double-counts. Replays of batches applied after the last
    * compaction stay exactly-once (q163 gates exactly this case). The
    * operational contract is the usual one: compact only once the
    * batches behind it are durably acknowledged and will never replay —
    * identical to [[compactSides]]' and [[IncrementalAgg.compact]]'s
    * quiescence requirement. */
  def compactOut(stores: Stores): Unit =
    stores.out.compactWith { df0 =>
      val df = df0.drop("prefix")
      val valueCols = df.columns.filterNot(c => Meta.contains(c) || c == "__jk")
      df.dropDuplicates(valueCols ++ Seq("__lbid", "__rbid"))
        .groupBy((valueCols :+ "__jk").map(col): _*)
        .agg(sum(col("__mult")).as("__mult"))
        .withColumn("__lbid", lit(Compacted))
        .withColumn("__rbid", lit(Compacted))
    }

  /** Collapse the SIDE stores' per-batch groups to one row per value
    * tuple. After a side compaction, replaying a pre-compaction batch id
    * would double-count — run only at quiescence, the same single-writer
    * boundary every store compaction in this engine assumes. */
  def compactSides(stores: Stores): Unit =
    Seq(stores.left, stores.right).filter(_.exists).foreach { st =>
      st.compactWith { df0 =>
        val df = df0.drop("prefix")
        val valueCols = df.columns.filterNot(c => Meta.contains(c) || c == "__jk")
        df.dropDuplicates(valueCols :+ "__bid")
          .groupBy((valueCols :+ "__jk").map(col): _*)
          .agg(sum(col("__mult")).as("__mult"))
          .withColumn("__bid", lit(Compacted))
      }
    }
}
