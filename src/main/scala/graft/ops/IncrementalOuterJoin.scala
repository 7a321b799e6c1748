package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructField

import graft.ops.Lineage.LineageSyntax
import graft.sinks.AppendOnlyStore

/** Incremental LEFT OUTER join maintenance, layered on
  * [[IncrementalJoin]]'s Δ-rule stores (the reference's own J1 is a LEFT
  * equi-join — `models/curated_provider.sql:66-68` — so the enrichment
  * shape an IVM user actually runs is outer, not inner).
  *
  * The outer result is the inner multiset PLUS one null-extended row per
  * currently-unmatched left value group:
  *
  * {{{ A ⟕ B  =  (A ⋈ B)  ∪  { (a, NULLs) · m : a ∈ A unmatched } }}}
  *
  * An append-only store cannot delete the null-extended row when its key
  * later matches, so the UNMATCHED side is a SIGNED multiset (`un`
  * store): a left delta appends `+mult` groups for its unmatched rows,
  * and the FIRST right delta that brings a key appends `-mult`
  * retractions for every left group it just matched. The read-side
  * per-group sum then nets to the live unmatched multiset — the same
  * fold [[IncrementalJoin.current]] already runs, extended to signed
  * values. Keys only ever gain matches under append-only inputs, so each
  * left group retracts at most once and the net is exactly 0 or its
  * original multiplicity.
  *
  * Per-batch plan shape matches the inner operator's scale contract:
  * states are scanned via their bucketed tables (zero state-side
  * exchange); every join/semi-join builds its hash from the DELTA side.
  * A right append derives its "newly matched keys" without shuffling
  * state: `state ⋉ Δkeys` streams the state past a delta-built hash, and
  * the two key sets that remain (delta keys, previously-present delta
  * keys) are both delta-sized. Retractions are `leftState ⋉ newKeys` —
  * again state streaming past a delta-sized build.
  *
  * Exactly-once: the same applied-batch-id manifest as the inner
  * operator (replays are append-time no-ops). The `un` read dedups on
  * (values, `__bid`, `__tbid`) — the left group's own batch id plus the
  * id of the batch that EMITTED the row (itself for `+`, the matching
  * right batch for `-`) — so mid-write crash retries can never
  * double-retract. A right retry additionally excludes its own batch id
  * from the prior-state probe, so rows a crashed attempt partially
  * committed cannot masquerade as pre-existing matches.
  *
  * Contract: [[IncrementalJoin]]'s, plus: the right side's schema must
  * exist (at least one right append) before [[current]] — the null
  * extension needs the right column types.
  */
object IncrementalOuterJoin {

  final case class Stores(inner: IncrementalJoin.Stores, un: AppendOnlyStore)

  def stores(spark: org.apache.spark.sql.SparkSession, root: String,
             buckets: Int = 16): Stores =
    Stores(IncrementalJoin.stores(spark, root, buckets),
      new AppendOnlyStore(spark, s"$root/un", prefixCol = "__jk",
        prefixChars = 1))

  private val UnMeta = Set("__mult", "__bid", "__tbid")

  /** Apply one LEFT-side batch: inner Δ-rule output for the matched part,
    * a `+mult` unmatched group for the rest. */
  def appendLeft(st: Stores, batch: DataFrame, on: Seq[String],
                 batchId: Long): Unit = {
    val in = st.inner
    if (in.hasMarker(s"left.$batchId.done")) return
    if (in.hasMarker(s"left.$batchId.started")) in.touch("left.dirty")
    in.touch(s"left.$batchId.started")
    val d = IncrementalJoin.fold(batch, on, batchId).cutLineage()
    val unmatched =
      if (in.sideExists(false)) {
        val dOut = IncrementalJoin.deltaJoin(d,
          IncrementalJoin.sideState(in, isLeft = false), on,
          deltaIsLeft = true).cutLineage()
        in.out.append(dOut)
        // a delta key reaches dOut iff the right state holds it, so the
        // matched-key set is derivable from the (delta-sized) join output
        // — no second probe of the state
        val matchedKeys = dOut.select(on.map(col): _*).distinct()
        d.join(matchedKeys.hint("SHUFFLE_HASH"), on, "left_anti")
      } else d
    st.un.append(unmatched.withColumn("__tbid", lit(batchId)))
    IncrementalJoin.appendToTable(in, isLeft = true, d, on)
    in.touch(s"left.$batchId.done")
  }

  /** Apply one RIGHT-side batch: inner Δ-rule output, plus `-mult`
    * retractions for every left group whose key this batch matched for
    * the first time. */
  def appendRight(st: Stores, batch: DataFrame, on: Seq[String],
                  batchId: Long): Unit = {
    val in = st.inner
    if (in.hasMarker(s"right.$batchId.done")) return
    if (in.hasMarker(s"right.$batchId.started")) in.touch("right.dirty")
    in.touch(s"right.$batchId.started")
    val d = IncrementalJoin.fold(batch, on, batchId).cutLineage()
    val leftExists = in.sideExists(true)
    if (leftExists)
      in.out.append(IncrementalJoin.deltaJoin(d,
        IncrementalJoin.sideState(in, isLeft = true), on,
        deltaIsLeft = false))
    if (leftExists) {
      val dKeys = d.select(on.map(col): _*).distinct()
      val newKeys =
        if (in.sideExists(false)) {
          // keys of this delta already present in the right state BEFORE
          // this batch (excluding rows a crashed attempt of THIS id may
          // have partially committed): state streams past the delta-built
          // hash, output is at most delta-key-sized
          val prior = IncrementalJoin.sideState(in, isLeft = false)
            .filter(col("__bid") =!= batchId)
            .join(dKeys.hint("SHUFFLE_HASH"), on, "left_semi")
            .select(on.map(col): _*).distinct()
          dKeys.join(prior.hint("SHUFFLE_HASH"), on, "left_anti")
        } else dKeys
      val retract = IncrementalJoin.sideState(in, isLeft = true)
        .join(newKeys.hint("SHUFFLE_HASH"), on, "left_semi")
        .withColumn("__mult", -col("__mult"))
        .withColumn("__jk", md5(to_json(struct(on.map(col): _*))))
        .withColumn("__tbid", lit(batchId))
      st.un.append(retract)
    }
    IncrementalJoin.appendToTable(in, isLeft = false, d, on)
    in.touch(s"right.$batchId.done")
  }

  /** Collapse the un store's signed contributions to one netted row per
    * value group, dropping fully-retracted (net-0) groups — the
    * generation-swap compaction of the signed multiset. Result-invariant
    * under [[current]]; replay safety rests on the manifest (same
    * contract as [[IncrementalJoin.compactOut]]). Run at quiescence. */
  def compactUn(st: Stores): Unit =
    st.un.compactWith { df0 =>
      val df = df0.drop("prefix")
      val valueCols = df.columns
        .filterNot(c => UnMeta.contains(c) || c == "__jk").toSeq
      df.dropDuplicates(valueCols ++ Seq("__bid", "__tbid"))
        .groupBy((valueCols :+ "__jk").map(col): _*)
        .agg(sum(col("__mult")).as("__mult"))
        .filter(col("__mult") =!= 0)
        .withColumn("__bid", lit(Long.MinValue))
        .withColumn("__tbid", lit(Long.MinValue))
    }

  /** The current LEFT OUTER join as a value-multiset: left ∪ right
    * columns plus `n`; unmatched left groups carry NULL right columns. */
  def current(st: Stores): DataFrame = {
    val in = st.inner
    require(in.sideExists(false),
      "left-outer read needs the right side's schema — apply at least " +
        "one right batch first (an empty one is fine)")
    require(in.sideExists(true), "no left batches applied yet")
    val inner = IncrementalJoin.current(in)
    if (!st.un.exists) return inner
    val unDf = st.un.read().drop("prefix", "__jk")
    val valueCols = unDf.columns.filterNot(UnMeta.contains).toSeq
    val net = unDf
      .dropDuplicates(valueCols ++ Seq("__bid", "__tbid"))
      .groupBy(valueCols.map(col): _*)
      .agg(sum(col("__mult")).as("n"))
      .filter(col("n") > 0)
    val rightOnly: Seq[StructField] = in.spark.table(in.rightTable)
      .drop("__mult", "__bid").schema.fields.toSeq
      .filterNot(f => valueCols.contains(f.name))
    val nullExtended = rightOnly.foldLeft(net) { (df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    inner.unionByName(nullExtended.select(inner.columns.map(col).toSeq: _*))
  }
}
