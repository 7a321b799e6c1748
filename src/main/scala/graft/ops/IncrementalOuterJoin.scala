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

  private val UnMeta = Set("__mult", "__bid", "__tbid", "__tside")

  /** Apply one LEFT-side batch: inner Δ-rule output for the matched part,
    * a `+mult` unmatched group for the rest.
    *
    * Once ANY signed batch has been applied to this store, physical row
    * presence in a side state no longer implies net presence, so the
    * fast path's derive-matched-keys-from-the-join-output shortcut is
    * unsound — the call transparently routes through the netting signed
    * path with every row at +1 (the `signed` marker makes the switch
    * permanent and crash-safe). */
  def appendLeft(st: Stores, batch: DataFrame, on: Seq[String],
                 batchId: Long): Unit = {
    if (st.inner.hasMarker("signed")) {
      appendLeftDelta(st, batch.withColumn("__delta", lit(1)), on, batchId)
      return
    }
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
        // — no second probe of the state (valid under APPEND-ONLY inputs,
        // where physical presence implies net presence; the signed path
        // below must net instead)
        val matchedKeys = dOut.select(on.map(col): _*).distinct()
        d.join(matchedKeys.hint("SHUFFLE_HASH"), on, "left_anti")
      } else d
    st.un.append(unmatched.withColumn("__tbid", lit(batchId))
      .withColumn("__tside", lit("L")))
    IncrementalJoin.appendToTable(in, isLeft = true, d, on)
    in.touch(s"left.$batchId.done")
  }

  /** Apply one RIGHT-side batch: inner Δ-rule output, plus `-mult`
    * retractions for every left group whose key this batch matched for
    * the first time. Routes through the signed path once the store has
    * seen any signed batch — see [[appendLeft]]. */
  def appendRight(st: Stores, batch: DataFrame, on: Seq[String],
                  batchId: Long): Unit = {
    if (st.inner.hasMarker("signed")) {
      appendRightDelta(st, batch.withColumn("__delta", lit(1)), on, batchId)
      return
    }
    val in = st.inner
    if (in.hasMarker(s"right.$batchId.done")) return
    if (in.hasMarker(s"right.$batchId.started")) in.touch("right.dirty")
    in.touch(s"right.$batchId.started")
    val d = IncrementalJoin.fold(batch, on, batchId).cutLineage()
    val leftExists = in.sideExists(true)
    if (leftExists) {
      in.out.append(IncrementalJoin.deltaJoin(d,
        IncrementalJoin.sideState(in, isLeft = true), on,
        deltaIsLeft = false))
      val newKeys = newlyMatchedKeys(in, d, ownIsLeft = false, on, batchId)
      st.un.append(retraction(in, targetIsLeft = true, newKeys, on, batchId))
    }
    IncrementalJoin.appendToTable(in, isLeft = false, d, on)
    in.touch(s"right.$batchId.done")
  }

  /** Keys of the folded delta `d` that were NOT present in the delta's
    * OWN side state before this batch — the keys whose arrival flips the
    * other side's groups from unmatched to matched. Rows a crashed
    * attempt of THIS batch id may have partially committed are excluded
    * from the prior-state probe, so they cannot masquerade as
    * pre-existing matches. The state streams past the delta-built hash;
    * both derived key sets are delta-key-sized. */
  private[ops] def newlyMatchedKeys(in: IncrementalJoin.Stores, d: DataFrame,
                                    ownIsLeft: Boolean, on: Seq[String],
                                    batchId: Long): DataFrame = {
    val dKeys = d.select(on.map(col): _*).distinct()
    if (in.sideExists(ownIsLeft)) {
      val prior = IncrementalJoin.sideState(in, ownIsLeft)
        .filter(col("__bid") =!= batchId)
        .join(dKeys.hint("SHUFFLE_HASH"), on, "left_semi")
        .select(on.map(col): _*).distinct()
      dKeys.join(prior.hint("SHUFFLE_HASH"), on, "left_anti")
    } else dKeys
  }

  /** `-mult` retraction rows for the target side's groups whose key is
    * in `newKeys` — state streaming past a delta-sized hash build.
    * `triggerSide` is the side of the batch that CAUSED the wave (always
    * the opposite of the target) — part of the un rows' replay-dedup
    * identity, so a trigger batch id that numerically collides with a
    * target-side batch id can never alias. */
  private[ops] def retraction(in: IncrementalJoin.Stores, targetIsLeft: Boolean,
                              newKeys: DataFrame, on: Seq[String],
                              triggerBatchId: Long): DataFrame =
    unWave(in, targetIsLeft, newKeys, on, triggerBatchId, negate = true)

  /** A signed wave over the target side's state groups for `keys`:
    * negated (retraction — the keys just became matched) or as-is
    * (re-add — the keys just became unmatched AGAIN, the transition only
    * signed input deltas can cause). */
  private[ops] def unWave(in: IncrementalJoin.Stores, targetIsLeft: Boolean,
                          keys: DataFrame, on: Seq[String],
                          triggerBatchId: Long, negate: Boolean): DataFrame =
    IncrementalJoin.sideState(in, targetIsLeft)
      .join(keys.hint("SHUFFLE_HASH"), on, "left_semi")
      .withColumn("__mult", if (negate) -col("__mult") else col("__mult"))
      .withColumn("__jk", IncrementalJoin.storeKey(on.map(col)))
      .withColumn("__tbid", lit(triggerBatchId))
      .withColumn("__tside", lit(if (targetIsLeft) "R" else "L"))

  /** Delta keys whose `sideIsLeft` state NETS above zero — the matched
    * keys under SIGNED state, where physical row presence no longer
    * implies net presence (an inserted-then-fully-deleted key leaves
    * +/− groups behind until compaction). Delta-key-bounded: the state
    * streams past the delta-built hash, and the per-key sum aggregates
    * only the rows that survived the semi-join. */
  private[ops] def netPresentKeys(in: IncrementalJoin.Stores,
                                  sideIsLeft: Boolean, keys: DataFrame,
                                  on: Seq[String]): DataFrame =
    IncrementalJoin.sideState(in, sideIsLeft)
      .join(keys.hint("SHUFFLE_HASH"), on, "left_semi")
      .groupBy(on.map(col): _*)
      .agg(sum(col("__mult")).as("__net"))
      .filter(col("__net") > 0)
      .select(on.map(col): _*)

  /** Per-delta-key BEFORE/AFTER net counts on the delta's own side — the
    * transition signal signed inputs need (`before=0, after>0` flips the
    * other side's groups to matched; `before>0, after=0` flips them back
    * to unmatched — the case append-only inputs can never produce).
    * Rows a crashed attempt of this batch id partially committed are
    * excluded from `before`, same masquerade protection as
    * [[newlyMatchedKeys]]. */
  private[ops] def keyTransitions(in: IncrementalJoin.Stores, d: DataFrame,
                                  ownIsLeft: Boolean, on: Seq[String],
                                  batchId: Long): DataFrame = {
    val dNet = d.groupBy(on.map(col): _*).agg(sum(col("__mult")).as("__dnet"))
    if (!in.sideExists(ownIsLeft))
      return dNet.withColumn("__before", lit(0L))
        .withColumn("__after", col("__dnet"))
    val before = IncrementalJoin.sideState(in, ownIsLeft)
      .filter(col("__bid") =!= batchId)
      .join(dNet.select(on.map(col): _*).hint("SHUFFLE_HASH"), on, "left_semi")
      .groupBy(on.map(col): _*)
      .agg(sum(col("__mult")).as("__before"))
    dNet.join(before.hint("SHUFFLE_HASH"), on, "left")
      .na.fill(0L, Seq("__before"))
      .withColumn("__after", col("__before") + col("__dnet"))
  }

  /** The shared SIGNED append: inner Δ-rule output, this side's own
    * unmatched contribution (when `ownUn` is tracked), and the transition
    * waves this side's net change causes on the OTHER side's unmatched
    * store (when `otherUn` is tracked) — retraction for keys whose net
    * went 0→positive, re-add for keys whose net went positive→0. A key's
    * net going NEGATIVE (retracting more than was inserted) is refused
    * loudly before anything is committed.
    *
    * `tap` (the mid-tree cascade seam — [[graft.ops.JoinTreeIvm]]):
    * when set, receives this append's OUTER Δ — the inner Δ-rule rows
    * PLUS the signed null-extension deltas this batch just stored
    * (unmatched `+mult` rows and transition waves, right columns
    * null-extended) — in plain `(values…, __mult)` form. It fires
    * BEFORE the done-marker, like [[IncrementalJoin.appendSide]]'s tap,
    * so a mid-cascade crash retry re-presents the identical Δ (every
    * frame derives from PRE-batch state) and downstream manifests
    * dedup. Only the LEFT-OUTER shape taps (the un stores track left
    * groups; right columns are the null side). */
  private[ops] def signedAppendSide(in: IncrementalJoin.Stores,
      batch: DataFrame, on: Seq[String], batchId: Long, isLeft: Boolean,
      deltaCol: String, ownUn: Option[AppendOnlyStore],
      otherUn: Option[AppendOnlyStore],
      tap: Option[DataFrame => Unit] = None): Unit = {
    val side = in.sideName(isLeft)
    if (in.hasMarker(s"$side.$batchId.done")) return
    if (in.hasMarker(s"$side.$batchId.started")) in.touch(s"$side.dirty")
    // the signed marker FIRST — from here on the append-only fast paths
    // must route through netting even if this very batch crashes mid-way
    in.touch("signed")
    in.touch(s"$side.$batchId.started")
    // LAZY cuts throughout this append: every cut frame's FIRST
    // consumer is a full pass (the summary aggregate, a store append),
    // so materialization piggybacks on that job instead of paying a
    // dedicated eager-checkpoint job per frame (guide §1.2: remove
    // whole passes before tuning inside them).
    val d = IncrementalJoin.foldSigned(batch, on, batchId, deltaCol)
      .cutLineage(eager = false)
    val otherExists = in.sideExists(!isLeft)
    require(tap.isEmpty || !isLeft || otherExists,
      "an outer level with a downstream tap needs its right (dim) side " +
        "loaded before prefix rows flow through — the null extension " +
        "needs the dim schema (an empty right batch is fine)")

    // transition waves FIRST (they read the other side's un semantics off
    // this side's state BEFORE this batch lands in it) — and the
    // over-retraction refusal must fire before ANY store write, so the
    // cut + guard lead. Computed unconditionally: a net key count going
    // negative poisons every later matched-ness decision, so it is
    // refused loudly on every signed append, not only wave-emitting ones.
    val trans = keyTransitions(in, d, isLeft, on, batchId)
      .cutLineage(eager = false)
    // ONE summary job over the materialized transitions replaces the
    // over-retraction probe AND tells the wave emitters below whether
    // any key actually flipped — a wave-free batch (the common fact
    // append) then skips the state semi-join and store write entirely
    // (guide §2.4: remove jobs/shuffles outright when provably empty).
    val summaryRow = trans.agg(
      sum(when(col("__after") < 0, 1L).otherwise(0L)).as("__bad"),
      sum(when(col("__before") <= 0 && col("__after") > 0, 1L)
        .otherwise(0L)).as("__nm"),
      sum(when(col("__before") > 0 && col("__after") <= 0, 1L)
        .otherwise(0L)).as("__nu")).collect()(0)
    def n(f: String): Long =
      Option(summaryRow.getAs[java.lang.Long](f)).map(_.longValue).getOrElse(0L)
    if (n("__bad") > 0) {
      val bad = trans.filter(col("__after") < 0).limit(1).collect()
      require(bad.isEmpty,
        s"signed $side batch $batchId retracts more than was inserted " +
          s"for key ${bad.headOption.map(_.toString).getOrElse("")} — " +
          "net key count would go negative; deltas must never delete " +
          "rows that were not inserted")
    }
    val anyWaves = n("__nm") > 0 || n("__nu") > 0

    val dOut =
      if (otherExists) {
        val o0 = IncrementalJoin.deltaJoin(d,
          IncrementalJoin.sideState(in, !isLeft), on, deltaIsLeft = isLeft)
        // the tap is a second consumer — cut so the delta join is not
        // recomputed (same trade as the inner appendSide)
        val o = if (tap.isDefined) o0.cutLineage(eager = false) else o0
        in.out.append(o)
        Some(o)
      } else None

    val ownUnmatched = ownUn.map { un =>
      val unmatched0 =
        if (otherExists) {
          val dk = d.select(on.map(col): _*).distinct()
          val matched = netPresentKeys(in, !isLeft, dk, on)
          d.join(matched.hint("SHUFFLE_HASH"), on, "left_anti")
        } else d
      val unmatched =
        if (tap.isDefined) unmatched0.cutLineage(eager = false)
        else unmatched0
      un.append(unmatched.withColumn("__tbid", lit(batchId))
        .withColumn("__tside", lit(if (isLeft) "L" else "R")))
      unmatched
    }

    val waveDeltas = otherUn.flatMap { un =>
      if (otherExists && anyWaves) {
        // ONE pass over the target side's state for BOTH transition
        // directions (formerly two semi-join scans + two store writes):
        // the transitions are per-key rows, so an inner join against
        // the flagged key set has exactly semi-join multiplicity, and
        // the flag decides retraction (key now matched) vs re-add (key
        // now unmatched) per row. Rows, dedup identity (__bid, __tbid,
        // __tside, sign) and downstream Δ are identical to the two-wave
        // form — only the scan count and write count change.
        val waveKeys = trans
          .filter((col("__before") <= 0 && col("__after") > 0) ||
            (col("__before") > 0 && col("__after") <= 0))
          .withColumn("__readd", col("__before") > 0)
          .select(on.map(col) :+ col("__readd"): _*)
        val state = IncrementalJoin.sideState(in, !isLeft)
        val wave0 = state
          .join(waveKeys.hint("SHUFFLE_HASH"), on)
          .withColumn("__mult",
            when(col("__readd"), col("__mult")).otherwise(-col("__mult")))
          .withColumn("__jk", IncrementalJoin.storeKey(on.map(col)))
          .withColumn("__tbid", lit(batchId))
          .withColumn("__tside", lit(if (!isLeft) "R" else "L"))
          // the USING join fronts the key columns — restore the state's
          // column order so the un store's files stay layout-identical
          .select((state.columns.toSeq ++
            Seq("__jk", "__tbid", "__tside")).map(col): _*)
        val wave = if (tap.isDefined) wave0.cutLineage(eager = false)
        else wave0
        un.append(wave)
        Some(wave)
      } else None
    }

    // every frame above derives from PRE-batch state, so firing the tap
    // before appendToTable keeps a retry's recomputation identical
    tap.foreach { t =>
      val nullDeltas = (ownUnmatched.toSeq ++ waveDeltas.toSeq)
        .map(_.drop("__bid", "__jk", "__tbid", "__tside"))
      dOut.foreach { o =>
        val inner = o.drop("__jk", "__lbid", "__rbid")
        val full = nullDeltas.foldLeft(inner) { (acc, nd) =>
          acc.unionByName(nullExtendTo(acc, nd, in.spark, in.rightTable))
        }
        t(full)
      }
      // no other-side state: inner Δ is empty and (for a right batch)
      // no waves exist — nothing flows downstream this batch
    }

    IncrementalJoin.appendToTable(in, isLeft, d, on)
    in.touch(s"$side.$batchId.done")
  }

  /** Apply one SIGNED left-side batch (deletes/updates as negative
    * multiplicities in `deltaCol`) — the general-delta form of
    * [[appendLeft]]. Left net changes never flip matched-ness (the un
    * store tracks LEFT groups, whose matched-ness depends on the RIGHT
    * side), so the only new work vs the append-only path is netting the
    * matched-key probe. */
  def appendLeftDelta(st: Stores, batch: DataFrame, on: Seq[String],
                      batchId: Long, deltaCol: String = "__delta",
                      tap: Option[DataFrame => Unit] = None): Unit =
    signedAppendSide(st.inner, batch, on, batchId, isLeft = true, deltaCol,
      ownUn = Some(st.un), otherUn = None, tap = tap)

  /** Apply one SIGNED right-side batch. A right delete wave can make a
    * key's net count reach zero — every left group with that key becomes
    * unmatched AGAIN and its null-extended row is RE-ADDED to the signed
    * store (the transition direction append-only inputs can never take). */
  def appendRightDelta(st: Stores, batch: DataFrame, on: Seq[String],
                       batchId: Long, deltaCol: String = "__delta",
                       tap: Option[DataFrame => Unit] = None): Unit =
    signedAppendSide(st.inner, batch, on, batchId, isLeft = false, deltaCol,
      ownUn = None, otherUn = Some(st.un), tap = tap)

  /** Collapse the un store's signed contributions to one netted row per
    * value group, dropping fully-retracted (net-0) groups — the
    * generation-swap compaction of the signed multiset. Result-invariant
    * under [[current]]; replay safety rests on the manifest (same
    * contract as [[IncrementalJoin.compactOut]]). Run at quiescence —
    * refused while any batch is started-but-uncommitted, since folding a
    * crashed attempt's partial rows into compacted stamps would defeat
    * the retry's dedup. */
  def compactUn(st: Stores): Unit = {
    st.inner.requireQuiescent("compact the unmatched store")
    compactUnStore(st.un)
  }

  /** [[compactUn]] for any signed unmatched store (shared with the full
    * outer variant's two stores). Same sign-and-trigger-side-qualified
    * dedup identity as [[netUnmatched]]. */
  private[ops] def compactUnStore(un: AppendOnlyStore): Unit =
    un.compactWith { df0 =>
      val df = df0.drop("prefix")
      val valueCols = df.columns
        .filterNot(c => UnMeta.contains(c) || c == "__jk").toSeq
      IncrementalJoin.clusterByKeys(df, valueCols)
        .withColumn("__sgn", signum(col("__mult")))
        .dropDuplicates(valueCols ++ Seq("__bid", "__tbid", "__tside", "__sgn"))
        .drop("__sgn")
        .groupBy((valueCols :+ "__jk").map(col): _*)
        .agg(sum(col("__mult")).as("__mult"))
        .filter(col("__mult") =!= 0)
        .withColumn("__bid", lit(Long.MinValue))
        .withColumn("__tbid", lit(Long.MinValue))
        .withColumn("__tside", lit("C"))
    }

  /** The un store's live signed multiset, netted per value group:
    * (valueCols…, n) with n > 0. None when the store holds nothing.
    *
    * The replay-dedup identity includes the TRIGGER SIDE and the SIGN of
    * `__mult`: batch ids are only unique per SIDE, so a `+` row
    * (values, L, L) and a `-` retraction (values, L, R) can share
    * numeric stamps when a right batch id equals a left one — `__tside`
    * separates events by the side that caused them, and the sign keeps
    * legacy (pre-`__tside`) reasoning intact. Two same-side events can
    * never share (values, bid, tbid): one + per group per own-side
    * batch, and at most one transition wave per key per trigger batch. */
  private[ops] def netUnmatched(un: AppendOnlyStore): Option[DataFrame] = {
    if (!un.exists) return None
    val unDf = un.read().drop("prefix", "__jk")
    val valueCols = unDf.columns.filterNot(UnMeta.contains).toSeq
    Some(IncrementalJoin.clusterByKeys(unDf, valueCols)
      .withColumn("__sgn", signum(col("__mult")))
      .dropDuplicates(valueCols ++ Seq("__bid", "__tbid", "__tside", "__sgn"))
      .groupBy(valueCols.map(col): _*)
      .agg(sum(col("__mult")).as("n"))
      .filter(col("n") > 0))
  }

  /** Null-extend `net` with the columns of `sideTable` it lacks (typed
    * from the table's schema) and align to `inner`'s column order. */
  private[ops] def nullExtendTo(inner: DataFrame, net: DataFrame,
                                spark: org.apache.spark.sql.SparkSession,
                                sideTable: String): DataFrame = {
    val have = net.columns.toSet
    val missing: Seq[StructField] = spark.table(sideTable)
      .drop("__mult", "__bid", IncrementalJoin.BucketGroupCol)
      .schema.fields.toSeq
      .filterNot(f => have.contains(f.name))
    val extended = missing.foldLeft(net) { (df, f) =>
      df.withColumn(f.name, lit(null).cast(f.dataType))
    }
    extended.select(inner.columns.map(col).toSeq: _*)
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
    netUnmatched(st.un) match {
      case Some(net) =>
        inner.unionByName(nullExtendTo(inner, net, in.spark, in.rightTable))
      case None => inner
    }
  }
}

/** Incremental FULL OUTER join maintenance: [[IncrementalOuterJoin]]'s
  * signed-unmatched construction applied SYMMETRICALLY — one signed
  * store per side. A side's delta appends `+mult` for its own unmatched
  * groups, and retracts the OTHER side's unmatched groups whose key it
  * just brought for the first time. Same Δ-rule inner core, same
  * manifest exactly-once, same all-states-stream plan shape. */
object IncrementalFullOuterJoin {

  final case class Stores(inner: IncrementalJoin.Stores,
                          unLeft: AppendOnlyStore, unRight: AppendOnlyStore)

  def stores(spark: org.apache.spark.sql.SparkSession, root: String,
             buckets: Int = 16): Stores =
    Stores(IncrementalJoin.stores(spark, root, buckets),
      new AppendOnlyStore(spark, s"$root/un_left", prefixCol = "__jk",
        prefixChars = 1),
      new AppendOnlyStore(spark, s"$root/un_right", prefixCol = "__jk",
        prefixChars = 1))

  private def appendSide(st: Stores, batch: DataFrame, on: Seq[String],
                         batchId: Long, isLeft: Boolean): Unit = {
    val in = st.inner
    if (in.hasMarker("signed")) {
      // a signed batch has touched this store: physical presence no
      // longer implies net presence — route through the netting path
      // (see [[IncrementalOuterJoin.appendLeft]])
      appendSideDelta(st, batch.withColumn("__delta", lit(1)), on, batchId,
        isLeft, "__delta")
      return
    }
    val side = in.sideName(isLeft)
    if (in.hasMarker(s"$side.$batchId.done")) return
    if (in.hasMarker(s"$side.$batchId.started")) in.touch(s"$side.dirty")
    in.touch(s"$side.$batchId.started")
    val d = IncrementalJoin.fold(batch, on, batchId).cutLineage()
    val (ownUn, otherUn) =
      if (isLeft) (st.unLeft, st.unRight) else (st.unRight, st.unLeft)
    val unmatched =
      if (in.sideExists(!isLeft)) {
        val dOut = IncrementalJoin.deltaJoin(d,
          IncrementalJoin.sideState(in, !isLeft), on,
          deltaIsLeft = isLeft).cutLineage()
        in.out.append(dOut)
        val matchedKeys = dOut.select(on.map(col): _*).distinct()
        d.join(matchedKeys.hint("SHUFFLE_HASH"), on, "left_anti")
      } else d
    ownUn.append(unmatched.withColumn("__tbid", lit(batchId))
      .withColumn("__tside", lit(if (isLeft) "L" else "R")))
    if (in.sideExists(!isLeft)) {
      val newKeys = IncrementalOuterJoin.newlyMatchedKeys(
        in, d, ownIsLeft = isLeft, on, batchId)
      otherUn.append(IncrementalOuterJoin.retraction(
        in, targetIsLeft = !isLeft, newKeys, on, batchId))
    }
    IncrementalJoin.appendToTable(in, isLeft, d, on)
    in.touch(s"$side.$batchId.done")
  }

  private def appendSideDelta(st: Stores, batch: DataFrame, on: Seq[String],
                              batchId: Long, isLeft: Boolean,
                              deltaCol: String): Unit = {
    val (ownUn, otherUn) =
      if (isLeft) (st.unLeft, st.unRight) else (st.unRight, st.unLeft)
    IncrementalOuterJoin.signedAppendSide(st.inner, batch, on, batchId,
      isLeft, deltaCol, ownUn = Some(ownUn), otherUn = Some(otherUn))
  }

  def appendLeft(st: Stores, batch: DataFrame, on: Seq[String],
                 batchId: Long): Unit =
    appendSide(st, batch, on, batchId, isLeft = true)

  def appendRight(st: Stores, batch: DataFrame, on: Seq[String],
                  batchId: Long): Unit =
    appendSide(st, batch, on, batchId, isLeft = false)

  /** Apply one SIGNED left-side batch (deletes/updates as negative
    * multiplicities in `deltaCol`). BOTH unmatched stores are in play:
    * the delta's own net-unmatched groups land in `unLeft`, and its key
    * transitions drive retraction (0→present) or re-add (present→0)
    * waves over `unRight` — full-outer is the symmetric composition of
    * the two one-sided constructions. */
  def appendLeftDelta(st: Stores, batch: DataFrame, on: Seq[String],
                      batchId: Long, deltaCol: String = "__delta"): Unit =
    appendSideDelta(st, batch, on, batchId, isLeft = true, deltaCol)

  /** [[appendLeftDelta]] for the right side. */
  def appendRightDelta(st: Stores, batch: DataFrame, on: Seq[String],
                       batchId: Long, deltaCol: String = "__delta"): Unit =
    appendSideDelta(st, batch, on, batchId, isLeft = false, deltaCol)

  /** Compact both signed unmatched stores (netted, zero-groups dropped)
    * — see [[IncrementalOuterJoin.compactUn]]. Run at quiescence —
    * refused while any batch is started-but-uncommitted. */
  def compactUn(st: Stores): Unit = {
    st.inner.requireQuiescent("compact the unmatched stores")
    IncrementalOuterJoin.compactUnStore(st.unLeft)
    IncrementalOuterJoin.compactUnStore(st.unRight)
  }

  /** The current FULL OUTER join as a value-multiset: inner pairs, plus
    * unmatched-left groups with NULL right columns, plus unmatched-right
    * groups with NULL left columns. */
  def current(st: Stores): DataFrame = {
    val in = st.inner
    require(in.sideExists(true) && in.sideExists(false),
      "full-outer read needs both sides' schemas — apply at least one " +
        "batch per side (empty ones are fine)")
    val inner = IncrementalJoin.current(in)
    val withLeft = IncrementalOuterJoin.netUnmatched(st.unLeft) match {
      case Some(net) => inner.unionByName(
        IncrementalOuterJoin.nullExtendTo(inner, net, in.spark, in.rightTable))
      case None => inner
    }
    IncrementalOuterJoin.netUnmatched(st.unRight) match {
      case Some(net) => withLeft.unionByName(
        IncrementalOuterJoin.nullExtendTo(inner, net, in.spark, in.leftTable))
      case None => withLeft
    }
  }
}
