package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * append arrives second — so per-batch work is one delta-sized join
  * against the other side's state. At 100 TB that is the difference
  * between joining a day's ingest against stored state and re-joining two
  * full corpora per refresh (the `overwrite(recompute)` shape this engine
  * bans).
  *
  * '''Scale shape (what actually moves per batch).''' The two SIDE
  * states are plan-visible BUCKETED catalog tables on the join key
  * ([[graft.sinks.BucketedTables]]' co-location machinery): a delta join
  * scans the state in place — the bucketed scan already satisfies the
  * join's required distribution, so Catalyst plans ZERO exchange on the
  * state side — and shuffles only the delta into the state's bucket
  * layout. The delta side carries a `SHUFFLE_HASH` hint, so it (the
  * small side) is the hash-build and the state merely STREAMS past it:
  * no state-side shuffle, no state-side sort. Per-batch shuffle bytes
  * are delta-sized and stay flat while state grows without bound
  * (gated by ShuffleBytesSpec across ≥10 batches).
  *
  * '''Exactly-once without a hot-path dedup.''' Every append is recorded
  * in an applied-batch-id manifest (`<root>/_applied/<side>.<id>.done`,
  * written only after the batch's output AND state rows are fully
  * committed). A crash-replayed batch whose id is already in the
  * manifest is an idempotent NO-OP — including replays of batches older
  * than the last compaction, which the pre-manifest design could not
  * absorb. Only the window between a batch's `.started` marker and its
  * `.done` marker can leave partial rows behind; a retry inside that
  * window flags the side DIRTY, and state reads `dropDuplicates` (one
  * state-sized shuffle) until the next [[compactSides]] clears the flag.
  * The happy path — every batch that did not crash mid-write — never
  * pays a dedup shuffle.
  *
  * Multiset encoding: every stored row — state and output — is a VALUE
  * GROUP `(columns…, __mult)`: the batch's rows grouped by all columns
  * with their multiplicity counted. Duplicate input rows stay exact
  * (output multiplicity is the product `__mult_l · __mult_r`). Output
  * rows carry BOTH origin batch ids (`__lbid`, `__rbid`), so an output
  * group is unique per (values, lbid, rbid) and the read-side dedup in
  * [[current]]/[[compactOut]] also absorbs any partial rows a mid-write
  * crash left in the OUT store.
  *
  * The OUT store stays an [[AppendOnlyStore]] clustered on `__jk` (an
  * md5 of the join-key tuple): it is append-scan-compact only, never a
  * join input, so key bucketing buys it nothing a prefix layout doesn't.
  *
  * Contract: join-key columns share names across sides (`on`); all other
  * column names are disjoint; `on` is the same on every call against one
  * store set. Appends are single-writer; each logical batch carries a
  * unique id per side (an id is reused ONLY to replay the same batch).
  * Inner join only — outer variants need retraction rows; see
  * [[IncrementalOuterJoin]] for the append-only LEFT OUTER construction
  * layered on these same stores.
  */
object IncrementalJoin {

  /** Handles to one maintained join: two bucketed side tables (catalog
    * names derived from `root`), the out store, and the manifest root. */
  final case class Stores(spark: SparkSession, root: String, buckets: Int,
                          leftTable: String, rightTable: String,
                          out: AppendOnlyStore) {
    private[ops] def fs: FileSystem =
      new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    private[ops] def marker(name: String): Path =
      new Path(root, s"_applied/$name")
    private[ops] def hasMarker(name: String): Boolean = fs.exists(marker(name))
    private[ops] def touch(name: String): Unit = {
      val p = marker(name)
      fs.mkdirs(p.getParent)
      val o = fs.create(p, true); o.close()
    }
    private[ops] def clearMarker(name: String): Unit = {
      val p = marker(name)
      if (fs.exists(p)) { fs.delete(p, false); () }
    }
    private[ops] def sideTable(isLeft: Boolean): String =
      if (isLeft) leftTable else rightTable
    private[ops] def sideName(isLeft: Boolean): String =
      if (isLeft) "left" else "right"
    def sideExists(isLeft: Boolean): Boolean =
      spark.catalog.tableExists(sideTable(isLeft))

    /** Batch ids with a `.started` marker but no `.done` twin — appends
      * that crashed mid-write and were never retried to completion. The
      * manifest only no-ops COMMITTED replays: compacting while one of
      * these exists would fold the crashed attempt's partial rows into
      * `Compacted` stamps, so the eventual retry's rows no longer dedup
      * against them and the multisets double-count. Every compaction
      * entry point refuses while this is non-empty. */
    private[ops] def inFlightBatches: Seq[String] = {
      val dir = new Path(root, "_applied")
      if (!fs.exists(dir)) return Nil
      val names = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      val done = names.filter(_.endsWith(".done"))
        .map(_.stripSuffix(".done")).toSet
      names.filter(_.endsWith(".started"))
        .map(_.stripSuffix(".started")).filterNot(done.contains).sorted
    }

    private[ops] def requireQuiescent(what: String): Unit = {
      val inFlight = inFlightBatches
      require(inFlight.isEmpty,
        s"refusing to $what: batches started but never committed " +
          s"(${inFlight.mkString(", ")}) — retry each to completion " +
          "(same batch id) before compacting, or the retry's rows would " +
          "no longer dedup against the crashed attempt's partials")
    }
  }

  /** Open the stores under one root. Side tables land in the session
    * catalog (warehouse dir) under names derived from the root path, so
    * re-opening the same root resumes the same maintained join. `buckets`
    * fixes the side tables' bucket count at creation — size it to the
    * expected STATE (state_bytes / bucket ≲ executor memory), not the
    * deltas. */
  def stores(spark: SparkSession, root: String, buckets: Int = 16): Stores = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(root.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    Stores(spark, root, buckets,
      s"graft_ivm_${tag}_left", s"graft_ivm_${tag}_right",
      new AppendOnlyStore(spark, s"$root/out", prefixCol = "__jk",
        prefixChars = 1))
  }

  private val Compacted = Long.MinValue
  private val Meta = Set("__mult", "__bid", "__lbid", "__rbid")

  /** The side tables' partition column: the row's BUCKET id (both are
    * `pmod(hash(keys), buckets)`, so each `__bg=<b>` directory holds
    * exactly bucket b's files). Partitioning by it costs nothing at
    * read time — the bucketed scan merges per-bucket across dirs — and
    * buys [[compactSides]] single-bucket rewrites via dynamic partition
    * overwrite instead of state-sized full-table swaps. */
  private[ops] val BucketGroupCol = "__bg"

  private val Reserved = Set("__mult", "__bid", "__jk", "__lbid", "__rbid",
    "prefix", BucketGroupCol)

  /** Cheap deterministic row key over `cols` for store bookkeeping
    * (`__jk` / `__agg_key` prefix clustering): fixed-width hex of
    * xxhash64 — wholly codegen-friendly, no per-row JSON/MD5 allocation
    * (the md5(to_json(struct(…))) it replaces dominated fold CPU on
    * wide deltas). Purely internal: the value is only ever a clustering
    * prefix and a groupBy co-key alongside the actual key columns, so
    * hash collisions (including xxhash64's null-skip making e.g.
    * (null,"a") collide with ("a",null)) affect layout, never results.
    * Empty key lists (scalar aggregates) get a constant key. */
  private[ops] def storeKey(cols: Seq[org.apache.spark.sql.Column])
      : org.apache.spark.sql.Column =
    if (cols.isEmpty) lit("0000000000000000")
    else lpad(hex(xxhash64(cols: _*)), 16, "0")

  /** Pre-cluster `df` on `keys` so the maintained-read fold pattern —
    * `dropDuplicates(keys ++ stamps)` followed by `groupBy(keys)` — runs
    * over ONE exchange instead of two: hash-partitioning on `keys`
    * satisfies the clustered distribution of BOTH aggregates (partition
    * expressions are a subset of each grouping), so EnsureRequirements
    * inserts no further shuffle. Every read-side fold in the IVM family
    * (join multisets, unmatched nets, agg partial refolds, extrema
    * groups) was paying a state-sized second exchange for the
    * crash-replay dedup (guide §2.4: two operations keyed the same way
    * share one exchange). Results are unchanged — the dedup and refold
    * see identical row groups. Empty key lists (scalar refolds) keep
    * their original single-partition plan. */
  private[ops] def clusterByKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    if (keys.isEmpty) df else df.repartition(keys.map(col): _*)

  /** Fold one batch to deterministic value-groups: all columns grouped,
    * multiplicity counted, batch id and join-key hash stamped. */
  private[ops] def fold(batch: DataFrame, on: Seq[String], batchId: Long): DataFrame = {
    val clash = batch.columns.filter(Reserved.contains)
    require(clash.isEmpty,
      s"batch columns ${clash.mkString(", ")} collide with the store's " +
        s"bookkeeping columns (${Reserved.mkString(", ")}) — rename them")
    batch.groupBy(batch.columns.map(col): _*)
      .agg(count(lit(1)).as("__mult"))
      .withColumn("__bid", lit(batchId))
      .withColumn("__jk", storeKey(on.map(col)))
  }

  /** [[fold]] for a SIGNED batch: `deltaCol` carries each row's signed
    * multiplicity (+1 an insert, −1 a delete, ±n pre-aggregated groups —
    * a Debezium `op='d'` envelope maps to one −1 row). Groups netting to
    * zero inside the batch are dropped at the fold. */
  private[ops] def foldSigned(batch: DataFrame, on: Seq[String],
                              batchId: Long, deltaCol: String): DataFrame = {
    require(batch.columns.contains(deltaCol),
      s"signed batch lacks its multiplicity column '$deltaCol'")
    val valueCols = batch.columns.filter(_ != deltaCol)
    val clash = valueCols.filter(Reserved.contains)
    require(clash.isEmpty,
      s"batch columns ${clash.mkString(", ")} collide with the store's " +
        s"bookkeeping columns (${Reserved.mkString(", ")}) — rename them")
    batch.groupBy(valueCols.map(col): _*)
      .agg(sum(col(deltaCol).cast("long")).as("__mult"))
      .filter(col("__mult") =!= 0)
      .withColumn("__bid", lit(batchId))
      .withColumn("__jk", storeKey(on.map(col)))
  }

  /** A side's current state: the bucketed table scan, served as-is on
    * the happy path (zero exchange — its bucketing IS the join layout).
    * Only a side flagged dirty by a mid-write crash retry pays the
    * replay-dedup shuffle, and only until the next [[compactSides]].
    * The `__bg` partition column (the bucket id, doubled as a partition
    * key so compaction can rewrite single buckets) is internal layout —
    * dropped before any consumer sees the state. */
  private[ops] def sideState(st: Stores, isLeft: Boolean): DataFrame = {
    val t = st.spark.table(st.sideTable(isLeft)).drop(BucketGroupCol)
    if (st.hasMarker(s"${st.sideName(isLeft)}.dirty"))
      t.dropDuplicates(t.columns.filter(_ != "__mult"))
    else t
  }

  private[ops] def deltaJoin(delta: DataFrame, other: DataFrame,
                        on: Seq[String], deltaIsLeft: Boolean): DataFrame = {
    val d = delta
      .withColumnRenamed("__mult", "__mult_d")
      .withColumnRenamed("__bid", "__bid_d")
    val o = other
      .withColumnRenamed("__mult", "__mult_o")
      .withColumnRenamed("__bid", "__bid_o")
    // SHUFFLE_HASH on the DELTA side: the delta is the hash-build, the
    // bucketed state scan streams — no sort and no exchange on state
    // (a sort-merge join would local-sort the full state every batch)
    d.hint("SHUFFLE_HASH").join(o, on)
      .withColumn("__mult", col("__mult_d") * col("__mult_o"))
      .withColumn("__lbid", if (deltaIsLeft) col("__bid_d") else col("__bid_o"))
      .withColumn("__rbid", if (deltaIsLeft) col("__bid_o") else col("__bid_d"))
      .drop("__mult_d", "__mult_o", "__bid_d", "__bid_o")
  }

  /** Append the folded delta to its side's bucketed table (created on
    * first use). The delta is pre-clustered into the bucket layout — one
    * delta-sized shuffle — so each task writes one bucket's file instead
    * of every task touching every bucket. */
  private[ops] def appendToTable(st: Stores, isLeft: Boolean, d: DataFrame,
                            on: Seq[String]): Unit = {
    val name = st.sideTable(isLeft)
    val rows0 = d.drop("__jk").withColumn(BucketGroupCol,
      pmod(hash(on.map(col): _*), lit(st.buckets)))
    // saveAsTable(Append) resolves by position on some paths — pin the
    // existing table's column order explicitly
    val rows =
      if (st.spark.catalog.tableExists(name))
        rows0.select(st.spark.table(name).columns.map(col).toSeq: _*)
      else rows0
    rows.repartition(st.buckets, on.map(col): _*)
      .write.mode("append").format("parquet")
      .partitionBy(BucketGroupCol)
      .bucketBy(st.buckets, on.head, on.tail: _*)
      .saveAsTable(name)
    // Invalidate the STORES' session's cached file listings explicitly:
    // the write's own refresh lands on `rows`' session, which inside a
    // streaming foreachBatch is the micro-batch CLONE — while every
    // state read goes through st.spark. Without this, st.spark's
    // file-status cache keeps serving the PRE-append listing for
    // partition dirs it has already scanned (new dirs appear, appends
    // into existing dirs silently vanish) — rows written by a drain
    // were invisible to the very next batch's transition probe. One
    // metadata invalidation per append; the next scan re-lists the
    // table's dirs at manifest cost.
    st.spark.catalog.refreshTable(name)
  }

  private[ops] def appendSide(st: Stores, batch: DataFrame, on: Seq[String],
                              batchId: Long, isLeft: Boolean,
                              deltaCol: Option[String] = None,
                              tap: Option[DataFrame => Unit] = None): Unit = {
    val side = st.sideName(isLeft)
    if (st.hasMarker(s"$side.$batchId.done")) return // committed replay: no-op
    if (st.hasMarker(s"$side.$batchId.started"))
      // a prior attempt crashed mid-write: this side and the out store
      // may hold a partial copy of this batch — dedup until compaction
      st.touch(s"$side.dirty")
    st.touch(s"$side.$batchId.started")
    val joins = st.sideExists(!isLeft)
    // the lineage cut only happens when the folded delta is consumed
    // twice (delta join + state append) — the first batch on a side has
    // no join to feed, and a materialization job for a single consumer
    // is pure overhead
    val d0 = deltaCol match {
      case Some(dc) => foldSigned(batch, on, batchId, dc)
      case None => fold(batch, on, batchId)
    }
    // lazy: the first consumer (out.append's write, or appendToTable
    // when no join runs) is a full pass that materializes the blocks
    val d = if (joins) d0.cutLineage(eager = false) else d0
    if (joins) {
      val dOut0 = deltaJoin(d, sideState(st, !isLeft), on,
        deltaIsLeft = isLeft)
      // a tap is a second consumer of the delta-join frame — cut it so
      // the join isn't recomputed per consumer ([[ChainedIvm]] feeds
      // downstream maintained aggregates from exactly this Δ-output; a
      // replayed batch returns above before the tap runs, so the join's
      // manifest is the whole CHAIN's exactly-once boundary)
      val dOut = if (tap.isDefined) dOut0.cutLineage(eager = false)
        else dOut0
      st.out.append(dOut)
      tap.foreach(_(dOut))
    }
    appendToTable(st, isLeft, d, on)
    st.touch(s"$side.$batchId.done")
  }

  /** The delta-join frame exactly as [[appendLeft]]/[[appendRight]] plan
    * it — exposed so the plan-audit spec can assert the scale contract
    * (bucketed state scan, zero state-side exchange, delta-side hash
    * build) against the REAL construction, not a lookalike. */
  private[graft] def planProbe(st: Stores, batch: DataFrame, on: Seq[String],
                               deltaIsLeft: Boolean): DataFrame =
    deltaJoin(fold(batch, on, Long.MaxValue), sideState(st, !deltaIsLeft),
      on, deltaIsLeft)

  /** Apply one LEFT-side batch: `Δout = ΔA ⋈ B_state`, then ΔA is added
    * to the left state. Delta-sized shuffles throughout — the state is
    * scanned, never exchanged. A batch id already in the manifest is an
    * idempotent no-op. */
  def appendLeft(stores: Stores, batch: DataFrame, on: Seq[String],
                 batchId: Long): Unit =
    appendSide(stores, batch, on, batchId, isLeft = true)

  /** Apply one RIGHT-side batch: `Δout = A_state ⋈ ΔB`. */
  def appendRight(stores: Stores, batch: DataFrame, on: Seq[String],
                  batchId: Long): Unit =
    appendSide(stores, batch, on, batchId, isLeft = false)

  /** Apply one SIGNED left-side batch — the general-delta form of
    * [[appendLeft]] for delete/update waves (takedown and
    * right-to-be-forgotten passes a training-data lakehouse must absorb
    * without recompute; the reference's own CDC models simply DROP
    * deletes — `raw_provider_postgres.sql:22` — this engine maintains
    * through them). `deltaCol` carries each row's signed multiplicity: a
    * delete is the previously-inserted row with −1, an update is a −1/+1
    * pair. The Δ-rules are bilinear (`Δout = ΔA ⋈ B`, output
    * multiplicity a product), so negative input multiplicities flow
    * through the SAME delta-join machinery — per-batch cost and plan
    * shape are identical to the append-only path; netting happens at the
    * existing read-side fold. Contract: never retract more than was
    * inserted (per value group) — violations surface as negative `n` in
    * [[current]], which is kept visible rather than silently clamped. */
  def appendLeftDelta(stores: Stores, batch: DataFrame, on: Seq[String],
                      batchId: Long, deltaCol: String = "__delta"): Unit =
    appendSide(stores, batch, on, batchId, isLeft = true, Some(deltaCol))

  /** [[appendLeftDelta]] for the right side. */
  def appendRightDelta(stores: Stores, batch: DataFrame, on: Seq[String],
                       batchId: Long, deltaCol: String = "__delta"): Unit =
    appendSide(stores, batch, on, batchId, isLeft = false, Some(deltaCol))

  /** The current join as a value-multiset: all join columns plus `n`
    * (exact row multiplicity of the equivalent `A ⋈ B`). */
  def current(stores: Stores): DataFrame = {
    if (!stores.out.exists) {
      if (!(stores.sideExists(true) && stores.sideExists(false)))
        throw new IllegalStateException("no batches applied to both sides yet")
      // both sides populated but no key has ever matched: the join is
      // EMPTY, not an error — synthesize the zero-row result with the
      // join's schema (key columns are the sides' shared names, per the
      // operator contract)
      val l = stores.spark.table(stores.leftTable)
        .drop("__mult", "__bid", BucketGroupCol)
      val r = stores.spark.table(stores.rightTable)
        .drop("__mult", "__bid", BucketGroupCol)
      val on = l.columns.toSeq.filter(r.columns.contains(_))
      return l.limit(0).join(r.limit(0), on)
        .withColumn("n", lit(0L))
    }
    val df = stores.out.read().drop("prefix")
    val valueCols = df.columns.filterNot(c => Meta.contains(c) || c == "__jk")
    // groups netting to 0 (a signed delta fully retracted them) vanish;
    // negative nets — retractions exceeding insertions, a contract
    // violation — stay VISIBLE rather than being silently clamped
    clusterByKeys(df, valueCols.toSeq)
      .dropDuplicates(valueCols ++ Seq("__lbid", "__rbid"))
      .groupBy(valueCols.map(col): _*)
      .agg(sum(col("__mult")).as("n"))
      .filter(col("n") =!= 0)
  }

  /** Collapse each output value-group's accumulated contributions to one
    * row (generation swap; result-invariant under [[current]]). Run at
    * ingest quiescence, single-writer — the store contract.
    *
    * Compaction collapses the output rows' (lbid, rbid) stamps, but the
    * applied-batch-id manifest outlives it: a replay of ANY committed
    * batch — before or after the compaction — is an append-time no-op,
    * so compaction no longer moves a replay-safety boundary (it did
    * under the pre-manifest design, which could only dedup replays whose
    * stamps still existed). */
  def compactOut(stores: Stores): Unit = {
    stores.requireQuiescent("compact the out store")
    stores.out.compactWith { df0 =>
      val df = df0.drop("prefix")
      val valueCols = df.columns.filterNot(c => Meta.contains(c) || c == "__jk")
      clusterByKeys(df, valueCols.toSeq)
        .dropDuplicates(valueCols ++ Seq("__lbid", "__rbid"))
        .groupBy((valueCols :+ "__jk").map(col): _*)
        .agg(sum(col("__mult")).as("__mult"))
        .filter(col("__mult") =!= 0)
        .withColumn("__lbid", lit(Compacted))
        .withColumn("__rbid", lit(Compacted))
    }
  }

  /** Collapse the SIDE tables' per-batch groups to one row per value
    * tuple (small-files remedy + dirty-flag clear) — INCREMENTALLY, one
    * bucket directory at a time.
    *
    * The side tables are partitioned on `__bg` (the bucket id) exactly so
    * this can be a per-bucket rewrite: the fold touches only buckets
    * whose uncompacted-row share exceeds `minUncompactedShare`, and the
    * write is a DYNAMIC PARTITION OVERWRITE of those `__bg=<b>`
    * directories — untouched buckets' files are left byte-identical
    * (spec-gated). At 100 TB this is the difference between a
    * state-sized rewrite at every quiescence window and a job
    * proportional to the ingest since the last compaction.
    *
    * A side flagged DIRTY by a mid-write crash retry may hold partial
    * rows in ANY bucket, so the dirty flag forces a full sweep (every
    * bucket with uncompacted rows is rewritten with the replay-dedup
    * fold) and is cleared only after it.
    *
    * `on` must be the same join-key columns every append used. Run at
    * quiescence, single-writer — the store contract. */
  def compactSides(stores: Stores, on: Seq[String],
                   minUncompactedShare: Double = 0.0): Unit = {
    stores.requireQuiescent("compact the side states")
    Seq(true, false).filter(stores.sideExists).foreach { isLeft =>
      val name = stores.sideTable(isLeft)
      val spark = stores.spark
      val t = spark.table(name)
      val dirty = stores.hasMarker(s"${stores.sideName(isLeft)}.dirty")
      // per-bucket compaction debt: ≤ `buckets` rows, driver-safe
      val debt = t.groupBy(col(BucketGroupCol)).agg(
          count(lit(1)).as("total"),
          sum(when(col("__bid") =!= Compacted, 1L).otherwise(0L)).as("raw"))
        .collect()
      val targets = debt.filter { r =>
        val raw = r.getAs[Long]("raw")
        raw > 0 && (dirty ||
          raw.toDouble / r.getAs[Long]("total") >= minUncompactedShare)
      }.map(_.getAs[Int](BucketGroupCol)).toSeq
      if (targets.nonEmpty) {
        val valueCols =
          t.columns.filterNot(c => c == "__mult" || c == "__bid").toSeq
        val folded = t
          .filter(col(BucketGroupCol).isin(targets: _*))
          .dropDuplicates(valueCols :+ "__bid")
          .groupBy(valueCols.map(col): _*)
          .agg(sum(col("__mult")).as("__mult"))
          .filter(col("__mult") =!= 0)
          .withColumn("__bid", lit(Compacted))
          // insertInto resolves by POSITION: pin the table's column
          // order (data columns first, the __bg partition column last)
          .select(t.columns.map(col).toSeq: _*)
          .repartition(stores.buckets, on.map(col): _*)
          .persist() // consumed twice: the written-bucket probe + write
        try {
          // A target bucket whose fold nets to ZERO rows never appears
          // in the dynamic-overwrite output, so its old files — possibly
          // crash-retry duplicate partials when dirty — would survive
          // the sweep while the dirty flag clears below. Find those
          // buckets first and truncate them explicitly.
          val written = folded.select(col(BucketGroupCol)).distinct()
            .collect().map(_.getInt(0)).toSet
          val mode = "spark.sql.sources.partitionOverwriteMode"
          val saved = spark.conf.getOption(mode)
          spark.conf.set(mode, "dynamic")
          try folded.write.mode("overwrite").insertInto(name)
          finally saved match {
            case Some(v) => spark.conf.set(mode, v)
            case None => spark.conf.unset(mode)
          }
          // static overwrite with a full partition spec clears the
          // partition directory BEFORE the (empty) write runs — the
          // truncation idiom for a net-zero bucket. The zero rows come
          // from a FROM-less typed-null select (reading the target
          // table inside its own INSERT OVERWRITE is rejected)
          val nullCols = t.schema.fields
            .filterNot(_.name == BucketGroupCol)
            .map(f => s"CAST(NULL AS ${f.dataType.sql}) AS `${f.name}`")
            .mkString(", ")
          (targets.toSet -- written).toSeq.sorted.foreach { b =>
            spark.sql(s"INSERT OVERWRITE TABLE $name " +
              s"PARTITION ($BucketGroupCol=$b) " +
              s"SELECT $nullCols LIMIT 0")
          }
        } finally folded.unpersist()
      }
      // a full sweep (dirty ⇒ every bucket holding uncompacted rows was
      // rewritten with the dedup fold) removes any mid-write partials —
      // the happy path resumes
      if (dirty) stores.clearMarker(s"${stores.sideName(isLeft)}.dirty")
      // refresh optimizer statistics on the freshly-folded state (row
      // count + join-key NDVs): when maintained state feeds a LARGER
      // query (the MaterializedJoinRewrite path, or a user joining
      // current() onward), CBO needs real sizes to pick broadcast/SHJ —
      // without them a compacted kilobyte-sized state is costed at
      // defaults. One metadata-priced scan per compaction, reused by
      // every read until the next one.
      graft.catalog.TableStats.analyze(spark, name, on)
    }
  }
}
