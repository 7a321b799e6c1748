package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Lineage.LineageSyntax
import graft.sinks.AppendOnlyStore

/** Incrementally-maintained NEAREST-SEED assignment under SIGNED edge
  * deltas — the maintained twin of [[GraphOps.nearestSeeds]] (q168):
  * every node within `maxHops` of a seed labeled with (closest seed's
  * id, hop distance), ties at equal distance to the MINIMUM seed id.
  *
  * The recurrence is [[IncrementalSssp]]'s with values lifted from
  * plain distances to LEXICOGRAPHIC (dist, seed) pairs — `min` over a
  * struct column IS the tie-break, so the maintained form and the
  * oracle's full path enumeration agree exactly. Same k-hop-bounded
  * propagation ([[GraphIvmKit]]), same INF sentinel discipline (an
  * unreachable level carries (INF, Long.MaxValue) so the diff's
  * anti-joins stay null-free), same replay/compaction contract.
  *
  * Seeds are FIXED per store ([[Config]]); seed rows are constant
  * ((0, seed) at every level), never stored, and appended at serve
  * time — changing the seed set is a rebuild, not a delta (q168's
  * contract: seeds are the five supplier hubs, not data). */
object IncrementalNearestSeeds {

  val INF: Long = Long.MaxValue / 4
  private val NOSEED: Long = Long.MaxValue

  /** Must be identical across every call against one store root.
    * Duplicate seed nodes collapse to their minimum seed id. */
  final case class Config(seeds: Seq[(Long, Long)], maxHops: Int) {
    require(maxHops >= 1, "need at least one hop")
    require(seeds.nonEmpty, "need at least one seed")
    val seedByNode: Seq[(Long, Long)] =
      seeds.groupBy(_._1).map { case (n, ss) => (n, ss.map(_._2).min) }
        .toSeq.sortBy(_._1)
    def distCols: Seq[String] = (1 to maxHops).map(i => s"d$i")
    def seedCols: Seq[String] = (1 to maxHops).map(i => s"s$i")
  }

  final case class Stores(labels: AppendOnlyStore, edges: AppendOnlyStore,
                          cfg: Config)

  private val edgeSpec = IncrementalAgg.Spec(Seq("src", "dst"), Nil)
  private def labelSpec(cfg: Config) = IncrementalAgg.Spec(
    "node" +: (1 to cfg.maxHops).flatMap(i => Seq(s"d$i", s"s$i")), Nil)
  private def vecCols(cfg: Config) =
    "node" +: (1 to cfg.maxHops).flatMap(i => Seq(s"d$i", s"s$i"))

  def stores(spark: SparkSession, root: String, cfg: Config): Stores =
    Stores(
      new AppendOnlyStore(spark, s"$root/labels",
        prefixCol = "__agg_key", prefixChars = 1),
      new AppendOnlyStore(spark, s"$root/edges",
        prefixCol = "__agg_key", prefixChars = 1),
      cfg)

  import GraphIvmKit.fresh

  private def emptyVec(s: SparkSession, cfg: Config): DataFrame =
    s.range(0).select(vecCols(cfg).map(c => col("id").as(c)): _*)

  /** (node, seed) constant frame from the config. */
  private def seedFrame(s: SparkSession, cfg: Config): DataFrame = {
    import s.implicits._
    cfg.seedByNode.toDF("node", "seed")
  }

  /** Seed nodes' constant full vectors: (node, 0, seed, 0, seed, …). */
  private def seedVec(s: SparkSession, cfg: Config): DataFrame =
    seedFrame(s, cfg).select(
      col("node") +: (1 to cfg.maxHops).flatMap(i =>
        Seq(lit(0L).as(s"d$i"), col("seed").as(s"s$i"))): _*)

  /** Live (node, seed, dist) — seeds always served at distance 0. */
  def currentLabels(st: Stores): DataFrame = {
    val cfg = st.cfg
    val s = st.labels.session
    val stored =
      if (st.labels.hasSchema)
        IncrementalAgg.current(st.labels, labelSpec(cfg))
          .select(vecCols(cfg).map(col): _*)
      else emptyVec(s, cfg)
    stored.unionByName(seedVec(s, cfg))
      .select(col("node"), col(s"s${cfg.maxHops}").as("seed"),
        col(s"d${cfg.maxHops}").as("dist"))
  }

  /** Apply one SIGNED batch of DIRECTED edges (symmetrize upstream for
    * an undirected graph). Exactly-once per `batchId`, family contract. */
  def appendDelta(st: Stores, batch: DataFrame, batchId: Long,
                  srcCol: String = "src", dstCol: String = "dst",
                  deltaCol: String = "__delta"): Unit = {
    // fully-committed replay (e.g. post-compaction): skip the re-solve
    if (st.labels.hasApplied(batchId) && st.edges.hasApplied(batchId))
      return
    val cfg = st.cfg
    val sess = st.labels.session
    val d = fresh(batch.select(
        col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"),
        col(deltaCol).cast("long").as("__delta"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .groupBy(col("src"), col("dst")).agg(sum(col("__delta")).as("__delta"))
      .where(col("__delta") =!= 0).cutLineage())

    val ep =
      if (st.edges.hasSchema)
        st.edges.read().filter(col("__batch_id") =!= lit(batchId)).persist()
      else null
    val lp =
      if (st.labels.hasSchema)
        st.labels.read().filter(col("__batch_id") =!= lit(batchId)).persist()
      else null
    try {
    // wide-region cutover (see IncrementalSssp): past the bound the
    // re-solve runs over every post-batch node — the batch recompute —
    // with identical lexicographic-min results
    val (closure, wide) = GraphIvmKit.kHopOutClosure(d, ep, edgeSpec,
      cfg.maxHops, GraphIvmKit.cutoverRows(ep))
    val affected =
      if (wide) GraphIvmKit.allTouchedNodes(d, ep, edgeSpec, "src", "dst")
      else closure
    val liveIn = fresh(GraphIvmKit.postBatchLive(d, ep, edgeSpec, "dst",
      affected).cutLineage())

    // boundary: stored vectors ∪ constant seed vectors of in-neighbors
    // outside the closure (a seed inside the closure is recomputed and
    // reproduces its own constant values — d0 = 0 wins every least)
    val inSrcs = fresh(liveIn.select(col("src").as("node")).distinct()
      .cutLineage())
    val storedBoundary =
      if (lp == null) emptyVec(sess, cfg)
      else IncrementalAgg.currentFrom(
          lp.join(GraphIvmKit.guarded(inSrcs), Seq("node"), "left_semi"),
          labelSpec(cfg))
        .select(vecCols(cfg).map(col): _*)
    val boundary = fresh(storedBoundary
      .unionByName(seedVec(sess, cfg))
      .join(GraphIvmKit.guarded(affected), Seq("node"), "left_anti")
      .cutLineage())

    // re-solve the closure: k lexicographic-min levels; level 0 is
    // (0, seed) at seeds, (INF, NOSEED) elsewhere
    val sf = seedFrame(sess, cfg)
    var cur = fresh(affected.join(GraphIvmKit.guarded(sf), Seq("node"), "left")
      .select(col("node"),
        when(col("seed").isNotNull, 0L).otherwise(INF).as("d0"),
        coalesce(col("seed"), lit(NOSEED)).as("s0"))
      .cutLineage())
    (1 to cfg.maxHops).foreach { i =>
      val (pd, ps) = (s"d${i - 1}", s"s${i - 1}")
      val recompSrc = cur.select(col("node").as("src"),
        col(pd).as("rpd"), col(ps).as("rps"))
      // boundary frames carry no level-0 columns; for i == 1 derive
      // them from seed membership (a boundary node's level 0 is (0,
      // seed) iff it is a seed)
      val boundSrc =
        if (i == 1)
          boundary.join(GraphIvmKit.guarded(sf), Seq("node"), "left")
            .select(col("node").as("src"),
              when(col("seed").isNotNull, 0L).otherwise(INF).as("rpd"),
              coalesce(col("seed"), lit(NOSEED)).as("rps"))
        else boundary.select(col("node").as("src"),
          boundary(pd).as("rpd"), boundary(ps).as("rps"))
      val srcState = recompSrc.unionByName(boundSrc)
      val mins = liveIn.join(srcState, Seq("src"))
        .filter(col("rpd") < INF)
        .select(col("dst").as("node"),
          struct((col("rpd") + 1L).as("cd"), col("rps").as("cs")).as("c"))
        .groupBy(col("node")).agg(min(col("c")).as("__m"))
      cur = fresh(cur.join(mins, Seq("node"), "left")
        .withColumn("__best", least(
          struct(col(pd).as("cd"), col(ps).as("cs")),
          coalesce(col("__m"),
            struct(lit(INF).as("cd"), lit(NOSEED).as("cs")))))
        .withColumn(s"d$i", col("__best").getField("cd"))
        .withColumn(s"s$i", col("__best").getField("cs"))
        .drop("__m", "__best").cutLineage())
    }

    // only CHANGES append; seed vectors are constant and never stored
    val newVec = fresh(cur
      .filter(col(s"d${cfg.maxHops}") < INF)
      .join(GraphIvmKit.guarded(sf.select(col("node"))), Seq("node"), "left_anti")
      .select(vecCols(cfg).map(col): _*).cutLineage())
    val oldVec =
      if (lp == null) emptyVec(sess, cfg)
      else fresh(IncrementalAgg.currentFrom(
          lp.join(GraphIvmKit.guarded(affected), Seq("node"), "left_semi"),
          labelSpec(cfg))
        .select(vecCols(cfg).map(col): _*).cutLineage())
    val emit = GraphIvmKit.diffEmit(newVec, oldVec, vecCols(cfg))
    IncrementalAgg.appendDelta(st.labels, emit, labelSpec(cfg), batchId)
    IncrementalAgg.appendDelta(st.edges, d, edgeSpec, batchId)
    } finally {
      if (ep != null) ep.unpersist(blocking = false)
      if (lp != null) lp.unpersist(blocking = false)
    }
  }

  /** Compact both stores (quiescence, single-writer). */
  def compact(st: Stores): Unit = {
    IncrementalAgg.compact(st.labels, labelSpec(st.cfg))
    IncrementalAgg.compact(st.edges, edgeSpec)
  }
}
