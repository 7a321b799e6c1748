package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

import graft.ops.{DedupOps, GraphOps, IncrementalCc, IncrementalKCore,
  IncrementalNearestSeeds, IncrementalPageRank, IncrementalSssp}

/** The graph-IVM family's scale guards, exercised on a PLANTED HUB: a
  * wheel/star whose center makes the touched region of any
  * center-incident batch >50% of the graph — the shape that makes an
  * unguarded `broadcast(closure)` a driver-OOM at 100× and makes
  * hop-paced closure discovery slower than the batch recompute.
  *
  * Two regimes are forced via conf and both must be BIT-IDENTICAL to
  * the batch twins (and to each other):
  *
  *  - `spark.graft.graphIvm.broadcastRowLimit = 0`: every guarded
  *    broadcast falls back to a shuffle semi-join — the posture a
  *    graph-sized touched region gets at scale;
  *  - `spark.graft.graphIvm.cutoverFraction = 1e-9`: closure discovery
  *    reports `wide` immediately once state exists, forcing the
  *    batch-recompute cutover path in CC/PageRank/SSSP/nearest-seeds.
  *
  * The default regime (4M-row limit, 0.5 fraction) is the one every
  * other spec and the q198-q204 oracles run — so the three regimes
  * together pin that the guards change plans, never results. */
class GraphIvmGuardSpec extends SparkSpec with BeforeAndAfterEach {
  import spark.implicits._

  private val LimitKey = "spark.graft.graphIvm.broadcastRowLimit"
  private val FracKey = "spark.graft.graphIvm.cutoverFraction"

  override def afterEach(): Unit = {
    spark.conf.unset(LimitKey)
    spark.conf.unset(FracKey)
    super.afterEach()
  }

  private def forceShuffle(): Unit = spark.conf.set(LimitKey, "0")
  private def forceCutover(): Unit = spark.conf.set(FracKey, "1e-9")

  // ---- the planted hub: center 0, spokes 1..N (>50% of every batch's
  // touched region is the hub), ring closing the wheel for k-core, and
  // a far pair {500, 501} that every wave must leave untouched
  private val N = 60
  private val hub: Seq[(Long, Long)] =
    (1 to N).map(i => 0L -> i.toLong) ++ Seq(500L -> 501L)
  private val ring: Seq[(Long, Long)] =
    (1 to N).map(i => i.toLong -> (if (i == N) 1L else i + 1L))

  private def signed(rows: Seq[(Long, Long)], d: Long): DataFrame =
    rows.map { case (s, t) => (s, t, d) }.toDF("src", "dst", "__delta")

  /** Directed symmetrization for the directed ops. */
  private def sym(rows: Seq[(Long, Long)]): Seq[(Long, Long)] =
    rows ++ rows.map(_.swap)

  // hub-touching delta: new spokes in, two old spokes out — the
  // touched closure contains the entire wheel
  private val added: Seq[(Long, Long)] =
    (N + 1 to N + 5).map(i => 0L -> i.toLong)
  private val dropped: Seq[(Long, Long)] = Seq(0L -> 1L, 0L -> 2L)

  test("signed CC: hub batches under shuffle guard + cutover match the batch solve") {
    for ((prep, tag) <- Seq((forceShuffle _, "shuffle"),
                            (forceCutover _, "cutover"))) {
      prep()
      val st = IncrementalCc.signedStores(spark, tmpDir(s"gcc-$tag"))
      IncrementalCc.appendDelta(st, signed(hub, 1L), 0L)
      IncrementalCc.appendDelta(st,
        signed(added, 1L).unionByName(signed(dropped, -1L)), 1L)
      val net = (hub ++ added).filterNot(dropped.contains)
      val want = DedupOps.connectedComponentsAlternating(
          net.toDF("src", "dst"), srcCol = "src", dstCol = "dst")
        .select(col("node"), col("label"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = IncrementalCc.currentLabels(st)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"regime=$tag")
      // takedown: sever the whole hub center — spokes become singletons
      // (no live edge → no served label), far pair survives
      val hubEdges = (hub ++ added).filterNot(dropped.contains)
        .filter(_._1 == 0L)
      IncrementalCc.appendDelta(st, signed(hubEdges, -1L), 2L)
      val got2 = IncrementalCc.currentLabels(st)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got2 == Set((500L, 500L), (501L, 500L)), s"regime=$tag: $got2")
    }
  }

  test("insert-only CC: hub merge under shuffle guard + cutover matches") {
    for ((prep, tag) <- Seq((forceShuffle _, "shuffle"),
                            (forceCutover _, "cutover"))) {
      prep()
      val st = IncrementalCc.stores(spark, tmpDir(s"gcc0-$tag"))
      IncrementalCc.appendEdges(st, hub.toDF("src", "dst"), 0L)
      // second wave bridges the far pair into the hub: touched
      // membership = the entire graph
      IncrementalCc.appendEdges(st, Seq(1L -> 500L).toDF("src", "dst"), 1L)
      val got = IncrementalCc.currentLabels(st)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = ((0 to N).map(_.toLong) ++ Seq(500L, 501L))
        .map(_ -> 0L).toSet
      assert(got == want, s"regime=$tag")
    }
  }

  test("PageRank: hub batches under shuffle guard + cutover match pageRankQuantized") {
    for ((prep, tag) <- Seq((forceShuffle _, "shuffle"),
                            (forceCutover _, "cutover"))) {
      prep()
      val st = IncrementalPageRank.stores(spark, tmpDir(s"gpr-$tag"))
      IncrementalPageRank.appendDelta(st, signed(sym(hub), 1L), 0L)
      IncrementalPageRank.appendDelta(st,
        signed(sym(added), 1L).unionByName(signed(sym(dropped), -1L)), 1L)
      val net = sym((hub ++ added).filterNot(dropped.contains))
      val want = GraphOps.pageRankQuantized(net.toDF("src", "dst"), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = IncrementalPageRank.currentRanks(st)
        .select(col("node"), col("r3"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"regime=$tag")
    }
  }

  test("SSSP: hub batches under shuffle guard + cutover match ssspBounded") {
    for ((prep, tag) <- Seq((forceShuffle _, "shuffle"),
                            (forceCutover _, "cutover"))) {
      prep()
      val cfg = IncrementalSssp.Config(source = 0L, maxHops = 3)
      val st = IncrementalSssp.stores(spark, tmpDir(s"gss-$tag"), cfg)
      def w(rows: Seq[(Long, Long)], d: Long): DataFrame =
        rows.map { case (s, t) => (s, t, (s + t) % 5 + 1, d) }
          .toDF("src", "dst", "w", "__delta")
      IncrementalSssp.appendDelta(st, w(sym(hub), 1L), 0L)
      IncrementalSssp.appendDelta(st,
        w(sym(added), 1L).unionByName(w(sym(dropped), -1L)), 1L)
      val net = sym((hub ++ added).filterNot(dropped.contains))
      val want = GraphOps.ssspBounded(
          net.map { case (s, t) => (s, t, (s + t) % 5 + 1) }
            .toDF("src", "dst", "w"), source = 0L, maxHops = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = IncrementalSssp.currentDists(st)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"regime=$tag")
    }
  }

  test("nearest seeds: hub batches under shuffle guard + cutover match the batch op") {
    for ((prep, tag) <- Seq((forceShuffle _, "shuffle"),
                            (forceCutover _, "cutover"))) {
      prep()
      val cfg = IncrementalNearestSeeds.Config(
        seeds = Seq((0L, 0L), (500L, 500L)), maxHops = 3)
      val st = IncrementalNearestSeeds.stores(spark, tmpDir(s"gns-$tag"), cfg)
      IncrementalNearestSeeds.appendDelta(st, signed(sym(hub), 1L), 0L)
      IncrementalNearestSeeds.appendDelta(st,
        signed(sym(added), 1L).unionByName(signed(sym(dropped), -1L)), 1L)
      val net = sym((hub ++ added).filterNot(dropped.contains))
      val want = GraphOps.nearestSeeds(net.toDF("src", "dst"),
          Seq((0L, 0L), (500L, 500L)).toDF("node", "seed"), maxHops = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val got = IncrementalNearestSeeds.currentLabels(st)
        .select(col("node"), col("seed"), col("dist"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"regime=$tag")
    }
  }

  test("k-core: wheel batches under the shuffle guard match the batch peel") {
    forceShuffle()
    val cfg = IncrementalKCore.Config(k = 2)
    val st = IncrementalKCore.stores(spark, tmpDir("gkc"), cfg)
    // wheel: center + ring, every node deg ≥ 2 → all in the 2-core
    IncrementalKCore.appendDelta(st, signed(hub ++ ring, 1L), 0L)
    // snip two adjacent ring edges AND their hub spokes: nodes 1, 2
    // drop below 2 and peel out; touched frontier spans the wheel
    val cut = Seq(0L -> 1L, 0L -> 2L, 1L -> 2L, 2L -> 3L,
      N.toLong -> 1L)
    IncrementalKCore.appendDelta(st, signed(cut, -1L), 1L)
    val net = (hub ++ ring).filterNot(e =>
      cut.contains(e) || cut.contains(e.swap))
    val want = GraphOps.kCore(net.toDF("src", "dst"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = IncrementalKCore.currentCore(st)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
  }
}
