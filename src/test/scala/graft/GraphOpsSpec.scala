package graft

import graft.ops.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  // star: center 0 ↔ leaves 1,2,3 (symmetrized)
  private val star = Seq(
    (0L, 1L), (0L, 2L), (0L, 3L), (1L, 0L), (2L, 0L), (3L, 0L))

  test("one iteration matches the hand-computed integer ranks") {
    val out = GraphOps.pageRankQuantized(star.toDF("src", "dst"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // center: base + 85·(3·(10⁹ div 1)) div 100 = 150000000 + 2550000000
    assert(out(0L) == 2700000000L)
    // leaf: base + 85·(10⁹ div 3) div 100 = 150000000 + 283333333
    assert(out(1L) == 433333333L)
    assert(out(2L) == 433333333L && out(3L) == 433333333L)
  }

  test("ranks are bit-identical across partitionings (integer arithmetic)") {
    val edges = (1L to 500L).flatMap { i =>
      Seq((i, i % 50), (i % 50, i), (i, (i * 7) % 500), ((i * 7) % 500, i))
    }
    val a = GraphOps.pageRankQuantized(edges.toDF("src", "dst").repartition(1), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = GraphOps.pageRankQuantized(edges.toDF("src", "dst").repartition(17), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("broadcast and shuffled iteration paths are bit-identical") {
    val edges = (1L to 300L).flatMap(i => Seq((i, i % 37), (i % 37, i)))
    val df = edges.toDF("src", "dst")
    val bcast = GraphOps.pageRankQuantized(df, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    // maxBroadcastNodes=0 forces the large-graph plan (shuffled joins,
    // AQE left on) — the hints must never change a single rank value
    val shuffled = GraphOps.pageRankQuantized(df, 3, maxBroadcastNodes = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(bcast.toSeq == shuffled.toSeq)
  }

  test("cut cadence never changes values; AQE conf is restored") {
    val edges = (1L to 200L).flatMap(i => Seq((i, i % 23), (i % 23, i)))
    val df = edges.toDF("src", "dst")
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val every = GraphOps.pageRankQuantized(df, 4, cutEvery = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val sparse = GraphOps.pageRankQuantized(df, 4, cutEvery = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(every.toSeq == sparse.toSeq)
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == aqeBefore)
  }

  test("dangling destinations get base rank and every node appears once") {
    // 1→2 only: node 2 has no out-edges (kept as a node, contributes nothing)
    val out = GraphOps.pageRankQuantized(Seq((1L, 2L)).toDF("src", "dst"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 2)
    assert(out(1L) == 150000000L) // nothing points at 1
    // 2 receives 1's full rank each iteration: base + 85·r(1) div 100
    assert(out(2L) == 150000000L + 85L * 150000000L / 100L)
  }

  // ------------------------------------------------------------ triangles

  private def tri(edges: Seq[(Long, Long)]): Long =
    GraphOps.triangleCount(edges.toDF("src", "dst")).collect()(0).getLong(0)

  test("K4 has 4 triangles; removing one edge leaves 2") {
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    assert(tri(k4) == 4L)
    assert(tri(k4.filterNot(_ == (0L, 1L))) == 2L)
  }

  test("self-loops, duplicate edges, and reversed orientations are inert") {
    val triangle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val noisy = triangle ++ triangle.map(_.swap) ++ triangle ++
      Seq((1L, 1L), (2L, 2L))
    assert(tri(triangle) == 1L)
    assert(tri(noisy) == 1L)
  }

  test("triangle count matches brute force on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val n = 40
    val edges = (for {
      u <- 0L until n.toLong; v <- 0L until n.toLong
      if u < v && rnd.nextDouble() < 0.15
    } yield (u, v)).toSeq
    val es = edges.toSet
    val expected = (for {
      (u, v) <- edges; w <- 0L until n.toLong
      if v < w && es.contains((u, w)) && es.contains((v, w))
    } yield 1).size.toLong
    assert(tri(edges) == expected)
  }

  test("star graphs (max skew, zero triangles) count zero") {
    val star = (1L to 200L).map(i => (0L, i))
    assert(tri(star) == 0L)
  }

  test("clustering coefficient: K4 is 1.0, paths are 0, mixed exact") {
    def cc(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] =
      GraphOps.clusteringCoefficient(edges.toDF("src", "dst"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    assert(cc(k4).values.toSet == Set((3L, 3L, 1000000L)))
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L))
    assert(cc(path).values.forall(_._3 == 0L))
    // triangle 1-2-3 plus pendant 4 on node 3: deg(3)=3, T=1 → 333333
    val mixed = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val m = cc(mixed)
    assert(m(1L) == ((2L, 1L, 1000000L)) && m(2L) == ((2L, 1L, 1000000L)))
    assert(m(3L) == ((3L, 1L, 333333L)))
    assert(m(4L) == ((1L, 0L, 0L))) // degree-1 node present, cc 0
  }

  test("k-core: K4+tail peels to K4; a path has no 2-core; guard fires") {
    def core(edges: Seq[(Long, Long)], k: Int, maxIter: Int = 20) =
      GraphOps.kCore(edges.toDF("src", "dst"), k, maxIter)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k4 = (for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)).toSeq
    // tail 3-4-5 hangs off the clique: all of it peels out of the 3-core
    val tailed = k4 ++ Seq((3L, 4L), (4L, 5L))
    assert(core(tailed, 3) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    // a path has no 2-core (peels from both ends); a triangle is one
    assert(core(Seq((0L, 1L), (1L, 2L), (2L, 3L)), 2) == Map.empty)
    assert(core(Seq((0L, 1L), (1L, 2L), (2L, 0L)), 2) ==
      Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // a 7-node path needs 3 peel rounds for k=2: maxIter=1 must refuse
    val chain = (0L until 6L).map(i => (i, i + 1))
    val err = intercept[IllegalArgumentException] { core(chain, 2, maxIter = 1) }
    assert(err.getMessage.contains("did not converge"))
  }

  test("k-core and clustering coefficient match brute force on a seeded random graph") {
    val rnd = new scala.util.Random(13)
    val n = 30
    val edges = (for {
      u <- 0L until n.toLong; v <- 0L until n.toLong
      if u < v && rnd.nextDouble() < 0.2
    } yield (u, v)).toSeq
    // brute-force peel to the 3-core
    var es = edges.toSet
    var stable = false
    while (!stable) {
      val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val next = es.filter(e => deg(e._1) >= 3 && deg(e._2) >= 3)
      stable = next == es
      es = next
    }
    val expectedCore = es.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val gotCore = GraphOps.kCore(edges.toDF("src", "dst"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCore == expectedCore)
    // brute-force local clustering coefficient on the full graph
    val adj = edges.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val expectedCc = adj.map { case (v, nb) =>
      val deg = nb.size.toLong
      val tri = (for (a <- nb.toSeq; b <- nb.toSeq
                      if a < b && adj(a).contains(b)) yield 1).size.toLong
      v -> ((deg, tri,
        if (deg < 2) 0L else 2L * tri * 1000000L / (deg * (deg - 1))))
    }
    val gotCc = GraphOps.clusteringCoefficient(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(gotCc == expectedCc)
  }

  // ------------------------------------------------------------------ bfs

  private def bfs(edges: Seq[(Long, Long)], src: Long, hops: Int): Map[Long, Long] =
    GraphOps.bfsDistances(edges.toDF("src", "dst"), src, hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph: distances count hops and maxHops truncates") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    assert(bfs(path, 0L, 10) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
    assert(bfs(path, 0L, 2) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("shortest path wins over longer alternatives; cycles terminate") {
    // 0→1→2→0 cycle plus a 0→2 shortcut: d(2) = 1, not 2
    val g = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L))
    assert(bfs(g, 0L, 5) == Map(0L -> 0L, 1L -> 1L, 2L -> 1L))
  }

  test("unreachable nodes are absent; isolated source is just itself") {
    val g = Seq((0L, 1L), (5L, 6L)) // two components
    assert(bfs(g, 0L, 4) == Map(0L -> 0L, 1L -> 1L))
    assert(bfs(g, 9L, 4) == Map(9L -> 0L)) // 9 has no edges at all
  }

  test("nearest seeds: distance wins, ties break to the smaller seed id") {
    def near(edges: Seq[(Long, Long)], seeds: Seq[(Long, Long)], hops: Int) =
      GraphOps.nearestSeeds(edges.toDF("src", "dst"),
          seeds.toDF("node", "seed"), hops)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    // path 0-1-2-3-4, seeds at both ends (bidirectional edges)
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val bi = path ++ path.map(_.swap)
    val m = near(bi, Seq(0L -> 10L, 4L -> 20L), 4)
    assert(m(0L) == ((10L, 0L)) && m(4L) == ((20L, 0L)))
    assert(m(1L) == ((10L, 1L)) && m(3L) == ((20L, 1L)))
    assert(m(2L) == ((10L, 2L))) // equidistant: min seed id wins
    // duplicate seed rows collapse to the min; unreachable nodes absent
    val m2 = near(Seq((0L, 1L)), Seq(0L -> 7L, 0L -> 3L), 2)
    assert(m2 == Map(0L -> ((3L, 0L)), 1L -> ((3L, 1L))))
  }

  test("bounded weighted shortest paths: cheaper long route wins within the bound") {
    def sssp(edges: Seq[(Long, Long, Long)], src: Long, hops: Int) =
      GraphOps.ssspBounded(edges.toDF("src", "dst", "w"), src, hops)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 0→3 direct costs 10; 0→1→2→3 costs 3 but needs 3 hops
    val g = Seq((0L, 3L, 10L), (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L))
    assert(sssp(g, 0L, 1) == Map(0L -> 0L, 1L -> 1L, 3L -> 10L))
    assert(sssp(g, 0L, 2) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 10L))
    assert(sssp(g, 0L, 3) == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    // parallel edges: the lighter one is chosen; cycles don't loop costs
    val multi = Seq((0L, 1L, 5L), (0L, 1L, 2L), (1L, 0L, 1L))
    assert(sssp(multi, 0L, 4) == Map(0L -> 0L, 1L -> 2L))
  }

  test("frontier dedup: diamond reached through two parents appears once") {
    val diamond = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))
    assert(bfs(diamond, 0L, 3) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L))
  }
}
