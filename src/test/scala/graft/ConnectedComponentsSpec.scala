package graft

import graft.ops.DedupOps

/** Duplicate clustering: connected components over near-dup pairs and the
  * canonical-survivor selection built on it. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: (Long, Long)*): Map[Long, Long] =
    DedupOps.connectedComponents(edges.toDF("id1", "id2"))
      .as[(Long, Long)].collect().toMap

  test("chain propagates the min label across the full diameter") {
    // 1-2-3-4-5 is the worst case for naive propagation: diameter 4
    assert(cc(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep distinct min labels") {
    val got = cc(1L -> 2L, 2L -> 3L, 10L -> 11L, 20L -> 21L, 21L -> 20L)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("min label wins regardless of edge direction") {
    // min id only ever appears on the right-hand side
    assert(cc(5L -> 1L, 6L -> 5L, 7L -> 6L) ==
      Map(1L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 1L))
  }

  test("dupClusters sizes clusters and flags exactly one canonical each") {
    val pairs = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L).toDF("id1", "id2")
    val got = DedupOps.dupClusters(pairs)
      .select($"node", $"cluster_id", $"cluster_size", $"is_canonical")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 1L, 3L, true), (2L, 1L, 3L, false), (3L, 1L, 3L, false),
      (10L, 10L, 2L, true), (11L, 10L, 2L, false)))
  }

  test("keepCanonical retains the best-quality doc per cluster plus singletons") {
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      (1L, "a", 10L), (2L, "b", 99L), (3L, "c", 50L), // cluster {1,2,3}
      (10L, "d", 5L), (11L, "e", 5L),                 // cluster {10,11}: tie → min id
      (42L, "f", 1L)                                  // singleton, never paired
    ).toDF("doc_id", "text", "quality")
    val pairs = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L).toDF("id1", "id2")
    val kept = DedupOps.keepCanonical(corpus, pairs, "doc_id",
        qualityOrder = Seq(col("quality").desc))
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toSet
    // highest quality wins (doc 2), quality ties break to smallest id
    // (doc 10), unpaired docs survive as their own singleton cluster
    assert(kept == Set((2L, 1L), (10L, 10L), (42L, 42L)))
  }

  test("planted exact duplicates land in the same cluster end-to-end") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta"), (4L, "epsilon zeta eta theta"),
      (5L, "totally unrelated words here")).toDF("doc_id", "text")
    val pairs = DedupOps.ngramJaccardPairs(docs, "text", "doc_id",
      shingleLen = 2, threshold = 0.9, maxDf = 10)
    val clusters = DedupOps.dupClusters(pairs)
      .select($"node", $"cluster_id").as[(Long, Long)].collect().toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    // doc 5 never paired: untouched by clustering (survives by default)
  }

  // ---- alternating large-star/small-star variant ----

  private def ccAlt(maxIter: Int, edges: (Long, Long)*): Map[Long, Long] =
    DedupOps.connectedComponentsAlternating(
      edges.toDF("id1", "id2"), maxIter = maxIter)
      .as[(Long, Long)].collect().toMap

  test("alternating CC equals min-label CC on random small-diameter graphs") {
    val rnd = new scala.util.Random(7L)
    (1 to 3).foreach { trial =>
      val n = 60
      val edges = (1 to 120).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val viaLabels = cc(edges: _*)
      val viaStars = ccAlt(40, edges: _*)
      assert(viaStars == viaLabels, s"trial $trial diverged")
    }
  }

  test("alternating CC resolves a 256-node chain in O(log n) rounds") {
    // diameter 255: min-label needs ~255 rounds; alternating must land
    // the full component on label 0 within 16 alternations
    val chain = (0L until 255L).map(i => (i, i + 1))
    val got = ccAlt(16, chain: _*)
    assert(got.size == 256 && got.values.forall(_ == 0L))
  }

  test("min-label CC refuses to return silently wrong labels past maxIter") {
    // the old behavior returned partially-propagated labels; now it fires
    val chain = (0L until 100L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException] {
      DedupOps.connectedComponents(chain.toDF("id1", "id2"), maxIter = 5)
        .count()
    }
    assert(e.getMessage.contains("connectedComponentsAlternating"))
  }

  test("alternating CC: cliques, singleton pairs, reversed edges, empty input") {
    val clique = for (a <- 20L to 25L; b <- 20L to 25L if a < b) yield (a, b)
    val got = ccAlt(40, (clique ++ Seq((3L, 1L), (50L, 49L))): _*)
    assert((20L to 25L).forall(got(_) == 20L))
    assert(got(1L) == 1L && got(3L) == 1L && got(49L) == 49L && got(50L) == 49L)
    val empty = DedupOps.connectedComponentsAlternating(
      Seq.empty[(Long, Long)].toDF("id1", "id2"))
    assert(empty.count() == 0)
  }
}
