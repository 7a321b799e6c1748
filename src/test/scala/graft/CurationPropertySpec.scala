package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.ops.{CurationOps, DedupOps}

/** Property sweeps for the curation operators against brute-force Scala
  * references — random inputs catch the attribution/labeling edge cases a
  * hand-picked fixture misses. */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val rowsGen = for {
    n <- Gen.choose(0, 80)
    rows <- Gen.listOfN(n, for {
      a <- Gen.choose(0, 9)
      b <- Gen.choose(0L, 99L)
    } yield (a, b))
  } yield rows

  test("filterFunnel attribution equals the brute-force first-fail rule") {
    val stages = Seq[(String, (Int, Long) => Boolean)](
      "s1" -> ((a, _) => a >= 2),
      "s2" -> ((_, b) => b < 90L),
      "s3" -> ((a, b) => a.toLong + b != 50L))
    val colStages = Seq(
      "s1" -> ($"a" >= 2),
      "s2" -> ($"b" < 90L),
      "s3" -> ($"a" + $"b" =!= 50L))
    check(Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val got = CurationOps.filterFunnel(rows.toDF("a", "b"), colStages)
          .as[(String, Long)].collect().toMap
        val attributed = rows.map { case (a, b) =>
          stages.find { case (_, p) => !p(a, b) }.map(_._1).getOrElse("kept")
        }
        val expected = (stages.map(_._1) :+ "kept")
          .map(s => s -> attributed.count(_ == s).toLong).toMap
        got == expected
      }
    })
  }

  private val graphGen = for {
    nNodes <- Gen.choose(1, 30)
    nEdges <- Gen.choose(0, 40)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0L, nNodes.toLong - 1)
      b <- Gen.choose(0L, nNodes.toLong - 1) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    quality <- Gen.listOfN(nNodes, Gen.choose(0L, 5L))
  } yield (nNodes, edges.distinct, quality)

  test("keepCanonical equals brute-force union-find + best-quality pick") {
    check(Prop.forAll(graphGen) { case (nNodes, edges, quality) =>
      val corpus = (0 until nNodes).map(i => (i.toLong, quality(i)))
        .toDF("id", "q")
      val pairs = edges.toDF("id1", "id2")
      val got = DedupOps.keepCanonical(corpus, pairs, "id",
          qualityOrder = Seq(col("q").desc))
        .select($"id", $"cluster_id").as[(Long, Long)].collect().toSet
      // reference: union-find, then per-component argmax (q desc, id asc)
      val parent = Array.tabulate(nNodes)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until nNodes).groupBy(find)
        .map { case (_, members) =>
          val clusterId = members.min.toLong // min id = component label
          val best = members.minBy(m => (-quality(m), m.toLong))
          (best.toLong, clusterId)
        }.toSet
      got == expected
    }, n = 40)
  }

  test("keepCanonical survives a corpus that carries node/label columns") {
    // regression: the internal CC join columns must not collide with
    // same-named user columns
    val corpus = Seq(
      (1L, 5L, "n1", "l1"), (2L, 9L, "n2", "l2"), (3L, 1L, "n3", "l3"))
      .toDF("id", "q", "node", "label")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val got = DedupOps.keepCanonical(corpus, pairs, "id",
        qualityOrder = Seq(col("q").desc))
      .select($"id", $"cluster_id", $"node", $"label")
      .as[(Long, Long, String, String)].collect().toSet
    assert(got == Set((2L, 1L, "n2", "l2"), (3L, 3L, "n3", "l3")))
  }

  private val weightedGen = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      strat <- Gen.choose(0, 3)
      w <- Gen.choose(1L, 1000L)
    } yield (strat, w))
    k <- Gen.choose(1, 8)
  } yield (rows.zipWithIndex.map { case ((st, w), i) =>
    (i.toLong, s"s$st", w) }, k)

  test("weightedSample equals the brute-force A-ES draw on random strata") {
    check(Prop.forAll(weightedGen) { case (rows, k) =>
      val df = rows.toDF("id", "src", "w")
      def key(id: Long, w: Long): Double = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"wsample:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        val v = java.lang.Long.parseLong(hex, 16)
        math.log((v.toDouble + 0.5) / 1152921504606846976.0) / w.toDouble
      }
      val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
        rs.sortBy { case (id, _, w) => (-key(id, w), -id) }.take(k)
      }.map(_._1).toSet
      // partitioning-invariant: a repartitioned corpus draws the same set
      val got = CurationOps.weightedSample(df.repartition(7), "src", "id",
        "w", k).collect().map(_.getLong(0)).toSet
      got == want
    }, n = 20)
  }
}
