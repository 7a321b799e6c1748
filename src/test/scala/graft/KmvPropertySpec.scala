package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.KmvSketch

/** Property sweep over the KMV primitive itself (pure — no Spark jobs):
  * the buffer's append-and-prune must equal the mathematical bottom-k for
  * every insertion order and interleaved prune schedule, merge must be
  * order-invariant (what makes maintenance replay-safe), and the exact
  * regime's set counts must equal true set algebra. Raw ScalaCheck, same
  * convention as MergePropertySpec. */
class KmvPropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 40): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private def bottomK(values: Seq[Long], k: Int): Seq[Long] =
    values.distinct
      .sortWith((a, b) => java.lang.Long.compareUnsigned(a, b) < 0)
      .take(k)

  private def sketchOf(values: Seq[Long], k: Int): Array[Long] = {
    val agg = KmvSketch.aggregator(k)
    val b = values.foldLeft(agg.zero)((acc, v) => agg.reduce(acc, v))
    agg.finish(b)
  }

  // hashes across the full signed range so unsigned ordering is exercised
  private val hashesGen: Gen[List[Long]] = for {
    n <- Gen.choose(0, 400)
    vs <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(-5L, 5L))) // force duplicates and sign-boundary values
  } yield vs

  private val kGen: Gen[Int] = Gen.choose(1, 64)

  test("sketch equals the mathematical bottom-k for any insertion order") {
    check(Prop.forAll(hashesGen, kGen) { (vs, k) =>
      sketchOf(vs, k).toSeq == bottomK(vs, k)
    })
  }

  test("merge is split-point and order invariant (replay safety)") {
    check(Prop.forAll(hashesGen, kGen, Gen.choose(0.0, 1.0)) { (vs, k, f) =>
      val cut = (vs.length * f).toInt
      val (l, r) = vs.splitAt(cut)
      val agg = KmvSketch.aggregator(k)
      def buf(s: Seq[Long]) =
        s.foldLeft(agg.zero)((acc, v) => agg.reduce(acc, v))
      val lr = agg.finish(agg.merge(buf(l), buf(r))).toSeq
      val rl = agg.finish(agg.merge(buf(r), buf(l))).toSeq
      val direct = sketchOf(vs, k).toSeq
      lr == direct && rl == direct &&
        KmvSketch.union(sketchOf(l, k), sketchOf(r, k), k).toSeq == direct
    })
  }

  test("exact regime: estimate and set counts equal true set algebra") {
    check(Prop.forAll(hashesGen, hashesGen) { (as, bs) =>
      val k = 512 // above the generator's max distinct count → exact regime
      val (skA, skB) = (sketchOf(as, k), sketchOf(bs, k))
      val (ni, nu) = KmvSketch.exactSetCounts(skA, skB, k)
      val (sa, sb) = (as.toSet, bs.toSet)
      ni == sa.intersect(sb).size.toLong &&
        nu == sa.union(sb).size.toLong &&
        KmvSketch.estimateDistinct(skA, k) == sa.size.toDouble
    })
  }
}
