package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property sweep of the PassJoin blocking INVARIANT (pure — no Spark
  * jobs): for any pair within edit distance k, at least one of the
  * indexed string's k+1 segments (by the exact seg-plan arithmetic the
  * DataFrame code uses) must occur in the other string at a position
  * within ±k of its own — this is precisely the (index, segment, ±k
  * position window) key the join blocks on, so the property IS the
  * completeness proof obligation of the candidate generation.
  * FuzzyJoinSpec separately brute-force-compares the full Spark
  * pipeline; this sweep hammers the math at ScalaCheck scale. */
class FuzzyJoinPropertySpec extends SparkSpec {

  private def check(prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  /** The exact segment plan from FuzzyJoin: lengths determined by the
    * indexed string's length alone; long segments are the LAST rem. */
  private def segments(s: String, k: Int): Seq[(Int, Int, String)] = {
    val nseg = k + 1
    val base = s.length / nseg
    val rem = s.length % nseg
    (0 until nseg).map { i =>
      val len = base + (if (i >= nseg - rem) 1 else 0)
      val start = i * base + math.max(0, i - (nseg - rem))
      (i, start, s.substring(start, start + len))
    }
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Does any segment of `s` occur in `t` within ±k of its own start —
    * the candidate condition the 4-part equi-join key encodes? */
  private def blocked(s: String, t: String, k: Int): Boolean =
    segments(s, k).exists { case (_, start, seg) =>
      seg.nonEmpty && (math.max(0, start - k) to
        math.min(t.length - seg.length, start + k)).exists(p =>
        t.regionMatches(p, seg, 0, seg.length))
    }

  private val alpha = "ab" // tiny alphabet maximizes coincidental matches AND edit collisions
  private def strGen(lo: Int, hi: Int): Gen[String] = for {
    n <- Gen.choose(lo, hi)
    cs <- Gen.listOfN(n, Gen.oneOf(alpha.toSeq))
  } yield cs.mkString

  private def editsGen(s: String, k: Int): Gen[String] = {
    def edit(cur: String): Gen[String] = Gen.oneOf(0, 1, 2).flatMap {
      case 0 if cur.nonEmpty => // delete
        Gen.choose(0, cur.length - 1).map(i => cur.patch(i, "", 1))
      case 1 => // insert
        for (i <- Gen.choose(0, cur.length); c <- Gen.oneOf(alpha.toSeq))
          yield cur.patch(i, c.toString, 0)
      case _ if cur.nonEmpty => // substitute
        for (i <- Gen.choose(0, cur.length - 1); c <- Gen.oneOf(alpha.toSeq))
          yield cur.updated(i, c)
      case _ => Gen.const(cur)
    }
    Gen.choose(0, k).flatMap { e =>
      (1 to e).foldLeft(Gen.const(s))((g, _) => g.flatMap(edit))
    }
  }

  test("pigeonhole: every within-k mutation is reachable through some segment block") {
    for (k <- 1 to 3) check(Prop.forAll(strGen(k + 1, 24)) { s =>
      Prop.forAll(editsGen(s, k)) { t =>
        val d = lev(s, t)
        // the join only indexes strings of length ≥ k+1 and only probes
        // lengths within ±k — mirror those guards
        d > k || t.length < math.max(0, s.length - k) ||
          t.length > s.length + k || blocked(s, t, k)
      }
    })
  }

  test("blocking is sound in reverse too: symmetric pairs block in at least one direction") {
    // the Spark join indexes EVERY long string and probes EVERY string,
    // so a pair is found if blocked(s,t) OR blocked(t,s); sweep that
    // weaker-per-direction, stronger-in-union form on independent pairs
    check(Prop.forAll(strGen(3, 16), strGen(3, 16)) { (s, t) =>
      val k = 2
      val d = lev(s, t)
      d > k || math.abs(s.length - t.length) > k ||
        s.length < k + 1 || t.length < k + 1 ||
        blocked(s, t, k) || blocked(t, s, k)
    }, n = 500)
  }
}
