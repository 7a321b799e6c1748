package graft

import graft.ops.FuzzyJoin
import org.apache.spark.sql.functions._

/** PassJoin edit-distance self-join vs the brute-force quadratic answer.
  *
  * The segment-filter's claim is COMPLETENESS — every pair within
  * distance k survives the blocking — so each test compares the full
  * result set (ids + distance) against an all-pairs levenshtein sweep
  * on corpora designed to stress the filter: planted single-edit
  * mutations, shared prefixes (the worst-case block shape), length
  * spreads crossing the ±k window, and strings shorter than k+1 chars
  * (the pigeonhole-less pool handled by the short×short path).
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (i1, s1) <- rows; (i2, s2) <- rows if i1 < i2
      d = lev(s1, s2) if d <= k
    } yield (i1, i2, d)).toSet
  }

  private def run(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.selfEditDistanceJoin(rows.toDF("id", "s"), "id", "s", k)
      .select($"id1", $"id2", $"dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("planted mutations: insert / delete / substitute all recovered") {
    val base = "correlation"
    val rows = Seq[(Long, String)](
      1L -> base,
      2L -> "corelation",    // delete  (d=1)
      3L -> "correlations",  // insert  (d=1)
      4L -> "carrelation",   // substitute (d=1)
      5L -> "carrelatian",   // two substitutes (d=2)
      6L -> "completely-different")
    for (k <- 1 to 2) assert(run(rows, k) == brute(rows, k), s"k=$k")
  }

  test("shared-prefix corpus (worst-case blocks) matches brute force") {
    // the Customer#000000NNN shape: long common prefix, digit tail
    val rows = (0L until 120L).map(i => i -> f"Record#${i * 37 % 500}%06d")
    for (k <- 1 to 2) assert(run(rows, k) == brute(rows, k), s"k=$k")
  }

  test("mixed lengths and short strings (< k+1 chars) are complete") {
    val rows = Seq[(Long, String)](
      1L -> "", 2L -> "a", 3L -> "ab", 4L -> "b", 5L -> "ba",
      6L -> "abc", 7L -> "abcd", 8L -> "abcdef", 9L -> "bbcdef",
      10L -> "x", 11L -> "xyzzy", 12L -> "zzz")
    for (k <- 1 to 3) assert(run(rows, k) == brute(rows, k), s"k=$k")
  }

  test("seeded random corpus with random edits matches brute force") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdef"
    def randStr(n: Int) = (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val seeds = (0 until 40).map(_ => randStr(4 + rnd.nextInt(8)))
    val mutated = seeds.flatMap { s =>
      val edited = rnd.nextInt(3) match {
        case 0 if s.nonEmpty => s.patch(rnd.nextInt(s.length), "", 1) // delete
        case 1 => s.patch(rnd.nextInt(s.length + 1), rnd.nextInt(2) match {
          case _ => alpha(rnd.nextInt(alpha.length)).toString
        }, 0) // insert
        case _ if s.nonEmpty =>
          s.updated(rnd.nextInt(s.length), alpha(rnd.nextInt(alpha.length)))
        case _ => s
      }
      Seq(s, edited)
    }
    val rows = mutated.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    for (k <- 1 to 2) assert(run(rows, k) == brute(rows, k), s"k=$k")
  }

  test("identical strings under different ids pair at distance 0") {
    val rows = Seq[(Long, String)](1L -> "same", 2L -> "same", 3L -> "same")
    assert(run(rows, 1) == Set((1L, 2L, 0), (1L, 3L, 0), (2L, 3L, 0)))
  }

  test("k = 0 is refused (exact dedup belongs to DedupOps)") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.selfEditDistanceJoin(Seq((1L, "a")).toDF("id", "s"), "id", "s", 0)
    }
  }

  private def jaccardBrute(rows: Seq[(Long, Seq[String])], tE6: Long) =
    (for {
      (i1, t1) <- rows; (i2, t2) <- rows if i1 < i2
      inter = (t1.distinct.toSet intersect t2.distinct.toSet).size.toLong
      un = (t1.distinct.toSet union t2.distinct.toSet).size.toLong
      if un > 0 && inter * 1000000L / un >= tE6
    } yield (i1, i2, inter, un, inter * 1000000L / un)).toSet

  private def jaccardRun(rows: Seq[(Long, Seq[String])], tE6: Long) =
    FuzzyJoin.jaccardSelfJoin(rows.toDF("id", "toks"), "id", "toks", tE6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("jaccard self-join equals brute force on a seeded random corpus") {
    // small vocab forces heavy token sharing — exactly where the prefix
    // filter must stay COMPLETE, not just selective
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 30).map(i => s"w$i")
    val base = (0L until 60L).map(i =>
      i -> Seq.fill(4 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))))
    // planted near-dups: copies with one token changed
    val dups = base.take(8).map { case (i, t) =>
      (1000L + i) -> (t.drop(1) :+ "w_changed")
    }
    val rows = base ++ dups
    Seq(300000L, 500000L, 800000L, 1000000L).foreach { t =>
      assert(jaccardRun(rows, t) == jaccardBrute(rows, t), s"tE6=$t")
    }
    assert(jaccardBrute(rows, 500000L).nonEmpty)
  }

  test("jaccard: exact duplicates pair at 1e6; empty/blank tokens ignored") {
    val rows = Seq[(Long, Seq[String])](
      1L -> Seq("a", "b", "c"),
      2L -> Seq("c", "b", "a", "a", ""),   // same set after dedup/blank-drop
      3L -> Seq("x", "y"))
    val got = jaccardRun(rows, 1000000L)
    assert(got == Set((1L, 2L, 3L, 3L, 1000000L)))
  }

  private def containBrute(rows: Seq[(Long, Seq[String])], tE6: Long) =
    (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia != ib
      sa = ta.distinct.toSet; sb = tb.distinct.toSet
      inter = (sa intersect sb).size.toLong
      if sa.nonEmpty && inter * 1000000L / sa.size >= tE6
    } yield (ia, ib, inter, sa.size.toLong, inter * 1000000L / sa.size)).toSet

  private def containRun(rows: Seq[(Long, Seq[String])], tE6: Long) =
    FuzzyJoin.containmentSelfJoin(rows.toDF("id", "toks"), "id", "toks", tE6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  test("containment self-join equals brute force; catches subsets Jaccard misses") {
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 25).map(i => s"w$i")
    val base = (0L until 50L).map(i =>
      i -> Seq.fill(3 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))))
    // planted excerpts: tiny strict subsets of larger docs — containment
    // 1.0 by construction, Jaccard small when the host is much larger
    val excerpts = base.filter(_._2.distinct.size >= 6).take(6).map {
      case (i, t) => (2000L + i) -> t.distinct.take(3)
    }
    val rows = base ++ excerpts
    Seq(600000L, 800000L, 1000000L).foreach { t =>
      assert(containRun(rows, t) == containBrute(rows, t), s"tE6=$t")
    }
    // every planted excerpt is found at containment 1.0 against its host
    val found = containRun(rows, 1000000L)
    excerpts.foreach { case (eid, _) =>
      assert(found.exists { case (a, _, _, _, c) => a == eid && c == 1000000L },
        s"excerpt $eid not recovered")
    }
    // ...and the jaccard join at 0.5 does NOT pair a 3-token excerpt
    // with a host twice its size (the asymmetric relation is the point)
    val hostOf = excerpts.map { case (eid, t) =>
      eid -> base.find(_._2.distinct.startsWith(t)).map(_._1)
    }.collect { case (e, Some(h)) => e -> h }
    val jac = jaccardRun(rows, 500000L)
    hostOf.filter { case (_, h) =>
      rows.toMap.apply(h).distinct.size > 6 }.take(2).foreach { case (e, h) =>
        val (lo, hi) = (math.min(e, h), math.max(e, h))
        assert(!jac.exists { case (a, b, _, _, _) => a == lo && b == hi },
          s"jaccard unexpectedly paired excerpt $e with host $h") }
  }

  test("jaccard: float-ceil prefix shortening would lose pairs; integer ceil does not") {
    // |A| = 5, t = 0.6: o = ceil(3.0) = 3 exactly — a double 0.6*5
    // rounds to 3.0000000000000004, ceil 4, prefix one too short; the
    // pair below shares ONLY its 3rd-ranked prefix token, so it
    // survives iff the bound is computed in integer arithmetic
    val common = Seq("u1", "u2", "u3") // rare: appear in exactly these two
    val rows = Seq[(Long, Seq[String])](
      1L -> (common ++ Seq("zz", "zz2")),
      2L -> (common ++ Seq("zz3", "zz4")),
      // pad the vocab so the shared tokens are not the globally rarest
      3L -> Seq("zz", "zz2", "zz3", "zz4"))
    val got = jaccardRun(rows, 428571L) // 3/7 = 0.42857…
    assert(got.contains((1L, 2L, 3L, 7L, 428571L)), got.toString)
  }
}
