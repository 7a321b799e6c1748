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
}
