package graft

import graft.ops.{IncrementalAgg, JoinTreeIvm}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-ary join-tree IVM vs the one-shot multi-way join, under
  * interleavings across all leaves, duplicate rows, signed delete waves
  * on fact AND dimension leaves, crash replays at every entry level,
  * whole-tree compactions, and a 4-leaf tree. */
class JoinTreeIvmSpec extends SparkSpec {
  import spark.implicits._

  // fact(ok, ck, v) ⋈ cust(ck, nk) on ck ⋈ nat(nk, name) on nk
  private def tree(agg: Option[IncrementalAgg.Spec] = None) =
    JoinTreeIvm.stores(spark, tmpDir("jtree"), Seq(Seq("ck"), Seq("nk")),
      buckets = 4, aggSpec = agg)

  private def fact(rows: (Long, Long, Long)*): DataFrame =
    rows.toDF("ok", "ck", "v")
  private def cust(rows: (Long, Long)*): DataFrame =
    rows.toDF("ck", "nk")
  private def nat(rows: (Long, String)*): DataFrame =
    rows.toDF("nk", "name")

  private def treeSet(st: JoinTreeIvm.Stores) =
    JoinTreeIvm.current(st).select($"ok", $"ck", $"nk", $"name", $"n")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSet

  private def oneShot(f: DataFrame, c: DataFrame, n: DataFrame) =
    f.join(c, Seq("ck")).join(n, Seq("nk"))
      .groupBy($"ok", $"ck", $"nk", $"name").agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSet

  test("interleaved inserts on all three leaves equal the one-shot 3-way join") {
    val st = tree()
    val f1 = fact((1L, 10L, 100L), (2L, 20L, 200L), (2L, 20L, 200L))
    val c1 = cust(10L -> 1L, 30L -> 3L)
    val n1 = nat(1L -> "de", 2L -> "fr")
    val f2 = fact((3L, 30L, 300L), (4L, 10L, 400L))
    val c2 = cust(20L -> 2L, 10L -> 2L) // ck=10 now matches TWO customers
    val n2 = nat(3L -> "jp")
    // every ordering constraint the cascade must honor: dims late, dims
    // early, fact late — the Δ-rule's asymmetric terms all exercised
    JoinTreeIvm.appendLeaf(st, 0, f1, 0L)
    JoinTreeIvm.appendLeaf(st, 1, c1, 1L)
    JoinTreeIvm.appendLeaf(st, 2, n1, 2L)
    JoinTreeIvm.appendLeaf(st, 0, f2, 3L)
    JoinTreeIvm.appendLeaf(st, 2, n2, 4L)
    JoinTreeIvm.appendLeaf(st, 1, c2, 5L)
    val want = oneShot(f1.unionByName(f2), c1.unionByName(c2),
      n1.unionByName(n2))
    assert(treeSet(st) == want)
    // multiplicities are real products: ok=2 is a duplicate fact row
    assert(treeSet(st).exists(_._5 > 1))
  }

  test("a dimension delete retracts every joined fact row it supported") {
    val st = tree()
    val f1 = fact((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L))
    val c1 = cust(10L -> 1L, 20L -> 2L)
    val n1 = nat(1L -> "de", 2L -> "fr")
    JoinTreeIvm.appendLeaf(st, 0, f1, 0L)
    JoinTreeIvm.appendLeaf(st, 1, c1, 1L)
    JoinTreeIvm.appendLeaf(st, 2, n1, 2L)
    assert(treeSet(st).size == 3)
    // right-to-be-forgotten on the MIDDLE leaf: customer 10 leaves —
    // both its facts' joined rows must net to zero
    JoinTreeIvm.appendLeafDelta(st, 1,
      Seq((10L, 1L, -1L)).toDF("ck", "nk", "__delta"), 3L)
    assert(treeSet(st) == oneShot(f1, cust(20L -> 2L), n1))
    // fact-side delete rides the same path
    JoinTreeIvm.appendLeafDelta(st, 0,
      Seq((3L, 20L, 300L, -1L)).toDF("ok", "ck", "v", "__delta"), 4L)
    assert(treeSet(st).isEmpty)
    // re-insert the customer: the surviving facts re-join (ok=3 stays
    // deleted) — state net-zero keys really vanished, not hid
    JoinTreeIvm.appendLeaf(st, 1, cust(10L -> 1L), 5L)
    assert(treeSet(st) == oneShot(fact((1L, 10L, 100L), (2L, 10L, 200L)),
      cust(10L -> 1L, 20L -> 2L), n1))
  }

  test("replays no-op at every entry level; compaction is result-invariant") {
    val st = tree()
    val f1 = fact((1L, 10L, 100L), (2L, 20L, 200L))
    val c1 = cust(10L -> 1L, 20L -> 1L)
    val n1 = nat(1L -> "de")
    JoinTreeIvm.appendLeaf(st, 0, f1, 0L)
    JoinTreeIvm.appendLeaf(st, 1, c1, 1L)
    JoinTreeIvm.appendLeaf(st, 2, n1, 2L)
    val want = treeSet(st)
    // committed replays on each leaf: the ENTRY level's manifest stops
    // the whole cascade — no downstream level double-applies
    JoinTreeIvm.appendLeaf(st, 0, f1, 0L)
    JoinTreeIvm.appendLeaf(st, 1, c1, 1L)
    JoinTreeIvm.appendLeaf(st, 2, n1, 2L)
    assert(treeSet(st) == want)
    JoinTreeIvm.compact(st)
    assert(treeSet(st) == want)
    // post-compaction batch still flows; pre-compaction replay still no-ops
    JoinTreeIvm.appendLeaf(st, 2, nat(1L -> "de"), 3L) // name dup: n=2 rows
    val after = treeSet(st)
    assert(after.forall(_._5 == 2L))
    JoinTreeIvm.appendLeaf(st, 1, c1, 1L)
    assert(treeSet(st) == after)
  }

  test("maintained aggregate over the full join equals one-shot GROUP BY") {
    val st = tree(Some(IncrementalAgg.Spec(Seq("name"), Seq("v"))))
    val f1 = fact((1L, 10L, 100L), (2L, 20L, 200L), (3L, 10L, 50L))
    val c1 = cust(10L -> 1L, 20L -> 2L)
    val n1 = nat(1L -> "de", 2L -> "fr")
    JoinTreeIvm.appendLeaf(st, 1, c1, 0L)
    JoinTreeIvm.appendLeaf(st, 2, n1, 1L)
    JoinTreeIvm.appendLeaf(st, 0, f1, 2L)
    def agg() = JoinTreeIvm.currentAgg(st).select($"name", $"n_rows", $"sum_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(agg() == Set(("de", 2L, 150L), ("fr", 1L, 200L)))
    // a dimension takedown reaches the aggregate: fr nets to zero rows
    JoinTreeIvm.appendLeafDelta(st, 1,
      Seq((20L, 2L, -1L)).toDF("ck", "nk", "__delta"), 3L)
    assert(agg() == Set(("de", 2L, 150L)))
    JoinTreeIvm.compact(st)
    assert(agg() == Set(("de", 2L, 150L)))
  }

  test("a 4-leaf tree maintains the 4-way join") {
    val st = JoinTreeIvm.stores(spark, tmpDir("jtree4"),
      Seq(Seq("b"), Seq("c"), Seq("d")), buckets = 2)
    val l0 = Seq((1L, 10L), (2L, 20L)).toDF("a", "b")
    val l1 = Seq((10L, 100L), (20L, 200L)).toDF("b", "c")
    val l2 = Seq((100L, 1000L), (200L, 2000L)).toDF("c", "d")
    val l3 = Seq((1000L, "x"), (2000L, "y")).toDF("d", "t")
    JoinTreeIvm.appendLeaf(st, 3, l3, 0L)
    JoinTreeIvm.appendLeaf(st, 0, l0, 1L)
    JoinTreeIvm.appendLeaf(st, 2, l2, 2L)
    JoinTreeIvm.appendLeaf(st, 1, l1, 3L)
    val got = JoinTreeIvm.current(st).select($"a", $"t", $"n").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "x", 1L), (2L, "y", 1L)))
    // deep retraction: deleting the LAST leaf's row unwinds the chain
    JoinTreeIvm.appendLeafDelta(st, 3,
      Seq((2000L, "y", -1L)).toDF("d", "t", "__delta"), 4L)
    val got2 = JoinTreeIvm.current(st).select($"a", $"t", $"n").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got2 == Set((1L, "x", 1L)))
  }

  test("outer LAST level: facts keep flowing without the dimension") {
    val st = JoinTreeIvm.stores(spark, tmpDir("jtreeO"),
      Seq(Seq("ck"), Seq("nk")), buckets = 4, outerLast = true)
    def cur() = JoinTreeIvm.current(st)
      .select($"ok", $"ck", $"nk", $"name", $"n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.getString(3)), r.getLong(4))).toSet
    JoinTreeIvm.appendLeaf(st, 0,
      fact((1L, 10L, 100L), (2L, 20L, 200L), (3L, 30L, 300L)), 0L)
    JoinTreeIvm.appendLeaf(st, 1, cust(10L -> 1L, 20L -> 2L, 30L -> 3L), 1L)
    JoinTreeIvm.appendLeaf(st, 2, nat(1L -> "de"), 2L)
    assert(cur() == Set(
      (1L, 10L, 1L, Some("de"), 1L),
      (2L, 20L, 2L, None, 1L),
      (3L, 30L, 3L, None, 1L)))
    // LATE right batch: nk=2's null-extended row must be RETRACTED
    JoinTreeIvm.appendLeaf(st, 2, nat(2L -> "fr"), 3L)
    assert(cur() == Set(
      (1L, 10L, 1L, Some("de"), 1L),
      (2L, 20L, 2L, Some("fr"), 1L),
      (3L, 30L, 3L, None, 1L)))
    // right DELETE: nk=2 loses its last row — the null row is RE-ADDED
    JoinTreeIvm.appendLeafDelta(st, 2,
      Seq((2L, "fr", -1L)).toDF("nk", "name", "__delta"), 4L)
    assert(cur() == Set(
      (1L, 10L, 1L, Some("de"), 1L),
      (2L, 20L, 2L, None, 1L),
      (3L, 30L, 3L, None, 1L)))
    // a MIDDLE-leaf takedown cascades into the outer level: customer 30
    // leaves, its fact's outer row (matched or not) must vanish
    JoinTreeIvm.appendLeafDelta(st, 1,
      Seq((30L, 3L, -1L)).toDF("ck", "nk", "__delta"), 5L)
    val want = Set(
      (1L, 10L, 1L, Some("de"): Option[String], 1L),
      (2L, 20L, 2L, None: Option[String], 1L))
    assert(cur() == want)
    // replay + compaction invariance
    JoinTreeIvm.appendLeaf(st, 2, nat(2L -> "fr"), 3L)
    assert(cur() == want)
    JoinTreeIvm.compact(st)
    assert(cur() == want)
    // post-compaction: the dimension returns, the null row retracts again
    JoinTreeIvm.appendLeaf(st, 2, nat(2L -> "fr2"), 6L)
    assert(cur() == Set(
      (1L, 10L, 1L, Some("de"), 1L),
      (2L, 20L, 2L, Some("fr2"), 1L)))
  }

  test("maintained extrema over the full join: deletes move min/median exactly") {
    import graft.ops.MinMaxAgg
    val st = JoinTreeIvm.stores(spark, tmpDir("jtreeX"),
      Seq(Seq("ck"), Seq("nk")), buckets = 4,
      extremaSpec = Some(MinMaxAgg.Spec(Seq("name"), "v")))
    JoinTreeIvm.appendLeaf(st, 1, cust(10L -> 1L, 20L -> 1L), 0L)
    JoinTreeIvm.appendLeaf(st, 2, nat(1L -> "de"), 1L)
    JoinTreeIvm.appendLeaf(st, 0,
      fact((1L, 10L, 100L), (2L, 10L, 50L), (3L, 20L, 200L)), 2L)
    def mm() = JoinTreeIvm.currentExtrema(st)
      .select($"name", $"min_v", $"max_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(mm() == Set(("de", 50L, 200L)))
    // delete the fact holding the min: the runner-up must surface
    JoinTreeIvm.appendLeafDelta(st, 0,
      Seq((2L, 10L, 50L, -1L)).toDF("ok", "ck", "v", "__delta"), 3L)
    assert(mm() == Set(("de", 100L, 200L)))
    val q = JoinTreeIvm.quantiles(st, Seq(0.5)).collect()
      .map(r => (r.getString(0), r.getLong(r.fieldIndex(
        MinMaxAgg.quantileLabel(0.5))))).toSet
    assert(q == Set(("de", 100L)))
    JoinTreeIvm.compact(st)
    assert(mm() == Set(("de", 100L, 200L)))
  }

  test("outer-last trees refuse binary shapes") {
    intercept[IllegalArgumentException] {
      JoinTreeIvm.stores(spark, tmpDir("jtreeOb"), Seq(Seq("ck")),
        outerLast = true)
    }
  }

  test("outer-last tree with a chained aggregate: null flips reach the agg") {
    // the round-10 restriction lifted: the downstream consumes the
    // OUTER Δ through the signed outer append's tap, so a late dim's
    // unmatched→matched flip moves rows from the NULL group to the
    // named one inside the maintained aggregate — and a dim delete
    // moves them back
    val st = JoinTreeIvm.stores(spark, tmpDir("jtreeAggO"),
      Seq(Seq("ck"), Seq("nk")), buckets = 4, outerLast = true,
      aggSpec = Some(IncrementalAgg.Spec(Seq("name"), Seq("v"))))
    var f = fact(); var c = cust(); var n = nat()
    def aggSet() = JoinTreeIvm.currentAgg(st)
      .select(coalesce($"name", lit("~")).as("g"), $"n_rows", $"sum_v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    def oneShotAgg() = f.join(c, Seq("ck"))
      .join(n, Seq("nk"), "left")
      .groupBy(coalesce($"name", lit("~")).as("g"))
      .agg(count(lit(1)).as("n_rows"), sum($"v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    def check(): Unit = assert(aggSet() == oneShotAgg(),
      s"maintained agg diverged:\n${aggSet()}\nvs\n${oneShotAgg()}")
    // outer dim seeded FIRST (the agg tap needs its schema)
    JoinTreeIvm.appendLeaf(st, 2, nat(10L -> "n10"), 0L)
    n = nat(10L -> "n10")
    JoinTreeIvm.appendLeaf(st, 1, cust(1L -> 10L, 2L -> 20L), 1L)
    c = cust(1L -> 10L, 2L -> 20L)
    JoinTreeIvm.appendLeaf(st, 0,
      fact((1L, 1L, 5L), (2L, 2L, 7L), (3L, 2L, 9L)), 2L)
    f = fact((1L, 1L, 5L), (2L, 2L, 7L), (3L, 2L, 9L))
    check() // facts 2,3 in the NULL group
    // late dim: the null group shrinks, n20 appears — THROUGH the agg
    JoinTreeIvm.appendLeaf(st, 2, nat(20L -> "n20"), 3L)
    n = nat(10L -> "n10", 20L -> "n20"); check()
    // dim delete flips them back to the null group
    JoinTreeIvm.appendLeafDelta(st, 2,
      Seq((20L, "n20", -1L)).toDF("nk", "name", "__delta"), 4L)
    n = nat(10L -> "n10"); check()
    // fact takedown retracts from whichever group holds the row
    JoinTreeIvm.appendLeafDelta(st, 0,
      Seq((1L, 1L, 5L, -1L)).toDF("ok", "ck", "v", "__delta"), 5L)
    f = fact((2L, 2L, 7L), (3L, 2L, 9L)); check()
    // committed replay no-ops; compaction result-invariant
    JoinTreeIvm.appendLeaf(st, 2, nat(20L -> "n20"), 3L)
    check()
    JoinTreeIvm.compact(st)
    check()
  }

  test("MID-tree outer level: prefix-keyed null-extension flips cascade exactly") {
    // fact(ok, sk, pk, v) ⟕ sup(sk, sn) ⟕ prt(pk, pn): both join keys
    // derive from the fact leaf, so a null-extended group keeps its
    // downstream probe key — the case mid-tree outer exists for
    val st = JoinTreeIvm.stores(spark, tmpDir("mjtree"),
      Seq(Seq("sk"), Seq("pk")), buckets = 4,
      outerLevels = Seq(0), outerLast = true)
    def facts(rows: (Long, Long, Long, Long)*) =
      rows.toDF("ok", "sk", "pk", "v")
    def sups(rows: (Long, String)*) = rows.toDF("sk", "sn")
    def prts(rows: (Long, String)*) = rows.toDF("pk", "pn")
    var f = facts(); var su = sups(); var pr = prts()
    def cur() = JoinTreeIvm.current(st)
      .select($"ok", $"sk", $"pk", $"v", $"sn", $"pn", $"n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5)), r.getLong(6)))
      .toSet
    def oneShot() = f.join(su, Seq("sk"), "left")
      .join(pr, Seq("pk"), "left")
      .groupBy($"ok", $"sk", $"pk", $"v", $"sn", $"pn")
      .agg(count(lit(1)).as("n"))
      .select($"ok", $"sk", $"pk", $"v", $"sn", $"pn", $"n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5)), r.getLong(6)))
      .toSet
    def check(): Unit = assert(cur() == oneShot(),
      s"tree diverged from one-shot chained LEFT JOIN:\n${cur()}\nvs\n${oneShot()}")

    JoinTreeIvm.appendLeaf(st, 1, sups(1L -> "s1"), 0L)
    su = sups(1L -> "s1")
    JoinTreeIvm.appendLeaf(st, 2, prts(10L -> "p10"), 1L)
    pr = prts(10L -> "p10")
    JoinTreeIvm.appendLeaf(st, 0,
      facts((1L, 1L, 10L, 5L), (2L, 2L, 20L, 6L), (3L, 1L, 20L, 7L)), 2L)
    f = facts((1L, 1L, 10L, 5L), (2L, 2L, 20L, 6L), (3L, 1L, 20L, 7L))
    check() // fact 2 null on BOTH levels; fact 3 matched-sup, null-prt
    // late sup: fact 2 flips matched at level 0 — the flip CASCADES
    JoinTreeIvm.appendLeaf(st, 1, sups(2L -> "s2"), 3L)
    su = sups(1L -> "s1", 2L -> "s2"); check()
    // late prt: facts 2 and 3 flip at the outer-last level
    JoinTreeIvm.appendLeaf(st, 2, prts(20L -> "p20"), 4L)
    pr = prts(10L -> "p10", 20L -> "p20"); check()
    // sup DELETE: facts 1 and 3 flip BACK to null sn — fact 3 keeps its
    // matched pn (a null-extended group keeps probing: prefix-keyed)
    JoinTreeIvm.appendLeafDelta(st, 1,
      Seq((1L, "s1", -1L)).toDF("sk", "sn", "__delta"), 5L)
    su = sups(2L -> "s2"); check()
    // prt DELETE: fact 1 now null-extended on both levels
    JoinTreeIvm.appendLeafDelta(st, 2,
      Seq((10L, "p10", -1L)).toDF("pk", "pn", "__delta"), 6L)
    pr = prts(20L -> "p20"); check()
    // fact takedown retracts a fully-matched row through both levels
    JoinTreeIvm.appendLeafDelta(st, 0,
      Seq((2L, 2L, 20L, 6L, -1L)).toDF("ok", "sk", "pk", "v", "__delta"),
      7L)
    f = facts((1L, 1L, 10L, 5L), (3L, 1L, 20L, 7L)); check()
    // committed replay no-ops; compaction is result-invariant
    JoinTreeIvm.appendLeaf(st, 2, prts(20L -> "p20"), 4L)
    check()
    JoinTreeIvm.compact(st)
    check()
  }

  test("mid-tree outer refuses non-prefix-keyed trees and unseeded dims") {
    // keys(1) = nk comes from the OUTER level's dim (cust) — a
    // null-extended group would lose its downstream probe key
    val st = JoinTreeIvm.stores(spark, tmpDir("badtree"),
      Seq(Seq("ck"), Seq("nk")), buckets = 4, outerLevels = Seq(0))
    JoinTreeIvm.appendLeaf(st, 1, cust(1L -> 10L), 0L)
    val e = intercept[IllegalArgumentException] {
      JoinTreeIvm.appendLeaf(st, 0, fact((1L, 1L, 5L)), 1L)
    }
    assert(e.getMessage.contains("not prefix-keyed"), e.getMessage)
    // prefix rows may not flow through a mid outer level before its dim
    // schema exists
    val st2 = JoinTreeIvm.stores(spark, tmpDir("unseeded"),
      Seq(Seq("sk"), Seq("pk")), buckets = 4,
      outerLevels = Seq(0), outerLast = true)
    val e2 = intercept[IllegalArgumentException] {
      JoinTreeIvm.appendLeaf(st2, 0,
        Seq((1L, 1L, 10L, 5L)).toDF("ok", "sk", "pk", "v"), 0L)
    }
    assert(e2.getMessage.contains("dim leaf loaded"), e2.getMessage)
  }

  test("batch-id disambiguation: same logical id on two leaves does not collide") {
    val st = tree()
    // leaf 1 and leaf 2 batches BOTH carry logical id 0: leaf 2's entry
    // is level 1's right side, leaf 1's cascade lands on level 1's left
    // side — the leaves-scaled dsId keeps their manifests distinct
    JoinTreeIvm.appendLeaf(st, 0, fact((1L, 10L, 100L)), 0L)
    JoinTreeIvm.appendLeaf(st, 1, cust(10L -> 1L), 0L)
    JoinTreeIvm.appendLeaf(st, 2, nat(1L -> "de"), 0L)
    assert(treeSet(st) == Set((1L, 10L, 1L, "de", 1L)))
  }
}
