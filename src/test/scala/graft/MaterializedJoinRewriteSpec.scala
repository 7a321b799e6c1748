package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{IncrementalJoin, IncrementalOuterJoin}
import graft.plans.MaterializedJoinRewrite

/** The join-MV rewrite must (a) answer registered aggregate-over-join
  * queries from the maintained join state with identical results, (b)
  * actually stop scanning the raw tables, (c) honor the staleness
  * guard, and (d) leave every non-matching shape untouched. */
class MaterializedJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  /** Two raw tables on disk + a maintained join over ALL their rows.
    * k ∈ 0..19; left has dup rows (multiplicity 2 for k%5==0), right is
    * sparse (k%3!=0 only) so the inner join drops keys. */
  private def fixture(): (String, String, IncrementalJoin.Stores) = {
    val aDir = tmpDir("jmv-a")
    val bDir = tmpDir("jmv-b")
    val left = (0L until 20L).flatMap { k =>
      val base = Seq((k, s"g${k % 4}", k * 10 + 1))
      if (k % 5 == 0) base ++ base else base
    }.toDF("k", "grp", "lv")
    val right = (0L until 20L).filter(_ % 3 != 0)
      .map(k => (k, k.toDouble / 2.0)).toDF("k", "rv")
    left.write.mode("overwrite").parquet(aDir)
    right.write.mode("overwrite").parquet(bDir)
    val st = IncrementalJoin.stores(spark, tmpDir("jmv-st"))
    val a = spark.read.parquet(aDir)
    val b = spark.read.parquet(bDir)
    IncrementalJoin.appendLeft(st, a.filter($"k" < 10), Seq("k"), 0L)
    IncrementalJoin.appendRight(st, b, Seq("k"), 10L)
    IncrementalJoin.appendLeft(st, a.filter($"k" >= 10), Seq("k"), 1L)
    (aDir, bDir, st)
  }

  private def registered[T](aDir: String, bDir: String,
                            st: IncrementalJoin.Stores,
                            fresh: () => Boolean = () => true)(f: => T): T = {
    MaterializedJoinRewrite.register(aDir, bDir, MaterializedJoinRewrite.JoinMv(
      Seq("k"), org.apache.spark.sql.catalyst.plans.Inner,
      () => IncrementalJoin.current(st), fresh))
    try f finally MaterializedJoinRewrite.clear()
  }

  private def rows(df: DataFrame) =
    df.collect().map(_.toSeq.toList).toSet

  /** Root paths of every parquet scan left in the optimized plan. */
  private def scanPaths(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath).toSeq
          case _ => Seq.empty[String]
        }
    }.flatten.toSet

  private def scansRaw(df: DataFrame, dir: String): Boolean =
    scanPaths(df).exists(_.startsWith(dir))

  test("aggregate over the registered join answers from state, same result") {
    val (aDir, bDir, st) = fixture()
    def query() = spark.read.parquet(aDir)
      .join(spark.read.parquet(bDir), Seq("k"))
      .groupBy($"grp")
      .agg(count(lit(1)).as("n_rows"), sum($"lv").as("sum_lv"),
        min($"rv").as("min_rv"), max($"lv").as("max_lv"),
        countDistinct($"k").as("n_keys"))
      .orderBy($"grp")
    val want = rows(query())
    registered(aDir, bDir, st) {
      val df = query()
      // the raw scans are GONE: the plan reads the state store instead
      assert(!scansRaw(df, aDir) && !scansRaw(df, bDir),
        s"raw scan survived: ${scanPaths(df)}")
      assert(rows(df) == want)
    }
  }

  test("count(c), avg(c) re-weight by multiplicity exactly") {
    val (aDir, bDir, st) = fixture()
    def query() = spark.read.parquet(aDir)
      .join(spark.read.parquet(bDir), Seq("k"))
      .groupBy($"grp")
      .agg(count($"rv").as("n_rv"), avg($"lv").as("avg_lv"))
      .orderBy($"grp")
    val want = rows(query())
    registered(aDir, bDir, st) { assert(rows(query()) == want) }
  }

  test("filters over the join (above or pushed below) re-apply over state") {
    val (aDir, bDir, st) = fixture()
    def query() = spark.read.parquet(aDir)
      .join(spark.read.parquet(bDir), Seq("k"))
      .filter($"lv" > 40 && $"rv" < 9.0) // non-key columns — pushed below
      .groupBy($"grp")
      .agg(sum($"lv").as("sum_lv"), count(lit(1)).as("n"))
      .orderBy($"grp")
    val want = rows(query())
    registered(aDir, bDir, st) {
      val df = query()
      assert(!scansRaw(df, aDir))
      assert(rows(df) == want)
    }
  }

  test("flipped scan order still hits (inner join is symmetric)") {
    val (aDir, bDir, st) = fixture()
    def query() = spark.read.parquet(bDir)
      .join(spark.read.parquet(aDir), Seq("k"))
      .groupBy($"grp").agg(sum($"lv").as("s"))
      .orderBy($"grp")
    val want = rows(query())
    registered(aDir, bDir, st) {
      val df = query()
      assert(!scansRaw(df, aDir))
      assert(rows(df) == want)
    }
  }

  test("staleness guard: fresh=false declines, raw plan runs, result intact") {
    val (aDir, bDir, st) = fixture()
    def query() = spark.read.parquet(aDir)
      .join(spark.read.parquet(bDir), Seq("k"))
      .groupBy($"grp").agg(sum($"lv").as("s")).orderBy($"grp")
    val want = rows(query())
    registered(aDir, bDir, st, fresh = () => false) {
      val df = query()
      assert(scansRaw(df, aDir), "stale registration must NOT serve")
      assert(rows(df) == want)
    }
  }

  test("non-matching shapes stay untouched") {
    val (aDir, bDir, st) = fixture()
    registered(aDir, bDir, st) {
      // different join keys
      val wrongKeys = spark.read.parquet(aDir)
        .join(spark.read.parquet(bDir).withColumnRenamed("k", "k2"),
          $"k" === $"k2")
        .groupBy($"grp").agg(sum($"lv").as("s"))
      assert(scansRaw(wrongKeys, aDir))
      // unregistered pair
      val cDir = tmpDir("jmv-c")
      (0L until 5L).map(k => (k, k)).toDF("k", "cv")
        .write.mode("overwrite").parquet(cDir)
      val wrongPair = spark.read.parquet(aDir)
        .join(spark.read.parquet(cDir), Seq("k"))
        .groupBy($"grp").agg(sum($"lv").as("s"))
      assert(scansRaw(wrongPair, aDir))
      // percentile over the join: not servable, untouched
      val pct = spark.read.parquet(aDir)
        .join(spark.read.parquet(bDir), Seq("k"))
        .groupBy($"grp").agg(expr("percentile_approx(lv, 0.5)").as("p"))
      assert(scansRaw(pct, aDir))
      // left-outer query over an Inner registration: untouched
      val lo = spark.read.parquet(aDir)
        .join(spark.read.parquet(bDir), Seq("k"), "left")
        .groupBy($"grp").agg(sum($"lv").as("s"))
      assert(scansRaw(lo, aDir))
    }
  }

  test("LEFT OUTER registration serves left joins; right-side filters bail") {
    val aDir = tmpDir("jmv-a")
    val bDir = tmpDir("jmv-b")
    val left = (0L until 12L).map(k => (k, s"g${k % 3}", k + 100L))
      .toDF("k", "grp", "lv")
    val right = (0L until 12L).filter(_ % 4 == 0)
      .map(k => (k, k * 2.0)).toDF("k", "rv")
    left.write.mode("overwrite").parquet(aDir)
    right.write.mode("overwrite").parquet(bDir)
    val st = IncrementalOuterJoin.stores(spark, tmpDir("jmv-ost"))
    IncrementalOuterJoin.appendLeft(st, spark.read.parquet(aDir), Seq("k"), 0L)
    IncrementalOuterJoin.appendRight(st, spark.read.parquet(bDir), Seq("k"), 10L)
    MaterializedJoinRewrite.register(aDir, bDir, MaterializedJoinRewrite.JoinMv(
      Seq("k"), org.apache.spark.sql.catalyst.plans.LeftOuter,
      () => IncrementalOuterJoin.current(st)))
    try {
      def query() = spark.read.parquet(aDir)
        .join(spark.read.parquet(bDir), Seq("k"), "left")
        .groupBy($"grp")
        .agg(count(lit(1)).as("n"), count($"rv").as("n_matched"),
          sum($"lv").as("sum_lv"))
        .orderBy($"grp")
      val want = rows(query())
      val df = query()
      assert(!scansRaw(df, aDir))
      assert(rows(df) == want)
      // left-side filter commutes (preserved side) — still hits
      def filtered() = spark.read.parquet(aDir).filter($"lv" > 103)
        .join(spark.read.parquet(bDir), Seq("k"), "left")
        .groupBy($"grp").agg(count(lit(1)).as("n")).orderBy($"grp")
      val wantF = rows(filtered())
      val dfF = filtered()
      assert(!scansRaw(dfF, aDir))
      assert(rows(dfF) == wantF)
      // right-side filter does NOT commute with a left outer join — bail
      val bad = spark.read.parquet(aDir)
        .join(spark.read.parquet(bDir).filter($"rv" > 4.0), Seq("k"), "left")
        .groupBy($"grp").agg(count(lit(1)).as("n"))
      assert(scansRaw(bad, aDir))

      // OUTER KEY AMBIGUITY: a non-USING left join exposes BOTH k
      // columns; B.k is NULL on unmatched rows while the state's single
      // key never is — byName resolution would silently group by the
      // wrong column. Must DECLINE, and the raw answer keeps the NULL
      // group the state could never produce.
      val a = spark.read.parquet(aDir)
      val b = spark.read.parquet(bDir)
      val byRightKey = a.join(b, a("k") === b("k"), "left")
        .groupBy(b("k")).agg(count(lit(1)).as("n"))
      assert(scansRaw(byRightKey, aDir),
        "grouping on the null-producing side's key must decline the rewrite")
      assert(byRightKey.collect().exists(_.isNullAt(0)),
        "raw evaluation must retain the unmatched NULL key group")
      // ...while grouping on the PRESERVED side's key still serves
      val byLeftKey = a.join(b, a("k") === b("k"), "left")
        .groupBy(a("k")).agg(count(lit(1)).as("n"))
      assert(!scansRaw(byLeftKey, aDir))
    } finally MaterializedJoinRewrite.clear()
  }

  test("aggServe hierarchy: partials for count/sum, join state for the rest") {
    import graft.ops.{ChainedIvm, IncrementalAgg}
    val (aDir, bDir, _) = fixture()
    val a = spark.read.parquet(aDir)
    val b = spark.read.parquet(bDir)
    val root = tmpDir("jmv-chain")
    val chain = ChainedIvm.stores(spark, root, Seq("k"),
      IncrementalAgg.Spec(Seq("grp"), Seq("lv")))
    ChainedIvm.appendLeft(chain, a, 0L)
    ChainedIvm.appendRight(chain, b, 10L)
    MaterializedJoinRewrite.register(aDir, bDir, MaterializedJoinRewrite.JoinMv(
      Seq("k"), org.apache.spark.sql.catalyst.plans.Inner,
      () => ChainedIvm.currentJoin(chain),
      aggServe = Seq(graft.plans.MaterializedAggRewrite.MvDef(
        Seq("grp"), Seq("lv"), () => ChainedIvm.currentAgg(chain)))))
    try {
      def q1() = a.join(b, Seq("k")).groupBy($"grp")
        .agg(count(lit(1)).as("n"), sum($"lv").as("s"),
          avg($"lv").as("m"))
      // count/sum/avg on the chain keys: served from the AGG partials
      val df1 = q1()
      val p1 = scanPaths(df1)
      assert(p1.nonEmpty && p1.forall(_.startsWith(s"$root/agg")),
        s"expected agg-partials serve, scanned $p1")
      MaterializedJoinRewrite.clear()
      val want1 = rows(q1()) // raw truth, registration removed
      MaterializedJoinRewrite.register(aDir, bDir, MaterializedJoinRewrite.JoinMv(
        Seq("k"), org.apache.spark.sql.catalyst.plans.Inner,
        () => ChainedIvm.currentJoin(chain),
        aggServe = Seq(graft.plans.MaterializedAggRewrite.MvDef(
          Seq("grp"), Seq("lv"), () => ChainedIvm.currentAgg(chain)))))
      assert(rows(q1()) == want1)
      // min is not in the chain's maintained state → join-state path
      val dfMin = a.join(b, Seq("k")).groupBy($"grp")
        .agg(min($"lv").as("mn"))
      val pMin = scanPaths(dfMin)
      assert(pMin.forall(_.startsWith(s"$root/join")) &&
        !pMin.exists(_.startsWith(aDir)), s"min must use join state: $pMin")
      // a NON-KEY predicate does not commute with the agg → join state
      val dfPred = a.join(b, Seq("k")).filter($"lv" > 50)
        .groupBy($"grp").agg(count(lit(1)).as("n"))
      val pPred = scanPaths(dfPred)
      assert(pPred.forall(_.startsWith(s"$root/join")) &&
        !pPred.exists(_.startsWith(aDir)),
        s"non-key predicate must use join state: $pPred")
      // a KEY-only predicate commutes → still the agg partials
      val dfKeyPred = a.join(b, Seq("k")).filter($"grp" =!= "g1")
        .groupBy($"grp").agg(count(lit(1)).as("n"))
      val pKeyPred = scanPaths(dfKeyPred)
      assert(pKeyPred.nonEmpty && pKeyPred.forall(_.startsWith(s"$root/agg")),
        s"key-only predicate should stay on partials: $pKeyPred")
      // grouping finer than the chain keys → join-state path
      val dfFine = a.join(b, Seq("k")).groupBy($"grp", $"rv")
        .agg(count(lit(1)).as("n"))
      val pFine = scanPaths(dfFine)
      assert(pFine.forall(_.startsWith(s"$root/join")) &&
        !pFine.exists(_.startsWith(aDir)),
        s"finer grouping must use join state: $pFine")
    } finally MaterializedJoinRewrite.clear()
  }

  test("extrema serve level: min/max/percentile_disc from the multiset, exact under deletes") {
    import graft.ops.{ChainedIvm, IncrementalAgg, MinMaxAgg}
    val (aDir, bDir, _) = fixture()
    val a = spark.read.parquet(aDir)
    val b = spark.read.parquet(bDir)
    val root = tmpDir("jmv-ext")
    val chain = ChainedIvm.stores(spark, root, Seq("k"),
      IncrementalAgg.Spec(Seq("grp"), Seq("lv")),
      extremaSpec = Some(MinMaxAgg.Spec(Seq("grp"), "lv")))
    // build to the fixture's NET content through a delete wave: append
    // everything plus doomed extra rows, then retract the extras — the
    // served extrema must surface the runner-up exactly
    val doomed = Seq((3L, "g3", 999L), (4L, "g0", -5L)).toDF("k", "grp", "lv")
    ChainedIvm.appendLeftDelta(chain,
      a.withColumn("__delta", lit(1L))
        .unionByName(doomed.withColumn("__delta", lit(1L))), 0L)
    ChainedIvm.appendRightDelta(chain, b.withColumn("__delta", lit(1L)), 10L)
    ChainedIvm.appendLeftDelta(chain,
      doomed.withColumn("__delta", lit(-1L)), 1L)
    ChainedIvm.compact(chain)
    def register(): Unit =
      MaterializedJoinRewrite.register(aDir, bDir,
        MaterializedJoinRewrite.JoinMv(
          Seq("k"), org.apache.spark.sql.catalyst.plans.Inner,
          () => ChainedIvm.currentJoin(chain),
          aggServe = Seq(
            graft.plans.MaterializedAggRewrite.MvDef(
              Seq("grp"), Seq("lv"), () => ChainedIvm.currentAgg(chain)),
            ChainedIvm.extremaServe(chain))))
    register()
    try {
      def q() = a.join(b, Seq("k")).groupBy($"grp")
        .agg(min($"lv").as("mn"), max($"lv").as("mx"),
          expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lv)")
            .as("p50"),
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY lv)")
            .as("p25"))
      val df = q()
      val p = scanPaths(df)
      assert(p.nonEmpty && p.forall(_.startsWith(s"$root/extrema")),
        s"expected extrema-multiset serve, scanned $p")
      MaterializedJoinRewrite.clear()
      val want = rows(q()) // raw truth, registration removed
      register()
      assert(rows(q()) == want)
      // count(*) must DECLINE the extrema level (it counts values, not
      // rows) — count+sum land on the agg partials as before
      val dfC = a.join(b, Seq("k")).groupBy($"grp")
        .agg(count(lit(1)).as("n"), sum($"lv").as("s"))
      val pC = scanPaths(dfC)
      assert(pC.nonEmpty && pC.forall(_.startsWith(s"$root/agg")),
        s"count/sum must stay on agg partials: $pC")
      // MIXED count + min: no single level answers it → join state
      val dfMix = a.join(b, Seq("k")).groupBy($"grp")
        .agg(count(lit(1)).as("n"), min($"lv").as("mn"))
      val pMix = scanPaths(dfMix)
      assert(pMix.forall(_.startsWith(s"$root/join")) &&
        !pMix.exists(_.startsWith(aDir)),
        s"mixed count+min must use join state: $pMix")
      // a KEY-only predicate commutes with the extrema level too
      val dfPred = a.join(b, Seq("k")).filter($"grp" =!= "g1")
        .groupBy($"grp").agg(min($"lv").as("mn"))
      val pPred = scanPaths(dfPred)
      assert(pPred.nonEmpty && pPred.forall(_.startsWith(s"$root/extrema")),
        s"key-only predicate should stay on extrema: $pPred")
    } finally MaterializedJoinRewrite.clear()
  }

  // ------------------------------------------------- n-ary tree serve

  /** Three raw tables + a maintained 3-leaf tree over all their rows:
    * fact(k, grp, v) ⋈ dimA(k, m) ⋈ dimB(m, tag), with a downstream
    * aggregate keyed on tag. */
  private def treeFixture(): (String, String, String, String,
      graft.ops.JoinTreeIvm.Stores) = {
    import graft.ops.{IncrementalAgg, JoinTreeIvm}
    val fDir = tmpDir("tmv-f"); val aDir = tmpDir("tmv-a")
    val bDir = tmpDir("tmv-b")
    val fact = (0L until 30L).flatMap { k =>
      val base = Seq((k, s"g${k % 4}", k * 10 + 1))
      if (k % 5 == 0) base ++ base else base // dup rows: multiplicity 2
    }.toDF("k", "grp", "v")
    val dimA = (0L until 30L).filter(_ % 3 != 0)
      .map(k => (k, k % 6)).toDF("k", "m")
    val dimB = (0L until 6L).map(m => (m, s"t${m % 2}")).toDF("m", "tag")
    fact.write.mode("overwrite").parquet(fDir)
    dimA.write.mode("overwrite").parquet(aDir)
    dimB.write.mode("overwrite").parquet(bDir)
    val root = tmpDir("tmv-tree")
    val st = JoinTreeIvm.stores(spark, root, Seq(Seq("k"), Seq("m")),
      buckets = 4,
      aggSpec = Some(IncrementalAgg.Spec(Seq("tag"), Seq("v"))))
    JoinTreeIvm.appendLeaf(st, 1, spark.read.parquet(aDir), 0L)
    JoinTreeIvm.appendLeaf(st, 2, spark.read.parquet(bDir), 1L)
    JoinTreeIvm.appendLeaf(st, 0, spark.read.parquet(fDir), 2L)
    (fDir, aDir, bDir, root, st)
  }

  private def treeRegistered[T](paths: Seq[String],
                                st: graft.ops.JoinTreeIvm.Stores,
                                fresh: () => Boolean = () => true)
                               (f: => T): T = {
    MaterializedJoinRewrite.registerTree(paths,
      MaterializedJoinRewrite.TreeMv(Seq(Seq("k"), Seq("m")),
        () => graft.ops.JoinTreeIvm.current(st), fresh,
        aggServe = Seq(graft.plans.MaterializedAggRewrite.MvDef(
          Seq("tag"), Seq("v"),
          () => graft.ops.JoinTreeIvm.currentAgg(st)))))
    try f finally MaterializedJoinRewrite.clear()
  }

  test("3-way aggregate answers from tree state, same result, no raw scans") {
    val (fDir, aDir, bDir, root, st) = treeFixture()
    val raw = spark.read.parquet(fDir)
      .join(spark.read.parquet(aDir), Seq("k"))
      .join(spark.read.parquet(bDir), Seq("m"))
      .groupBy($"grp")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"),
        countDistinct($"k").as("dk"))
    val want = rows(raw)
    treeRegistered(Seq(fDir, aDir, bDir), st) {
      val got = spark.read.parquet(fDir)
        .join(spark.read.parquet(aDir), Seq("k"))
        .join(spark.read.parquet(bDir), Seq("m"))
        .groupBy($"grp")
        .agg(count(lit(1)).as("n"), sum($"v").as("s"),
          countDistinct($"k").as("dk"))
      val ps = scanPaths(got)
      assert(ps.nonEmpty && ps.forall(_.startsWith(root)),
        s"3-way aggregate must scan tree state only: $ps")
      assert(rows(got) == want)
    }
  }

  test("tree agg partials serve matching groupings; others fall to the multiset") {
    val (fDir, aDir, bDir, root, st) = treeFixture()
    treeRegistered(Seq(fDir, aDir, bDir), st) {
      def threeWay = spark.read.parquet(fDir)
        .join(spark.read.parquet(aDir), Seq("k"))
        .join(spark.read.parquet(bDir), Seq("m"))
      val byTag = threeWay.groupBy($"tag")
        .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      val p1 = scanPaths(byTag)
      assert(p1.nonEmpty && p1.forall(_.startsWith(s"$root/agg")),
        s"count/sum GROUP BY tag must serve from agg partials: $p1")
      val byGrp = threeWay.groupBy($"grp").agg(count(lit(1)).as("n"))
      val p2 = scanPaths(byGrp)
      assert(p2.nonEmpty && p2.forall(_.startsWith(root)) &&
        !p2.exists(_.startsWith(s"$root/agg")),
        s"a finer grouping must fall back to the tree multiset: $p2")
      // result parity for both paths against a fresh unregistered run
      val gotTag = rows(byTag); val gotGrp = rows(byGrp)
      MaterializedJoinRewrite.clear()
      assert(gotTag == rows(threeWay.groupBy($"tag")
        .agg(count(lit(1)).as("n"), sum($"v").as("s"))))
      assert(gotGrp == rows(threeWay.groupBy($"grp")
        .agg(count(lit(1)).as("n"))))
    }
  }

  test("tree declines: wrong leaf order, outer level, partial prefix, staleness") {
    val (fDir, aDir, bDir, _, st) = treeFixture()
    treeRegistered(Seq(fDir, aDir, bDir), st) {
      // leaf order is the registration: dimA ⋈ fact ⋈ dimB stays raw
      val reordered = spark.read.parquet(aDir)
        .join(spark.read.parquet(fDir), Seq("k"))
        .join(spark.read.parquet(bDir), Seq("m"))
        .groupBy($"tag").agg(count(lit(1)).as("n"))
      assert(scansRaw(reordered, fDir),
        "a different join order must not match the tree registration")
      // an OUTER level declines (tree registrations are inner-only)
      val outer = spark.read.parquet(fDir)
        .join(spark.read.parquet(aDir), Seq("k"))
        .join(spark.read.parquet(bDir), Seq("m"), "left_outer")
        .groupBy($"grp").agg(count(lit(1)).as("n"))
      assert(scansRaw(outer, fDir),
        "an outer level must not match an inner tree registration")
      // the 2-leaf PREFIX alone is not the registered tree
      val prefix = spark.read.parquet(fDir)
        .join(spark.read.parquet(aDir), Seq("k"))
        .groupBy($"grp").agg(count(lit(1)).as("n"))
      assert(scansRaw(prefix, fDir),
        "the bare prefix join must not match the 3-leaf registration")
    }
    treeRegistered(Seq(fDir, aDir, bDir), st, fresh = () => false) {
      val stale = spark.read.parquet(fDir)
        .join(spark.read.parquet(aDir), Seq("k"))
        .join(spark.read.parquet(bDir), Seq("m"))
        .groupBy($"tag").agg(count(lit(1)).as("n"))
      assert(scansRaw(stale, fDir),
        "fresh=false must decline and leave the raw plan")
    }
  }

  test("registerServe: every join PREFIX of the tree serves from its level") {
    import graft.ops.JoinTreeIvm
    val (fDir, aDir, bDir, root, st) = treeFixture()
    def prefix2 = spark.read.parquet(fDir)
      .join(spark.read.parquet(aDir), Seq("k"))
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    def full = spark.read.parquet(fDir)
      .join(spark.read.parquet(aDir), Seq("k"))
      .join(spark.read.parquet(bDir), Seq("m"))
      .groupBy($"tag").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val want2 = rows(prefix2); val wantF = rows(full)
    JoinTreeIvm.registerServe(st, Seq(fDir, aDir, bDir))
    try {
      val p2 = scanPaths(prefix2)
      assert(p2.nonEmpty && p2.forall(_.startsWith(s"$root/j0")),
        s"the 2-leaf prefix must serve from level 0's multiset: $p2")
      assert(rows(prefix2) == want2)
      val pF = scanPaths(full)
      assert(pF.nonEmpty && pF.forall(_.startsWith(s"$root/agg")),
        s"the full tree's matching aggregate must serve from partials: $pF")
      assert(rows(full) == wantF)
    } finally JoinTreeIvm.deregisterServe(st, Seq(fDir, aDir, bDir))
    assert(scansRaw(prefix2, fDir) && scansRaw(full, fDir),
      "deregisterServe must restore the raw plans")
  }

  test("a planner side-swap inside a level still matches (flipped leaf)") {
    val (fDir, aDir, bDir, root, st) = treeFixture()
    // leaf on the LEFT of the last level: dimB ⋈ (fact ⋈ dimA) — the
    // same tree, sides swapped at the top; inner symmetry must serve
    def flipped = spark.read.parquet(bDir)
      .join(spark.read.parquet(fDir)
        .join(spark.read.parquet(aDir), Seq("k")), Seq("m"))
      .groupBy($"grp").agg(count(lit(1)).as("n"))
    val want = rows(flipped)
    treeRegistered(Seq(fDir, aDir, bDir), st) {
      val served = flipped
      val ps = scanPaths(served)
      assert(ps.nonEmpty && ps.forall(_.startsWith(root)),
        s"a flipped level must still match the tree registration: $ps")
      assert(rows(served) == want)
    }
  }

  test("tree extrema level: min/max/percentile over the 3-way join from the multiset") {
    import graft.ops.{JoinTreeIvm, MinMaxAgg}
    val fDir = tmpDir("tmx-f"); val aDir = tmpDir("tmx-a")
    val bDir = tmpDir("tmx-b")
    val fact = (0L until 30L).map(k => (k, s"g${k % 4}", k * 10 + 1))
      .toDF("k", "grp", "v")
    val dimA = (0L until 30L).map(k => (k, k % 6)).toDF("k", "m")
    val dimB = (0L until 6L).map(m => (m, s"t${m % 2}")).toDF("m", "tag")
    fact.write.mode("overwrite").parquet(fDir)
    dimA.write.mode("overwrite").parquet(aDir)
    dimB.write.mode("overwrite").parquet(bDir)
    val root = tmpDir("tmx-tree")
    val st = JoinTreeIvm.stores(spark, root, Seq(Seq("k"), Seq("m")),
      buckets = 4, extremaSpec = Some(MinMaxAgg.Spec(Seq("tag"), "v")))
    JoinTreeIvm.appendLeaf(st, 1, spark.read.parquet(aDir), 0L)
    JoinTreeIvm.appendLeaf(st, 2, spark.read.parquet(bDir), 1L)
    JoinTreeIvm.appendLeaf(st, 0, spark.read.parquet(fDir), 2L)
    def threeWay = spark.read.parquet(fDir)
      .join(spark.read.parquet(aDir), Seq("k"))
      .join(spark.read.parquet(bDir), Seq("m"))
    def extremaQ = threeWay.groupBy($"tag")
      .agg(min($"v").as("mn"), max($"v").as("mx"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)")
          .cast("long").as("p50"))
    val want = rows(extremaQ)
    JoinTreeIvm.registerServe(st, Seq(fDir, aDir, bDir))
    try {
      val ps = scanPaths(extremaQ)
      assert(ps.nonEmpty && ps.forall(_.startsWith(s"$root/extrema")),
        s"min/max/percentile_disc must serve from the tree extrema: $ps")
      assert(rows(extremaQ) == want)
    } finally JoinTreeIvm.deregisterServe(st, Seq(fDir, aDir, bDir))
  }

  test("tree filters (above or on any leaf) re-apply over state, results equal") {
    val (fDir, aDir, bDir, root, st) = treeFixture()
    def threeWay = spark.read.parquet(fDir)
      .join(spark.read.parquet(aDir), Seq("k"))
      .join(spark.read.parquet(bDir), Seq("m"))
    val wantAbove = rows(threeWay.filter($"tag" === "t1")
      .groupBy($"grp").agg(sum($"v").as("s")))
    val wantLeaf = rows(spark.read.parquet(fDir).filter($"v" > 50)
      .join(spark.read.parquet(aDir), Seq("k"))
      .join(spark.read.parquet(bDir), Seq("m"))
      .groupBy($"tag").agg(count(lit(1)).as("n")))
    treeRegistered(Seq(fDir, aDir, bDir), st) {
      val above = threeWay.filter($"tag" === "t1")
        .groupBy($"grp").agg(sum($"v").as("s"))
      assert(!scansRaw(above, fDir) && rows(above) == wantAbove)
      // a leaf-side predicate is collected and re-applied over state —
      // it references a non-key column, so the agg level declines and
      // the tree multiset serves
      val onLeaf = spark.read.parquet(fDir).filter($"v" > 50)
        .join(spark.read.parquet(aDir), Seq("k"))
        .join(spark.read.parquet(bDir), Seq("m"))
        .groupBy($"tag").agg(count(lit(1)).as("n"))
      val ps = scanPaths(onLeaf)
      assert(ps.nonEmpty && ps.forall(_.startsWith(root)) &&
        !ps.exists(_.startsWith(s"$root/agg")),
        s"leaf predicate must serve from the tree multiset: $ps")
      assert(rows(onLeaf) == wantLeaf)
    }
  }

  test("outer-last tree serves LEFT OUTER queries; inner/null-key/leaf-filter decline") {
    import graft.ops.{IncrementalAgg, JoinTreeIvm, MinMaxAgg}
    val fDir = tmpDir("omv-f"); val aDir = tmpDir("omv-a")
    val bDir = tmpDir("omv-b")
    val fact = (0L until 30L).map(k => (k, s"g${k % 4}", k * 10 + 1))
      .toDF("k", "grp", "v")
    val dimA = (0L until 30L).map(k => (k, k % 6)).toDF("k", "m")
    // sparse: odd m never matches — the null extension is real
    val dimB = (0L until 6L).filter(_ % 2 == 0)
      .map(m => (m, s"t$m")).toDF("m", "tag")
    fact.write.mode("overwrite").parquet(fDir)
    dimA.write.mode("overwrite").parquet(aDir)
    dimB.write.mode("overwrite").parquet(bDir)
    val root = tmpDir("omv-tree")
    val st = JoinTreeIvm.stores(spark, root, Seq(Seq("k"), Seq("m")),
      buckets = 4, outerLast = true,
      aggSpec = Some(IncrementalAgg.Spec(Seq("tag"), Seq("v"))),
      extremaSpec = Some(MinMaxAgg.Spec(Seq("tag"), "v")))
    JoinTreeIvm.appendLeaf(st, 2, spark.read.parquet(bDir), 0L)
    JoinTreeIvm.appendLeaf(st, 1, spark.read.parquet(aDir), 1L)
    JoinTreeIvm.appendLeaf(st, 0, spark.read.parquet(fDir), 2L)
    def outer3 = spark.read.parquet(fDir)
      .join(spark.read.parquet(aDir), Seq("k"))
      .join(spark.read.parquet(bDir), Seq("m"), "left")
    val wantTag = rows(outer3.groupBy($"tag")
      .agg(count(lit(1)).as("n"), sum($"v").as("s")))
    val wantGrp = rows(outer3.groupBy($"grp").agg(count(lit(1)).as("n")))
    JoinTreeIvm.registerServe(st, Seq(fDir, aDir, bDir))
    try {
      // agg partials serve the matching grouping (NULL tag group incl.)
      val byTag = outer3.groupBy($"tag")
        .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      val p1 = scanPaths(byTag)
      assert(p1.nonEmpty && p1.forall(_.startsWith(s"$root/agg")),
        s"outer tree count/sum by tag must fold agg partials: $p1")
      assert(rows(byTag) == wantTag)
      // a finer grouping falls back to the maintained OUTER multiset
      val byGrp = outer3.groupBy($"grp").agg(count(lit(1)).as("n"))
      val p2 = scanPaths(byGrp)
      assert(p2.nonEmpty && !p2.exists(_.startsWith(fDir)) &&
        !p2.exists(_.startsWith(bDir)),
        s"outer multiset must serve GROUP BY grp, never raw: $p2")
      assert(rows(byGrp) == wantGrp)
      // an INNER query must NOT be answered from outer state
      val inner3 = spark.read.parquet(fDir)
        .join(spark.read.parquet(aDir), Seq("k"))
        .join(spark.read.parquet(bDir), Seq("m"))
        .groupBy($"tag").agg(count(lit(1)).as("n"))
      assert(scansRaw(inner3, fDir),
        "an inner query must decline an outer-last registration")
      // grouping by the NULL side's key attr (non-USING join) declines
      val pre = spark.read.parquet(fDir)
        .join(spark.read.parquet(aDir), Seq("k"))
      val b = spark.read.parquet(bDir)
      val nonUsing = pre.join(b, pre("m") === b("m"), "left")
        .groupBy(b("m")).agg(count(lit(1)).as("n"))
      assert(scansRaw(nonUsing, fDir),
        "grouping by the null side's key must decline")
      // a filter under the null-side leaf declines (no legal pushdown)
      val leafFiltered = spark.read.parquet(fDir)
        .join(spark.read.parquet(aDir), Seq("k"))
        .join(spark.read.parquet(bDir).filter($"tag" =!= "t0"),
          Seq("m"), "left")
        .groupBy($"tag").agg(count(lit(1)).as("n"))
      assert(scansRaw(leafFiltered, fDir),
        "a null-side leaf filter must decline")
    } finally JoinTreeIvm.deregisterServe(st, Seq(fDir, aDir, bDir))
    assert(scansRaw(outer3.groupBy($"tag").agg(count(lit(1)).as("n")), fDir),
      "deregisterServe must restore the raw plan")
  }

  test("registerServe leaves an independent binary MV over the prefix pair intact") {
    import graft.ops.{IncrementalJoin, JoinTreeIvm}
    val (fDir, aDir, bDir, _, st) = treeFixture()
    // an INDEPENDENT binary MV someone registered over the same pair —
    // its own store, its own fresh() guard
    val binRoot = tmpDir("indep-bin")
    val bst = IncrementalJoin.stores(spark, binRoot)
    IncrementalJoin.appendLeft(bst, spark.read.parquet(fDir), Seq("k"), 0L)
    IncrementalJoin.appendRight(bst, spark.read.parquet(aDir), Seq("k"), 1L)
    def prefix2 = spark.read.parquet(fDir)
      .join(spark.read.parquet(aDir), Seq("k"))
      .groupBy($"grp").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    val want = rows(prefix2)
    MaterializedJoinRewrite.register(fDir, aDir,
      MaterializedJoinRewrite.JoinMv(Seq("k"),
        org.apache.spark.sql.catalyst.plans.Inner,
        () => IncrementalJoin.current(bst)))
    try {
      JoinTreeIvm.registerServe(st, Seq(fDir, aDir, bDir))
      // the pair still serves from the INDEPENDENT store — the tree's
      // courtesy prefix registration must not have clobbered it
      val ps = scanPaths(prefix2)
      assert(ps.nonEmpty && ps.forall(_.startsWith(binRoot)),
        s"the independent binary MV must keep serving the pair: $ps")
      assert(rows(prefix2) == want)
      // ...and deregisterServe removes only what registerServe put
      JoinTreeIvm.deregisterServe(st, Seq(fDir, aDir, bDir))
      val after = scanPaths(prefix2)
      assert(after.nonEmpty && after.forall(_.startsWith(binRoot)),
        s"deregisterServe must not remove the independent MV: $after")
      assert(rows(prefix2) == want)
    } finally MaterializedJoinRewrite.clear()
  }

  test("a state output with duplicate names declines the rewrite (raw plan, correct result)") {
    // `n` is the state multiset's multiplicity column. A maintained
    // store cannot even be BUILT over a value column named `n` (the
    // analyzer raises AMBIGUOUS_REFERENCE at append), but a
    // registration's current() thunk is arbitrary user code — if its
    // output carries duplicate names, byName resolution would silently
    // bind group-by/agg references to the wrong column. Must decline.
    val (aDir, bDir, st) = fixture()
    def query() = spark.read.parquet(aDir)
      .join(spark.read.parquet(bDir), Seq("k"))
      .groupBy($"grp").agg(count(lit(1)).as("cnt"))
      .orderBy($"grp")
    val want = rows(query())
    val dupe = () => {
      val cur = IncrementalJoin.current(st)
      cur.select(cur("k"), cur("grp"), cur("lv").as("n"), cur("n"))
    }
    MaterializedJoinRewrite.register(aDir, bDir,
      MaterializedJoinRewrite.JoinMv(Seq("k"),
        org.apache.spark.sql.catalyst.plans.Inner, dupe))
    try {
      val df = query()
      assert(scansRaw(df, aDir),
        "a duplicate `n` output name must decline the rewrite")
      assert(rows(df) == want)
    } finally MaterializedJoinRewrite.clear()
  }

  test("tree serve staleness: a post-registration leaf append is seen or declined, never served stale") {
    import graft.ops.JoinTreeIvm
    val (fDir, aDir, bDir, root, st) = treeFixture()
    @volatile var upToDate = true
    def full = spark.read.parquet(fDir)
      .join(spark.read.parquet(aDir), Seq("k"))
      .join(spark.read.parquet(bDir), Seq("m"))
      .groupBy($"tag").agg(count(lit(1)).as("n"), sum($"v").as("s"))
    JoinTreeIvm.registerServe(st, Seq(fDir, aDir, bDir),
      fresh = () => upToDate)
    try {
      val before = rows(full)
      // a raw-side fact append lands; the maintenance loop hasn't
      // applied it to the tree yet — the serve must DECLINE, not
      // answer from the old state
      val extra = Seq((7L, "g9", 7000L)).toDF("k", "grp", "v")
      extra.write.mode("append").parquet(fDir)
      upToDate = false
      val declined = full
      assert(scansRaw(declined, fDir),
        "a stale tree must decline and leave the raw plan")
      val rawNow = rows(declined)
      assert(rawNow != before,
        "fixture error: the appended row must change the aggregate")
      // maintenance applies the batch; the serve resumes and agrees
      JoinTreeIvm.appendLeaf(st, 0, extra, 3L)
      upToDate = true
      val served = full
      val ps = scanPaths(served)
      assert(ps.nonEmpty && ps.forall(_.startsWith(s"$root/agg")),
        s"the refreshed tree must serve from partials again: $ps")
      assert(rows(served) == rawNow,
        "the served result must include the appended batch")
    } finally JoinTreeIvm.deregisterServe(st, Seq(fDir, aDir, bDir))
  }

  test("setRef-pinned serving: two serve levels of one query answer from ONE committed ref") {
    // The tree's writer commits serve surfaces sequentially (levels →
    // agg → extrema), so a query whose plan reads TWO serve levels
    // (count/sum from agg partials + min/max from the extrema
    // multiset) could straddle a batch boundary between the two
    // resolutions. Registering with a StoreSetRef pins every serve
    // closure of one query to ONE committed ref: here a maintenance
    // batch + ref commit are INJECTED between the first and second
    // level's resolution (the ServePin.onPin seam), and both halves
    // must still answer from the pre-batch ref — all-old, never mixed.
    import graft.ops.{IncrementalAgg, JoinTreeIvm, MinMaxAgg}
    import graft.plans.ServePin
    import graft.sinks.StoreSetRef
    val fDir = tmpDir("pin-f"); val aDir = tmpDir("pin-a")
    val bDir = tmpDir("pin-b")
    val fact = (0L until 24L).map(k => (k, k * 10 + 1)).toDF("k", "v")
    val dimA = (0L until 24L).map(k => (k, k % 6)).toDF("k", "m")
    val dimB = (0L until 6L).map(m => (m, s"t${m % 2}")).toDF("m", "tag")
    fact.write.mode("overwrite").parquet(fDir)
    dimA.write.mode("overwrite").parquet(aDir)
    dimB.write.mode("overwrite").parquet(bDir)
    val root = tmpDir("pin-tree")
    val st = JoinTreeIvm.stores(spark, root, Seq(Seq("k"), Seq("m")),
      buckets = 4,
      aggSpec = Some(IncrementalAgg.Spec(Seq("tag"), Seq("v"))),
      extremaSpec = Some(MinMaxAgg.Spec(Seq("tag"), "v")))
    JoinTreeIvm.appendLeaf(st, 1, spark.read.parquet(aDir), 0L)
    JoinTreeIvm.appendLeaf(st, 2, spark.read.parquet(bDir), 1L)
    JoinTreeIvm.appendLeaf(st, 0, spark.read.parquet(fDir), 2L)
    val ref = new StoreSetRef(spark, s"$root/_refs",
      JoinTreeIvm.serveSurfaces(st))
    ref.commit()
    def query() = {
      def threeWay = spark.read.parquet(fDir)
        .join(spark.read.parquet(aDir), Seq("k"))
        .join(spark.read.parquet(bDir), Seq("m"))
      val a = threeWay.groupBy($"tag")
        .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      val b = threeWay.groupBy($"tag")
        .agg(min($"v").as("lo"), max($"v").as("hi"))
      a.join(b, Seq("tag")).orderBy($"tag")
    }
    val want = rows(query()) // the raw batch-1 truth, pre-registration
    JoinTreeIvm.registerServe(st, Seq(fDir, aDir, bDir),
      setRef = Some(ref))
    try {
      // the injected mid-read batch: k=5 exists in dimA (tag group),
      // so it moves BOTH the count/sum partials and the extrema max
      val extra = Seq((5L, 999999L)).toDF("k", "v")
      @volatile var injected = false
      ServePin.onPin = () => {
        if (!injected) {
          injected = true
          JoinTreeIvm.appendLeaf(st, 0, extra, 3L)
          ref.commit()
        }
      }
      val pinnedQ = query()
      val ps = scanPaths(pinnedQ)
      assert(ps.nonEmpty && ps.forall(_.startsWith(root)),
        s"both levels must serve from tree stores: $ps")
      val got = rows(pinnedQ)
      assert(injected,
        "fixture error: the mid-read injection never fired")
      assert(got == want,
        "both serve levels must answer from the PINNED pre-batch ref " +
          "(a mixed read would show the injected batch in one half)")
      // a NEW query pins the new ref and sees the batch on BOTH levels
      ServePin.onPin = () => ()
      extra.write.mode("append").parquet(fDir)
      val after = query()
      val psAfter = scanPaths(after)
      assert(psAfter.nonEmpty && psAfter.forall(_.startsWith(root)))
      val gotAfter = rows(after)
      assert(gotAfter != want)
      JoinTreeIvm.deregisterServe(st, Seq(fDir, aDir, bDir))
      assert(gotAfter == rows(query()),
        "the post-batch pinned read must equal the raw recompute")
    } finally {
      ServePin.onPin = () => ()
      JoinTreeIvm.deregisterServe(st, Seq(fDir, aDir, bDir))
    }
  }
}
