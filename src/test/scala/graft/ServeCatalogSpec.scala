package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{ChainedIvm, IncrementalAgg, JoinTreeIvm, MinMaxAgg}
import graft.plans.{MaterializedAggRewrite, MaterializedJoinRewrite,
  ServeCatalog}

/** The persisted serve registry: a registration recorded in
  * `_SERVES.json` must survive a process restart — simulated here as
  * clearing BOTH in-memory registries, then restoring on a NEW session
  * — and the restored serve must produce the same plan (the
  * q199/q210-style in-query scan-paths assert) and the same rows. */
class ServeCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame) = df.collect().map(_.toSeq.toList).toSet

  private def scanPaths(df: DataFrame): Set[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toUri.getPath).toSeq
          case _ => Seq.empty[String]
        }
    }.flatten.toSet

  /** The restart simulation: wipe the process-local registries the way
    * a fresh JVM starts, make a NEW session, restore from the catalog
    * directory (the explicit-dir form — the conf-keyed GraftSession
    * hook additionally runs once per dir per JVM, pinned below). */
  private def restarted(dir: String): org.apache.spark.sql.SparkSession = {
    MaterializedAggRewrite.clear()
    MaterializedJoinRewrite.clear()
    val s2 = spark.newSession()
    s2.conf.set(ServeCatalog.ConfKey, dir)
    ServeCatalog.restore(s2, dir)
    s2
  }

  test("chain serve survives a restart: same store-only plan, same rows") {
    val oDir = tmpDir("svc-o"); val lDir = tmpDir("svc-l")
    val orders = (0L until 40L).map(k => (k, s"s${k % 3}"))
      .toDF("okey", "status")
    val items = (0L until 40L).flatMap(k =>
      (0 until 2).map(i => (k, s"f${k % 2}", k * 100 + i)))
      .toDF("okey", "flag", "cents")
    orders.write.mode("overwrite").parquet(oDir)
    items.write.mode("overwrite").parquet(lDir)
    val chainRoot = tmpDir("svc-chain")
    val chain = ChainedIvm.stores(spark, chainRoot, Seq("okey"),
      IncrementalAgg.Spec(Seq("status", "flag"), Seq("cents")),
      buckets = 4,
      extremaSpec = Some(MinMaxAgg.Spec(Seq("status"), "cents")))
    ChainedIvm.appendLeft(chain, spark.read.parquet(oDir), 0L)
    ChainedIvm.appendRight(chain, spark.read.parquet(lDir), 1L)
    val entry = ServeCatalog.ChainServe(oDir, lDir, Seq("okey"),
      chainRoot, buckets = 4,
      aggKeyCols = Seq("status", "flag"), aggSumCols = Seq("cents"),
      extremaKeyCols = Seq("status"), extremaValCol = "cents")
    val catDir = tmpDir("svc-cat")
    ServeCatalog.record(spark, catDir, entry)
    def aggQuery(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(oDir).join(s.read.parquet(lDir), Seq("okey"))
        .groupBy(col("status"), col("flag"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
        .orderBy(col("status"), col("flag"))
    def extremaQuery(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(oDir).join(s.read.parquet(lDir), Seq("okey"))
        .groupBy(col("status"))
        .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"),
          expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cents)")
            .as("p50"))
        .orderBy(col("status"))
    val wantAgg = rows(aggQuery(spark))
    val wantEx = rows(extremaQuery(spark))
    assert(scanPaths(aggQuery(spark)).forall(_.startsWith(chainRoot)))
    try {
      val s2 = restarted(catDir)
      val agg2 = aggQuery(s2)
      val p1 = scanPaths(agg2)
      assert(p1.nonEmpty && p1.forall(_.startsWith(s"$chainRoot/agg")),
        s"restored agg serve must scan ONLY the agg store: $p1")
      assert(rows(agg2) == wantAgg)
      val ex2 = extremaQuery(s2)
      val p2 = scanPaths(ex2)
      assert(p2.nonEmpty && p2.forall(_.startsWith(s"$chainRoot/extrema")),
        s"restored extrema serve must scan ONLY the extrema store: $p2")
      assert(rows(ex2) == wantEx)
    } finally {
      MaterializedAggRewrite.clear(); MaterializedJoinRewrite.clear()
    }
  }

  test("tree serve lattice survives a restart, incl. the GraftSession hook") {
    val fDir = tmpDir("svc-f"); val aDir = tmpDir("svc-a")
    val bDir = tmpDir("svc-b")
    val fact = (0L until 30L).map(k => (k, s"g${k % 4}", k * 10 + 1))
      .toDF("k", "grp", "v")
    val dimA = (0L until 30L).filter(_ % 3 != 0)
      .map(k => (k, k % 6)).toDF("k", "m")
    val dimB = (0L until 6L).map(m => (m, s"t${m % 2}")).toDF("m", "tag")
    fact.write.mode("overwrite").parquet(fDir)
    dimA.write.mode("overwrite").parquet(aDir)
    dimB.write.mode("overwrite").parquet(bDir)
    val treeRoot = tmpDir("svc-tree")
    val st = JoinTreeIvm.stores(spark, treeRoot, Seq(Seq("k"), Seq("m")),
      buckets = 4,
      aggSpec = Some(IncrementalAgg.Spec(Seq("tag"), Seq("v"))))
    JoinTreeIvm.appendLeaf(st, 1, spark.read.parquet(aDir), 0L)
    JoinTreeIvm.appendLeaf(st, 2, spark.read.parquet(bDir), 1L)
    JoinTreeIvm.appendLeaf(st, 0, spark.read.parquet(fDir), 2L)
    val catDir = tmpDir("svc-cat2")
    ServeCatalog.record(spark, catDir,
      ServeCatalog.TreeServe(Seq(fDir, aDir, bDir),
        Seq(Seq("k"), Seq("m")), treeRoot, buckets = 4,
        aggKeyCols = Seq("tag"), aggSumCols = Seq("v")))
    def full(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(fDir).join(s.read.parquet(aDir), Seq("k"))
        .join(s.read.parquet(bDir), Seq("m"))
        .groupBy(col("tag"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .orderBy(col("tag"))
    def prefix(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(fDir).join(s.read.parquet(aDir), Seq("k"))
        .groupBy(col("grp")).agg(count(lit(1)).as("n"))
        .orderBy(col("grp"))
    val wantF = rows(full(spark)); val wantP = rows(prefix(spark))
    try {
      val s2 = restarted(catDir)
      val f2 = full(s2)
      val pF = scanPaths(f2)
      assert(pF.nonEmpty && pF.forall(_.startsWith(s"$treeRoot/agg")),
        s"restored full-tree agg must serve from partials: $pF")
      assert(rows(f2) == wantF)
      val p2 = prefix(s2)
      val pP = scanPaths(p2)
      assert(pP.nonEmpty && pP.forall(_.startsWith(s"$treeRoot/j0")),
        s"restored 2-leaf prefix must serve from level 0: $pP")
      assert(rows(p2) == wantP)
      // list/remove round-trip: after remove + restart, raw plans return
      ServeCatalog.remove(spark, catDir,
        s"tree:${Seq(fDir, aDir, bDir).mkString("⋈")}")
      assert(ServeCatalog.list(spark, catDir).isEmpty)
      val s3 = restarted(catDir)
      assert(scanPaths(full(s3)).exists(_.startsWith(fDir)),
        "a removed entry must not be restored")
    } finally {
      MaterializedAggRewrite.clear(); MaterializedJoinRewrite.clear()
    }
  }

  test("a restored serve DECLINES when the raw source ran ahead of the store") {
    val oDir = tmpDir("svc-stale-o")
    val orders = (0L until 50L).map(k => (k, s"s${k % 3}", k * 7 + 1))
      .toDF("okey", "status", "cents")
    orders.write.mode("overwrite").parquet(oDir)
    val aggRoot = tmpDir("svc-stale-agg")
    val store = new graft.sinks.AppendOnlyStore(spark, aggRoot,
      prefixCol = "__agg_key", prefixChars = 1)
    val spec = IncrementalAgg.Spec(Seq("status"), Seq("cents"))
    IncrementalAgg.appendBatch(store, spark.read.parquet(oDir), spec, 0L)
    val catDir = tmpDir("svc-stale-cat")
    ServeCatalog.record(spark, catDir,
      ServeCatalog.AggServe(oDir, aggRoot, Seq("status"), Seq("cents")))
    def query(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(oDir).groupBy(col("status"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
        .orderBy(col("status"))
    try {
      // restart with the raw path UNCHANGED: the witness matches and
      // the restored serve answers from the store
      val s2 = restarted(catDir)
      val p2 = scanPaths(query(s2))
      assert(p2.nonEmpty && p2.forall(_.startsWith(aggRoot)),
        s"witness-matching restore must serve from the store: $p2")
      // raw data runs AHEAD while the process is 'down' (no store
      // maintenance): the restored registration must DECLINE — stale
      // partials must never answer; the raw plan is the correct one
      (50L until 60L).map(k => (k, s"s${k % 3}", k * 7 + 1))
        .toDF("okey", "status", "cents")
        .write.mode("append").parquet(oDir)
      val s3 = restarted(catDir)
      val p3 = scanPaths(query(s3))
      assert(p3.nonEmpty && p3.forall(_.startsWith(oDir)),
        s"a stale restored serve must decline to the raw scan: $p3")
      assert(rows(query(s3)) == rows(query(spark)),
        "the declined query must see the appended raw rows")
      // the writer catches the store up and RE-RECORDS: the refreshed
      // witness re-enables the serve across the next restart
      IncrementalAgg.appendBatch(store,
        spark.read.parquet(oDir).filter(col("okey") >= 50L), spec, 1L)
      ServeCatalog.record(spark, catDir,
        ServeCatalog.AggServe(oDir, aggRoot, Seq("status"), Seq("cents")))
      val s4 = restarted(catDir)
      val p4 = scanPaths(query(s4))
      assert(p4.nonEmpty && p4.forall(_.startsWith(aggRoot)),
        s"re-recording must refresh the witness and serve again: $p4")
      assert(rows(query(s4)) == rows(query(spark)))
    } finally {
      MaterializedAggRewrite.clear(); MaterializedJoinRewrite.clear()
    }
  }

  test("restore never clobbers a live registration's fresh guard") {
    val oDir = tmpDir("svc-live-o")
    val orders = (0L until 40L).map(k => (k, s"s${k % 2}", k + 1))
      .toDF("okey", "status", "cents")
    orders.write.mode("overwrite").parquet(oDir)
    val aggRoot = tmpDir("svc-live-agg")
    val store = new graft.sinks.AppendOnlyStore(spark, aggRoot,
      prefixCol = "__agg_key", prefixChars = 1)
    val spec = IncrementalAgg.Spec(Seq("status"), Seq("cents"))
    IncrementalAgg.appendBatch(store, spark.read.parquet(oDir), spec, 0L)
    val catDir = tmpDir("svc-live-cat")
    def query() =
      spark.read.parquet(oDir).groupBy(col("status"))
        .agg(sum(col("cents")).as("s")).orderBy(col("status"))
    try {
      // the LIVE writer registers with its own (currently-declining)
      // fresh guard and persists the entry
      ServeCatalog.record(spark, catDir,
        ServeCatalog.AggServe(oDir, aggRoot, Seq("status"), Seq("cents")),
        fresh = () => false)
      assert(scanPaths(query()).forall(_.startsWith(oDir)),
        "the live guard declines, so the query runs raw")
      // a second restore over the LIVE process (the double-getOrCreate
      // shape) must not replace the live guard with the witness guard
      ServeCatalog.restore(spark, catDir)
      assert(scanPaths(query()).forall(_.startsWith(oDir)),
        "a catalog replay must not re-enable a live-declined serve")
    } finally {
      MaterializedAggRewrite.clear(); MaterializedJoinRewrite.clear()
    }
  }

  test("the conf-keyed hook restores once per dir per JVM") {
    val oDir = tmpDir("svc-once-o")
    (0L until 20L).map(k => (k, s"s${k % 2}", k + 1))
      .toDF("okey", "status", "cents")
      .write.mode("overwrite").parquet(oDir)
    val aggRoot = tmpDir("svc-once-agg")
    val store = new graft.sinks.AppendOnlyStore(spark, aggRoot,
      prefixCol = "__agg_key", prefixChars = 1)
    IncrementalAgg.appendBatch(store, spark.read.parquet(oDir),
      IncrementalAgg.Spec(Seq("status"), Seq("cents")), 0L)
    val catDir = tmpDir("svc-once-cat")
    ServeCatalog.record(spark, catDir,
      ServeCatalog.AggServe(oDir, aggRoot, Seq("status"), Seq("cents")))
    try {
      val s2 = spark.newSession()
      s2.conf.set(ServeCatalog.ConfKey, catDir)
      assert(ServeCatalog.restore(s2).nonEmpty,
        "first conf-keyed restore registers the catalog")
      assert(ServeCatalog.restore(s2).isEmpty,
        "a second conf-keyed restore of the same dir must no-op")
    } finally {
      MaterializedAggRewrite.clear(); MaterializedJoinRewrite.clear()
    }
  }

  test("mid-outer tree serve (outerLevels) survives a restart") {
    val fDir = tmpDir("svc-mo-f"); val aDir = tmpDir("svc-mo-a")
    val bDir = tmpDir("svc-mo-b")
    // fact ⟕ dimA ⟕ dimB, both keys fact-derived (prefix-keyed) and
    // both dims PARTIAL so null-extended groups exist at both levels
    val fact = (0L until 40L).map(k => (k % 7, k % 5, k + 1))
      .toDF("ak", "bk", "cents")
    val dimA = (0L until 5L).map(a => (a, s"ga$a")).toDF("ak", "aname")
    val dimB = (0L until 3L).map(b => (b, s"gb$b")).toDF("bk", "bname")
    fact.write.mode("overwrite").parquet(fDir)
    dimA.write.mode("overwrite").parquet(aDir)
    dimB.write.mode("overwrite").parquet(bDir)
    val treeRoot = tmpDir("svc-mo-tree")
    val st = JoinTreeIvm.stores(spark, treeRoot,
      Seq(Seq("ak"), Seq("bk")), buckets = 4,
      outerLevels = Seq(0), outerLast = true,
      aggSpec = Some(IncrementalAgg.Spec(Seq("aname"), Seq("cents"))))
    JoinTreeIvm.appendLeaf(st, 1, spark.read.parquet(aDir), 0L)
    JoinTreeIvm.appendLeaf(st, 2, spark.read.parquet(bDir), 1L)
    JoinTreeIvm.appendLeaf(st, 0, spark.read.parquet(fDir), 2L)
    val catDir = tmpDir("svc-mo-cat")
    ServeCatalog.record(spark, catDir,
      ServeCatalog.TreeServe(Seq(fDir, aDir, bDir),
        Seq(Seq("ak"), Seq("bk")), treeRoot, buckets = 4,
        aggKeyCols = Seq("aname"), aggSumCols = Seq("cents"),
        outerLast = true, outerLevels = Seq(0)))
    def chained(s: org.apache.spark.sql.SparkSession) =
      s.read.parquet(fDir)
        .join(s.read.parquet(aDir), Seq("ak"), "left")
        .join(s.read.parquet(bDir), Seq("bk"), "left")
    def byA(s: org.apache.spark.sql.SparkSession) =
      chained(s).groupBy(col("aname"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
        .orderBy(col("aname"))
    def byBoth(s: org.apache.spark.sql.SparkSession) =
      chained(s).groupBy(col("aname"), col("bname"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("aname"), col("bname"))
    val wantA = rows(byA(spark)); val wantBoth = rows(byBoth(spark))
    try {
      val s2 = restarted(catDir)
      val pA = scanPaths(byA(s2))
      assert(pA.nonEmpty && pA.forall(_.startsWith(s"$treeRoot/agg")),
        s"restored mid-outer tree agg must fold partials: $pA")
      assert(rows(byA(s2)) == wantA)
      val pBoth = scanPaths(byBoth(s2))
      val rawDirs = Seq(fDir, aDir, bDir)
      assert(pBoth.nonEmpty &&
        !pBoth.exists(p => rawDirs.exists(p.startsWith)),
        s"restored outer-multiset serve must never scan raw: $pBoth")
      assert(rows(byBoth(s2)) == wantBoth)
      // an INNER query over the same scans must still decline
      def innerQ = s2.read.parquet(fDir)
        .join(s2.read.parquet(aDir), Seq("ak"))
        .join(s2.read.parquet(bDir), Seq("bk"))
        .groupBy(col("aname")).agg(count(lit(1)).as("n"))
      assert(scanPaths(innerQ).exists(p => rawDirs.exists(p.startsWith)),
        "an inner query must not be served from restored outer state")
    } finally {
      MaterializedAggRewrite.clear(); MaterializedJoinRewrite.clear()
    }
  }
}
