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
    * directory through the GraftSession conf hook. */
  private def restarted(dir: String): org.apache.spark.sql.SparkSession = {
    MaterializedAggRewrite.clear()
    MaterializedJoinRewrite.clear()
    val s2 = spark.newSession()
    s2.conf.set(ServeCatalog.ConfKey, dir)
    ServeCatalog.restore(s2)
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
}
