package graft

import org.apache.spark.sql.functions._

import graft.ops.IncrementalAgg
import graft.plans.MaterializedAggRewrite
import graft.sinks.AppendOnlyStore

/** The MV rewrite must (a) answer registered aggregates from the store
  * with identical results, (b) actually stop scanning the raw table,
  * and (c) leave every non-matching shape (extra filter, different
  * keys, unregistered sums, distinct) completely untouched.
  */
class MaterializedAggRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val spec = IncrementalAgg.Spec(Seq("k"), Seq("v"))

  /** A raw table on disk + a store maintained over ALL of its rows. */
  private def fixture(): (String, AppendOnlyStore) = {
    val srcDir = tmpDir("mv-src")
    (1 to 9000).map(i => (s"k${i % 7}", i.toDouble % 101, i.toLong))
      .toDF("k", "v", "id")
      .write.mode("overwrite").parquet(srcDir)
    val store = new AppendOnlyStore(spark, tmpDir("mv-store"),
      prefixCol = "__agg_key", prefixChars = 1)
    val src = spark.read.parquet(srcDir)
    (0L to 2L).foreach(b => IncrementalAgg.appendBatch(store,
      src.filter($"id" % 3 === b), spec, b))
    (srcDir, store)
  }

  private def registered[T](srcDir: String, store: AppendOnlyStore)(f: => T): T = {
    MaterializedAggRewrite.register(srcDir, MaterializedAggRewrite.MvDef(
      spec.keyCols, spec.sumCols,
      () => IncrementalAgg.current(store, spec)))
    try f finally MaterializedAggRewrite.clear()
  }

  /** Float sums compare with a relative tolerance: the refold re-
    * associates the double additions (exactly as Spark's own partial
    * aggregation does across partitionings), so the last ulp may differ
    * even though counts — and any integer-quantized sum — are exact. */
  private def assertClose(got: Map[String, (Long, Double)],
                          want: Map[String, (Long, Double)]): Unit = {
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (n, total)) =>
      val (wn, wt) = want(k)
      assert(n == wn, s"$k count $n != $wn")
      assert(math.abs(total - wt) <= math.abs(wt) * 1e-12,
        s"$k sum $total !~ $wt")
    }
  }

  test("registered aggregate answers from the store, same results") {
    val (srcDir, store) = fixture()
    def query() = spark.read.parquet(srcDir).groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
    val want = query().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    registered(srcDir, store) {
      val df = query()
      // the store re-fold carries the partial columns; the raw scan has id
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("__cnt"), s"not reading the store:\n$plan")
      assert(!plan.contains(",id#"), s"still scanning raw table:\n$plan")
      val got = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assertClose(got, want)
    }
  }

  test("count(*) SQL form matches too") {
    val (srcDir, store) = fixture()
    registered(srcDir, store) {
      spark.read.parquet(srcDir).createOrReplaceTempView("mv_src")
      val df = spark.sql(
        "SELECT k, count(*) AS n, sum(v) AS total FROM mv_src GROUP BY k")
      assert(df.queryExecution.optimizedPlan.toString.contains("__cnt"))
      assert(df.agg(sum($"n")).head().getLong(0) == 9000L)
    }
  }

  test("non-matching shapes keep their original plan") {
    val (srcDir, store) = fixture()
    registered(srcDir, store) {
      val raw = spark.read.parquet(srcDir)
      // filter between aggregate and scan
      val filtered = raw.where($"v" > 50).groupBy($"k")
        .agg(count(lit(1)).as("n"))
      assert(!filtered.queryExecution.optimizedPlan.toString.contains("__cnt"))
      // different grouping keys
      val otherKeys = raw.groupBy($"k", $"id").agg(count(lit(1)).as("n"))
      assert(!otherKeys.queryExecution.optimizedPlan.toString.contains("__cnt"))
      // unregistered sum column
      val otherSum = raw.groupBy($"k").agg(sum($"id").as("s"))
      assert(!otherSum.queryExecution.optimizedPlan.toString.contains("__cnt"))
      // distinct aggregate
      val distinctAgg = raw.groupBy($"k").agg(countDistinct($"v").as("d"))
      assert(!distinctAgg.queryExecution.optimizedPlan.toString
        .contains("__cnt"))
      // and with nothing registered, the matching shape is untouched
      MaterializedAggRewrite.clear()
      val plain = raw.groupBy($"k").agg(count(lit(1)).as("n"))
      assert(!plain.queryExecution.optimizedPlan.toString.contains("__cnt"))
    }
  }

  test("min/max aggregates rewrite when maintained") {
    val srcDir = tmpDir("mv-minmax-src")
    (1 to 6000).map(i => (s"k${i % 5}", i.toDouble % 97, i.toLong))
      .toDF("k", "v", "id")
      .write.mode("overwrite").parquet(srcDir)
    val mmSpec = IncrementalAgg.Spec(Seq("k"), Nil,
      minCols = Seq("v"), maxCols = Seq("v", "id"))
    val store = new AppendOnlyStore(spark, tmpDir("mv-minmax-store"),
      prefixCol = "__agg_key", prefixChars = 1)
    val src = spark.read.parquet(srcDir)
    (0L to 1L).foreach(b => IncrementalAgg.appendBatch(store,
      src.filter($"id" % 2 === b), mmSpec, b))
    IncrementalAgg.compact(store, mmSpec)
    MaterializedAggRewrite.register(srcDir, MaterializedAggRewrite.MvDef(
      mmSpec.keyCols, mmSpec.sumCols,
      () => IncrementalAgg.current(store, mmSpec),
      minCols = mmSpec.minCols, maxCols = mmSpec.maxCols))
    try {
      def query() = spark.read.parquet(srcDir).groupBy($"k")
        .agg(min($"v").as("lo"), max($"v").as("hi"), max($"id").as("last"))
      val df = query()
      assert(df.queryExecution.optimizedPlan.toString.contains("__min_v"))
      val got = df.collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getLong(3))).toSet
      MaterializedAggRewrite.clear()
      val want = query().collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getLong(3))).toSet
      assert(got == want) // min/max are exact — no float re-association
    } finally MaterializedAggRewrite.clear()
  }

  test("rewrite stays correct after more batches and compaction") {
    val (srcDir, store) = fixture()
    // late-arriving batch lands in BOTH the raw table and the store
    val late = (9001 to 10000).map(i => (s"k${i % 7}", i.toDouble % 101,
      i.toLong)).toDF("k", "v", "id")
    late.write.mode("append").parquet(srcDir)
    IncrementalAgg.appendBatch(store, late, spec, 3L)
    IncrementalAgg.compact(store, spec)
    def query() = spark.read.parquet(srcDir).groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
    val want = query().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    registered(srcDir, store) {
      val got = query().collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assertClose(got, want)
    }
  }
}
