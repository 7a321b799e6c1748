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
      // filter on a NON-key column between aggregate and scan
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

  test("key-only filters commute: filtered aggregate answers from the store") {
    val (srcDir, store) = fixture()
    def query() = spark.read.parquet(srcDir)
      .where($"k".isin("k1", "k3", "k5") && $"k" =!= "k3")
      .groupBy($"k").agg(count(lit(1)).as("n"), sum($"v").as("total"))
    val want = query().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    registered(srcDir, store) {
      val df = query()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("__cnt"), s"key-filtered hit did not fire:\n$plan")
      assert(!plan.contains(",id#"), s"still scanning raw table:\n$plan")
      val got = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got.keySet == Set("k1", "k5"))
      assertClose(got, want)
    }
  }

  test("avg answers from sum/cnt partials, null semantics exact") {
    val srcDir = tmpDir("mv-avg-src")
    // every 11th v is NULL: avg must divide by the NON-null count, so a
    // store keeping only count(*) would be wrong — this is the gate
    (1 to 9000).map { i =>
      (s"k${i % 7}",
        if (i % 11 == 0) null else java.lang.Double.valueOf(i % 101),
        i.toLong)
    }.toDF("k", "v", "id").write.mode("overwrite").parquet(srcDir)
    val store = new AppendOnlyStore(spark, tmpDir("mv-avg-store"),
      prefixCol = "__agg_key", prefixChars = 1)
    val src = spark.read.parquet(srcDir)
    (0L to 2L).foreach(b => IncrementalAgg.appendBatch(store,
      src.filter($"id" % 3 === b), spec, b))
    def query() = spark.read.parquet(srcDir).groupBy($"k")
      .agg(avg($"v").as("a"), count(lit(1)).as("n"))
    val want = query().collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    registered(srcDir, store) {
      val df = query()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("__cnt"), s"avg hit did not fire:\n$plan")
      val got = df.collect()
        .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
      assert(got.keySet == want.keySet)
      got.foreach { case (k, (a, n)) =>
        val (wa, wn) = want(k)
        assert(n == wn && math.abs(a - wa) <= math.abs(wa) * 1e-12,
          s"$k avg $a !~ $wa (n=$n/$wn)")
      }
    }
  }

  test("approx_count_distinct answers from the sketch store; exact regime equal") {
    import graft.ops.SketchAgg
    val srcDir = tmpDir("mv-dist-src")
    // 50 distinct ids per key — inside the sketch's exact (sparse) regime
    (1 to 9000).map(i => (s"k${i % 7}", i.toDouble % 101, (i % 50).toLong))
      .toDF("k", "v", "id").write.mode("overwrite").parquet(srcDir)
    val aggStore = new AppendOnlyStore(spark, tmpDir("mv-dist-agg"),
      prefixCol = "__agg_key", prefixChars = 1)
    val dStore = new AppendOnlyStore(spark, tmpDir("mv-dist-sketch"),
      prefixCol = "__agg_key", prefixChars = 1)
    val dSpec = SketchAgg.Spec(Seq("k"), "id")
    val src = spark.read.parquet(srcDir)
    (0L to 2L).foreach { b =>
      IncrementalAgg.appendBatch(aggStore, src.filter($"v" % 3 === b), spec, b)
      SketchAgg.appendBatch(dStore, src.filter($"v" % 3 === b), dSpec, b)
    }
    MaterializedAggRewrite.register(srcDir, MaterializedAggRewrite.MvDef(
      spec.keyCols, spec.sumCols,
      () => IncrementalAgg.current(aggStore, spec),
      distinctCurrent = Map("id" -> (() =>
        SketchAgg.current(dStore, dSpec).select($"k", $"n_distinct"))),
      serveExactDistinct = true))
    try {
      def query() = spark.read.parquet(srcDir).groupBy($"k")
        .agg(approx_count_distinct($"id").as("d"), count(lit(1)).as("n"))
      val df = query()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("n_distinct"), s"distinct hit did not fire:\n$plan")
      val got = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // sparse regime: the stored sketch is exact, so compare to EXACT
      val want = spark.read.parquet(srcDir).groupBy($"k")
        .agg(countDistinct($"id").as("d"), count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == want)
      // exact count(DISTINCT) is served ONLY under the registrant's flag
      val exact = spark.read.parquet(srcDir).groupBy($"k")
        .agg(countDistinct($"id").as("d"))
      assert(exact.queryExecution.optimizedPlan.toString
        .contains("n_distinct"), "serveExactDistinct=true must serve it")
      val gotExact = exact.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(gotExact == want.map { case (k, (d, _)) => k -> d })
    } finally MaterializedAggRewrite.clear()

    // without the flag, count(DISTINCT) keeps its plan (approximate
    // stores must not silently answer an exact aggregate)
    MaterializedAggRewrite.register(srcDir, MaterializedAggRewrite.MvDef(
      spec.keyCols, spec.sumCols,
      () => IncrementalAgg.current(aggStore, spec),
      distinctCurrent = Map("id" -> (() =>
        SketchAgg.current(dStore, dSpec).select($"k", $"n_distinct")))))
    try {
      val exact = spark.read.parquet(srcDir).groupBy($"k")
        .agg(countDistinct($"id").as("d"))
      assert(!exact.queryExecution.optimizedPlan.toString
        .contains("n_distinct"))
    } finally MaterializedAggRewrite.clear()
  }

  test("aggregate over fact-dim join re-aggregates the store partials") {
    val (srcDir, store) = fixture()
    val dim = Seq(("k0", "east"), ("k1", "east"), ("k2", "west"),
      ("k3", "west"), ("k4", "north"), ("k5", "north"))
      .toDF("k", "region") // k6 intentionally unmatched → inner-join drop
    def query() = spark.read.parquet(srcDir)
      .join(dim, Seq("k"))
      .groupBy($"region")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"),
        avg($"v").as("a"))
    val want = query().collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    registered(srcDir, store) {
      val df = query()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("__cnt"), s"join hit did not fire:\n$plan")
      assert(!plan.contains(",id#"), s"still scanning the fact table:\n$plan")
      val got = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toMap
      assert(got.keySet == want.keySet && got.keySet == Set("east", "west",
        "north"))
      got.foreach { case (k, (n, t, a)) =>
        val (wn, wt, wa) = want(k)
        assert(n == wn, s"$k n")
        assert(math.abs(t - wt) <= math.abs(wt) * 1e-12, s"$k sum")
        assert(math.abs(a - wa) <= math.abs(wa) * 1e-12, s"$k avg")
      }
    }
  }

  test("join shapes that cannot re-aggregate keep their plan") {
    val (srcDir, store) = fixture()
    val dim = Seq(("k0", "east", 10.0), ("k1", "west", 20.0))
      .toDF("k", "region", "w")
    registered(srcDir, store) {
      val fact = spark.read.parquet(srcDir)
      // dim-column aggregate: not maintained → untouched
      val dimAgg = fact.join(dim, Seq("k")).groupBy($"region")
        .agg(sum($"w").as("s"))
      assert(!dimAgg.queryExecution.optimizedPlan.toString.contains("__cnt"))
      // left join changes unmatched-key semantics → untouched
      val leftJoin = fact.join(dim, Seq("k"), "left").groupBy($"region")
        .agg(count(lit(1)).as("n"))
      assert(!leftJoin.queryExecution.optimizedPlan.toString.contains("__cnt"))
      // distinct count is not re-mergeable across keys → untouched
      val dAgg = fact.join(dim, Seq("k")).groupBy($"region")
        .agg(countDistinct($"v").as("d"))
      assert(!dAgg.queryExecution.optimizedPlan.toString.contains("__cnt"))
      // non-key fact group column → untouched
      val badGroup = fact.join(dim, Seq("k")).groupBy($"v")
        .agg(count(lit(1)).as("n"))
      assert(!badGroup.queryExecution.optimizedPlan.toString.contains("__cnt"))
    }
  }

  test("percentile_approx answers from the KLL store; exact regime equal") {
    import graft.ops.QuantileSketchAgg
    val srcDir = tmpDir("mv-q-src")
    // ≤ 60 values per key: inside KLL capacity → stored quantiles exact
    (1 to 300).map(i => (s"k${i % 5}", (i * 31L) % 211L, i.toLong))
      .toDF("k", "q", "id").write.mode("overwrite").parquet(srcDir)
    val aggStore = new AppendOnlyStore(spark, tmpDir("mv-q-agg"),
      prefixCol = "__agg_key", prefixChars = 1)
    val kllStore = new AppendOnlyStore(spark, tmpDir("mv-q-kll"),
      prefixCol = "__agg_key", prefixChars = 1)
    val aggSpec = IncrementalAgg.Spec(Seq("k"), Nil)
    val kllSpec = QuantileSketchAgg.Spec(Seq("k"), "q", k = 200)
    val src = spark.read.parquet(srcDir)
    (0L to 1L).foreach { b =>
      IncrementalAgg.appendBatch(aggStore, src.filter($"id" % 2 === b),
        aggSpec, b)
      QuantileSketchAgg.appendBatch(kllStore, src.filter($"id" % 2 === b),
        kllSpec, b)
    }
    MaterializedAggRewrite.register(srcDir, MaterializedAggRewrite.MvDef(
      aggSpec.keyCols, aggSpec.sumCols,
      () => IncrementalAgg.current(aggStore, aggSpec),
      quantileCurrent = Map("q" -> (ps =>
        QuantileSketchAgg.current(kllStore, kllSpec, ps)))))
    try {
      def query() = spark.read.parquet(srcDir).groupBy($"k")
        .agg(percentile_approx($"q", lit(0.5), lit(10000)).as("med"),
          count(lit(1)).as("n"))
      val df = query()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("__q_q_50"), s"quantile hit did not fire:\n$plan")
      val got = df.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // exact regime: KLL inclusive-rank median == the reference median
      val want = src.collect().groupBy(_.getString(0)).map { case (k, rows) =>
        val vs = rows.map(_.getLong(1)).sorted
        val med = vs.find(v =>
          vs.count(_ <= v).toDouble / vs.length >= 0.5).get
        k -> (med, rows.length.toLong)
      }
      assert(got == want)
      // guard: a non-registered column keeps its plan
      val other = spark.read.parquet(srcDir).groupBy($"k")
        .agg(percentile_approx($"id", lit(0.5), lit(10000)).as("m"))
      assert(!other.queryExecution.optimizedPlan.toString.contains("__q_"))
    } finally MaterializedAggRewrite.clear()
  }

  test("distinct store staleness: maintenance restores equality") {
    import graft.ops.SketchAgg
    val srcDir = tmpDir("mv-stale-src")
    (1 to 4000).map(i => (s"k${i % 5}", i.toDouble, (i % 30).toLong))
      .toDF("k", "v", "id").write.mode("overwrite").parquet(srcDir)
    val aggStore = new AppendOnlyStore(spark, tmpDir("mv-stale-agg"),
      prefixCol = "__agg_key", prefixChars = 1)
    val dStore = new AppendOnlyStore(spark, tmpDir("mv-stale-sketch"),
      prefixCol = "__agg_key", prefixChars = 1)
    val dSpec = SketchAgg.Spec(Seq("k"), "id")
    val src0 = spark.read.parquet(srcDir)
    IncrementalAgg.appendBatch(aggStore, src0, spec, 0L)
    SketchAgg.appendBatch(dStore, src0, dSpec, 0L)
    // new ids arrive in BOTH raw table and stores (registrant's contract)
    val late = (4001 to 5000).map(i => (s"k${i % 5}", i.toDouble,
      (30 + i % 20).toLong)).toDF("k", "v", "id")
    late.write.mode("append").parquet(srcDir)
    IncrementalAgg.appendBatch(aggStore, late, spec, 1L)
    SketchAgg.appendBatch(dStore, late, dSpec, 1L)
    SketchAgg.compact(dStore, dSpec)
    MaterializedAggRewrite.register(srcDir, MaterializedAggRewrite.MvDef(
      spec.keyCols, spec.sumCols,
      () => IncrementalAgg.current(aggStore, spec),
      distinctCurrent = Map("id" -> (() =>
        SketchAgg.current(dStore, dSpec).select($"k", $"n_distinct"))),
      serveExactDistinct = true))
    try {
      val got = spark.read.parquet(srcDir).groupBy($"k")
        .agg(countDistinct($"id").as("d")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      MaterializedAggRewrite.clear()
      val want = spark.read.parquet(srcDir).groupBy($"k")
        .agg(countDistinct($"id").as("d")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, "post-maintenance store must match the raw scan")
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
