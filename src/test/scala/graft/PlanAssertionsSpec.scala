package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

import graft.queries.{LlmQueries, RelationalQueries}

/** Physical-plan regression tests: the scale-critical plan properties
  * (filter pushdown into the scan, column pruning, broadcast dimension
  * joins, map-side partial aggregation, bounded shuffle counts) asserted
  * directly, so a refactor that silently degrades a plan fails CI even
  * while results stay correct.
  */
class PlanAssertionsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def shuffles(df: DataFrame): Int =
    "Exchange hashpartitioning|Exchange rangepartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  test("no driver query plans an accidental cartesian / nested-loop join") {
    // brute-force vector scorers broadcast one side BY DESIGN; everything
    // else must plan hash/sort-merge joins
    val intentionallyBruteForce = Set(
      "q29_cosine_topk", "q52_cosine_neardups", "q38_fuzzy_match",
      "q19_check_metrics" /* 1-row x 1-row metric crossJoin */,
      "q63_bm25" /* 1-row corpus-stats broadcast join */,
      "q190_inc_text_index" /* 1-row maintained-stats broadcast joins */,
      "q193_text_topk" /* same 1-row stats joins, candidate-bounded */,
      "q194_cdc_text_index" /* same 1-row stats joins at stream cadence */,
      "q205_rtbf_e2e" /* serves BM25 → same 1-row stats broadcast joins */,
      "q195_inc_triangles" /* 1-row count x 1-row edge-count crossJoin */,
      "q197_inc_checks" /* three 1-row monitor aggregates crossJoined */,
      "q78_ann_int8" /* int8 coarse scan broadcasts the query batch */,
      "q79_ann_pq" /* PQ ADC coarse scan broadcasts the query tables */,
      "q80_lm_score" /* 1-row vocab scalar broadcast join */,
      "q93_count_min" /* 1-row sketch matrix broadcast join */,
      "q155_zorder" /* 1-row grid-bounds scalar broadcast join */,
      "q157_tfidf" /* 1-row corpus-count scalar broadcast join */)
    val offenders = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val bad = (p.contains("CartesianProduct") ||
        p.contains("BroadcastNestedLoopJoin")) &&
        !intentionallyBruteForce.contains(name)
      if (bad) Some(name) else None
    }
    assert(offenders.isEmpty, s"unexpected nested-loop plans: $offenders")
  }

  test("join-IVM delta join: bucketed state scan, zero state-side exchange, delta builds the hash") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    import graft.ops.IncrementalJoin
    val st = IncrementalJoin.stores(spark,
      java.nio.file.Files.createTempDirectory("ijoin-plan").toString)
    import spark.implicits._
    val l = (1L to 100L).map(k => (k, s"l$k")).toDF("k", "lv")
    val r = (1L to 100L).map(k => (k, s"r$k")).toDF("k", "rv")
    IncrementalJoin.appendLeft(st, l, Seq("k"), 0L)
    IncrementalJoin.appendRight(st, r, Seq("k"), 10L)
    // AQE wraps the tree in a leaf AdaptiveSparkPlanExec; the q163 path
    // runs AQE-off anyway (batch-sized stages), so audit that shape
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val exec = IncrementalJoin.planProbe(st, l, Seq("k"), deltaIsLeft = true)
        .queryExecution.executedPlan
      val shj = exec.collect { case j: ShuffledHashJoinExec => j }
      assert(shj.size == 1, s"expected one ShuffledHashJoin:\n$exec")
      val j = shj.head
      // delta is the join's left child and the hash-build side
      assert(j.buildSide.toString == "BuildLeft", j.buildSide.toString)
      // the STATE side: a bucketed table scan with no exchange anywhere
      // under it — the layout investment that keeps per-batch shuffle
      // bytes delta-sized while state grows without bound
      assert(j.right.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"state side re-shuffled:\n${j.right}")
      val stateScans = j.right.collect { case s: FileSourceScanExec => s }
      assert(stateScans.nonEmpty && stateScans.forall(_.bucketedScan),
        s"state scan not bucketed:\n${j.right}")
      // the DELTA side pays its (delta-sized) exchange into the layout
      assert(j.left.collect { case e: ShuffleExchangeExec => e }.nonEmpty,
        s"delta side missing its exchange:\n${j.left}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }

  test("q2: both predicates push into the parquet scan; schema pruned") {
    val p = plan(RelationalQueries.q2FilterProject(spark, dir))
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quantity,45.0)")
      && p.contains("EqualTo(l_returnflag,R)"))
    // 11-column table, 7 read (keys + arithmetic inputs + filters)
    assert(!p.contains("l_shipdate"), "unneeded column not pruned")
  }

  test("q4: dimension joins broadcast; aggregation is partial before exchange") {
    val p = plan(RelationalQueries.q4JoinMulti(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4)
    assert(p.contains("HashAggregate"))
    assert(!p.contains("SortMergeJoin"), "dims must not sort-merge at this size")
  }

  test("as-of join: one key shuffle + window, never a nested loop") {
    val df = LlmQueries.q44AsofJoin(spark, dir)
    val p = plan(df)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("Window"))
    assert(shuffles(df) <= 2, s"asof should shuffle at most twice (join key + output sort), got ${shuffles(df)}")
  }

  test("minhash signatures: partial aggregation, no sort in the plan") {
    val df = graft.ops.DedupOps.minhashSignatures(
      graft.sources.Tables.load(spark, dir, "documents"), "text", "doc_id")
    val p = plan(df)
    assert(p.contains("HashAggregate"))
    assert(!p.contains("Sort "), "minhash must not sort")
    assert(shuffles(df) == 1, s"exactly one shuffle on doc_id, got ${shuffles(df)}")
  }

  test("latest-per-key merge: single shuffle hash aggregate, no window sort") {
    val df = graft.sources.Debezium.latestPerKey(
      graft.sources.Tables.load(spark, dir, "events"),
      Seq("user_id"), Seq(org.apache.spark.sql.functions.col("ts")))
    val p = plan(df)
    assert(p.contains("max_by") || p.contains("HashAggregate"))
    assert(!p.contains("Window"), "merge must be aggregate-based, not window")
    assert(shuffles(df) == 1)
  }

  test("grouping sets: ONE Expand + one aggregate, not three scans") {
    val df = RelationalQueries.q62GroupingSets(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(p).length == 1, "grouping sets must Expand once")
    assert(!p.contains("Union"), "must not union per-stratum scans")
    assert("FileScan parquet".r.findAllIn(p).length <= 3) // customer+nation+region
  }

  test("pivot with explicit values: single aggregate, no distinct-discovery scan") {
    val df = RelationalQueries.q61Pivot(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // one scan of events only — value discovery would add a second
    assert("FileScan parquet".r.findAllIn(p).length == 1)
    // canonical pivot = two-phase aggregate ((bucket,type) agg → pivot_first
    // by bucket) + the output range sort = 3 exchanges, all partial-agg'd
    assert(shuffles(df) <= 3, s"pivot shuffle count regressed: ${shuffles(df)}")
  }

  test("decontamination: gram joins stay hash/broadcast, corpus never cartesian") {
    val df = LlmQueries.q60Decontaminate(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("LeftSemi"), "gram membership must be a semi-join")
  }

  test("shingle extraction is a native codegen'd expression, not interpreted HOFs") {
    val df = graft.sources.Tables.load(spark, dir, "documents")
      .select(graft.ops.TextOps.shingleHashes(
        org.apache.spark.sql.functions.col("text"), 3))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("shingle_hashes"), "native expression missing from plan")
    assert(!p.contains("transform(") && !p.contains("lambdafunction"),
      "interpreted higher-order lambda crept back into the shingle path")
    // `*(n)` is executedPlan.toString's whole-stage-codegen marker
    assert(p.contains("*(1) Project"), "shingle projection left codegen")
  }

  test("repetition metrics: two doc-keyed shuffles, both partial-aggregated") {
    val df = graft.ops.CurationOps.repetitionMetrics(
      graft.sources.Tables.load(spark, dir, "documents"), "text", "doc_id", 2)
    val p = plan(df)
    assert(p.contains("HashAggregate"))
    assert(!p.contains("Window"), "must be aggregate-based")
    assert(shuffles(df) == 2, s"(doc,gram) + doc rollup = 2 shuffles, got ${shuffles(df)}")
  }

  test("temperature sampling never shuffles the corpus") {
    val df = LlmQueries.q71TemperatureSample(spark, dir)
    val ex = df.queryExecution.executedPlan.toString
    // the corpus side must reach the rate join via broadcast; the only
    // hash exchanges belong to the |domains|-row histogram + output sort
    assert(ex.contains("BroadcastHashJoin") || ex.contains("BroadcastExchange"),
      "rate table must broadcast onto the corpus")
    val corpusScans = "FileScan parquet".r.findAllIn(ex).length
    assert(corpusScans <= 2, s"corpus scanned $corpusScans times (hist + filter)")
  }

  test("repeated spans: hash semi-join + per-doc window, no nested loop") {
    val df = LlmQueries.q73RepeatedSpans(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("LeftSemi"), "repeated-gram membership must be a semi-join")
    assert(p.contains("Window"), "span merge must be the gaps-and-islands window")
  }

  test("q51 exact median: every selection pass is aggregate-only, no Window") {
    // the former row_number() form sorted lineitem in 3 l_returnflag
    // tasks — a straggler at 100×. q51 now runs its passes as internal
    // actions (concurrent sketch/distinct jobs + histogram narrowing), so
    // the gate captures EVERY executed plan via a listener and asserts
    // none regressed to a Window sort — stronger than inspecting the
    // final (driver-assembled) frame alone
    val plans = scala.collection.mutable.ArrayBuffer[String]()
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString; () }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      graft.queries.FunctionQueries.q51ApproxStats(spark, dir).collect()
      // the execution-listener bus is asynchronous; q51 runs ≥4 actions
      val deadline = System.nanoTime() + 10000000000L
      while (plans.synchronized(plans.size) < 4 &&
          System.nanoTime() < deadline) Thread.sleep(50)
      val all = plans.synchronized(plans.mkString("\n===\n"))
      assert(plans.synchronized(plans.size) >= 4,
        s"expected the sketch/distinct/histogram passes, saw:\n$all")
      assert(!all.contains("Window"),
        "q51 median regressed to a per-flag window sort")
      assert(all.contains("HashAggregate") ||
        all.contains("ObjectHashAggregate"))
    } finally spark.listenerManager.unregister(l)
  }

  test("q128 canonical retention: cluster-keyed window, never a global sort funnel") {
    // the survivor pick must window over hashpartitioning(cluster_id) —
    // thousands of small partitions — not collapse to one
    val df = graft.queries.LlmQueries.q128CanonicalRetention(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(cluster_id"),
      s"expected the survivor window keyed by cluster_id:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      "canonical retention funneled through one partition")
  }

  test("q129 filter funnel: one corpus scan, stage-list side broadcast") {
    val df = graft.queries.LlmQueries.q129FilterFunnel(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the corpus is scanned once; the 5-row stage list joins broadcast
    assert("FileScan parquet".r.findAllIn(p).length == 1,
      s"funnel should read the corpus exactly once:\n$p")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("Window"))
  }

  test("q139 weighted sample: A-ES top-k heap-compiles, no Window sort") {
    val df = graft.queries.LlmQueries.q139WeightedSample(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("collect_top"), s"A-ES top-k did not heap-compile:\n$p")
    assert(!p.contains("Window"), "per-stratum window survived the rewrite")
  }

  test("q120 rank top-k: tie-aware heap aggregate, no Window, no sort below") {
    val df = graft.queries.FunctionQueries.q120RankTopK(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("collect_top_rank"), s"rank rewrite did not fire:\n$p")
    assert(!p.contains("Window"), "rank window survived the rewrite")
  }

  test("q117 MV hit fires through the collapsed projection") {
    // CollapseProject folds the quantizing select INTO the Aggregate
    // (floor(sum(x)+0.5) shapes); the rewrite must fire anyway
    val df = graft.queries.AnalyticsQueries.q117MvHit(spark, dir)
    try {
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("__cnt"), s"MV hit did not fire:\n$p")
      assert(!p.contains("l_orderkey"), s"still scanning the fact table:\n$p")
    } finally graft.plans.MaterializedAggRewrite.clear()
  }

  test("q123 join-MV hit: store partials re-aggregate, fact scan never runs") {
    val df = graft.queries.AnalyticsQueries.q123MvJoinHit(spark, dir)
    try {
      val p = df.queryExecution.optimizedPlan.toString
      assert(p.contains("__cnt"), s"join-MV hit did not fire:\n$p")
      assert(!p.contains("l_orderkey"), s"still scanning the fact table:\n$p")
    } finally graft.plans.MaterializedAggRewrite.clear()
  }

  test("q93 count-min probe: sketch broadcasts, probes scored executor-side") {
    val df = graft.queries.FunctionQueries.q93CountMin(spark, dir)
    val p = plan(df)
    assert(p.contains("cms_estimate"),
      "probe must go through the native cms_estimate expression")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "the 1-row sketch must broadcast onto the supplier dimension")
  }

  test("bpe pair counts: vocab-sized aggregates only, fully partial-agg'd") {
    val df = LlmQueries.q74BpePairs(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    assert(p.contains("HashAggregate"))
    assert(p.contains("TakeOrderedAndProject"),
      "top-50 must be TakeOrdered, not a global sort")
  }
}
