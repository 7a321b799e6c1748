package graft

/** Multi-executor parity gate: the representative query set below runs
  * in a child JVM on `local-cluster[2,2,1536]` (separate executor
  * processes — see [[ClusterParityDemo]]) and every result must equal
  * the shared local[4] session's answer row-for-row.
  *
  * The set is chosen for serialization surface, not breadth: custom
  * imperative aggregate buffers (count-min, SpaceSaving, KMV), the PQ
  * codebook reference-object expressions, per-executor codec caches
  * (multimodal ThreadLocals are exercised transitively by the minhash
  * fixtures), iterative lineage cuts (PageRank), the CDC JSON
  * round-trip, Expand-based CUBE, and the as-of join. Every query here
  * is engineered order-independent, so cross-JVM equality is exact.
  */
class ClusterParitySpec extends SparkSpec {

  private val names = Seq(
    "q1_agg", "q4_join_multi", "q21_cdc_roundtrip", "q27_minhash_lsh",
    "q44_asof_join", "q51_approx_stats", "q74_bpe_pairs", "q79_ann_pq",
    "q89_pagerank", "q93_count_min", "q125_heavy_ivm", "q151_kmv_overlap",
    "q136_line_dedup", "q156_cube",
    // round-5 additions: store-backed join IVM (cross-executor append/
    // read/compact cycles), degree-oriented wedge joins, and the
    // PassJoin explode+equi-join blocking
    "q163_join_ivm", "q159_triangles", "q160_fuzzy_join",
    // round-6 additions: signed-multiset outer IVMs (retraction appends
    // + bucketed-table state across executor JVMs), the end-to-end
    // CDC stream (file stream → merge sink → shred → broadcast join),
    // and the prefix-filtered set-similarity join (window ranks +
    // multi-stage equi-joins over the wire)
    "q171_join_ivm_outer", "q172_cdc_stream", "q173_join_ivm_full",
    "q175_jaccard_join",
    // round-8 additions: the SIGNED-delta IVM family — negative
    // multiplicities ride the same multiset stores, but their
    // serialization across executor JVMs (signed folds, retraction
    // rows, post-compaction appends) was untested until here
    "q177_join_ivm_deletes", "q178_agg_ivm_deletes",
    "q179_outer_ivm_deletes",
    // round-8 additions II: the chained IVM (join Δ-tap feeding the
    // downstream agg store across executors), the streaming CDC →
    // chain drain, and the value-multiset extrema/quantile stores
    "q184_chained_ivm", "q185_cdc_chain", "q186_minmax_ivm",
    "q187_quantile_deletes",
    // round-8 additions III: the dual-downstream chain (extrema tap),
    // the maintained inverted index (postings/doc-length stores +
    // BM25 stat broadcasts over the wire), the signed LSH membership
    // store, and the signed IVF index (vector arrays in groupBy keys
    // across executor JVMs)
    "q189_chain_extrema", "q190_inc_text_index",
    "q191_takedown_neardup", "q192_signed_ivf_ann",
    // round-8 additions IV: the df-bounded top-k serve (heap cut over
    // the wire) and the triangle-count Δ-rule (three join shapes whose
    // signed corner rows cross executor JVMs)
    "q193_text_topk", "q196_inc_clustering",
    // round-8 addition V: incremental CC (star re-solve + changed-rows
    // emit over executor JVM boundaries)
    "q198_inc_cc",
    // round-9 additions: the extrema serve level (percentile_disc
    // rewrite over the MinMaxAgg multiset, plan-asserted in-query) and
    // signed CC (edge-store re-solve + label retraction across
    // executor JVMs)
    "q199_extrema_serve", "q200_signed_cc",
    // round-10 additions: the four maintained graph algorithms —
    // store-and-iterate, imperative-buffer, lineage-cut shapes whose
    // closure re-solves and boundary-vector reads cross executor JVMs
    "q201_inc_pagerank", "q202_inc_sssp", "q203_inc_kcore",
    "q204_inc_nearest_seeds",
    // round-10 additions II: the n-ary join-tree cascade (per-level
    // bucketed tables + Δ-taps crossing executor JVMs) and its SQL
    // serve (tree-registry rewrite resolving store scans in-plan)
    "q206_join_tree_ivm", "q207_tree_mv_serve", "q209_outer_tree_ivm",
    // round-11 additions: the tree extrema serve (percentile_cont/
    // disc rewrite resolving MinMaxAgg store scans in-plan under a
    // multi-executor scheduler) and the CDC-topics → tree drain
    // (streaming micro-batches cascading Δ-taps across executor JVMs)
    "q210_tree_extrema_serve", "q208_cdc_tree",
    // round-11 additions II: the mid-tree outer cascade (outer Δ taps
    // with typed null extensions crossing executor JVMs) and the
    // outer-last tree's chained agg/extrema (null-group flips through
    // the downstream stores)
    "q211_midtree_outer_ivm", "q212_outer_tree_agg",
    // round-12 additions: the outer-tree SQL rewrites (q213 outer-last,
    // q215 mid-outer) resolve store scans in-plan under a
    // multi-executor scheduler — exactly the shape this gate exists
    // for — and q214 chains agg/extrema through BOTH outer levels'
    // flip waves (typed null-extension deltas into two downstream
    // stores across executor JVMs)
    "q213_outer_tree_serve", "q214_midtree_outer_agg",
    "q215_midtree_outer_serve",
    // ... and q216: the CDC drain into a mid-outer tree (streaming
    // micro-batches cascading outer Δ taps + per-batch StoreSetRef
    // commits + a pinned final read, all across executor JVMs)
    "q216_cdc_midtree_outer")
  private val sfDir = "/root/testdata/sf0.001"

  test("local-cluster answers equal local answers for the parity set") {
    val outDir = tmpDir("cluster-parity")
    val logF = java.nio.file.Files.createTempFile("cluster-parity", ".log")
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val pb = new ProcessBuilder(
      javaBin, "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.ClusterParityDemo", sfDir, outDir, names.mkString(","))
    pb.environment().put("SPARK_HOME", "/opt/spark")
    pb.environment().put("SPARK_SCALA_VERSION", "2.13")
    pb.redirectErrorStream(true)
    pb.redirectOutput(logF.toFile)
    val p = pb.start()
    // 600 s sufficed through round 11 (53 queries); the round-12 build
    // added q213-q216 — four multi-wave tree-IVM scenario gates — and
    // the demo ran past 600 s on this box (the one inherited-state
    // failure this optimization round found: 708/709). The budget
    // follows the set it times.
    val done = p.waitFor(1500, java.util.concurrent.TimeUnit.SECONDS)
    val log = java.nio.file.Files.readString(logF)
    if (!done) { p.destroyForcibly(); fail(s"parity demo timed out; tail:\n${log.takeRight(2000)}") }
    assert(p.exitValue() == 0,
      s"parity demo exit ${p.exitValue()}; tail:\n${log.takeRight(3000)}")

    names.foreach { name =>
      val cluster = spark.read.parquet(s"$outDir/$name")
        .toJSON.collect().sorted.toSeq
      val local = SparkEntry.queries(name)(spark, sfDir)
        .toJSON.collect().sorted.toSeq
      assert(cluster == local, s"$name differs between local-cluster and local")
    }
  }
}
