package graft

import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic clustered vectors: 10 cluster centers, 30 members each
    * with small noise → high intra-cluster cosine. */
  lazy val corpus = {
    val rnd = new scala.util.Random(11)
    val dim = 64
    val centers = Seq.fill(10)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    (0 until 300).map { i =>
      val c = centers(i % 10)
      val v = c.zipWithIndex.map { case (x, _) => x + rnd.nextGaussian().toFloat * 0.1f }
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("cosine column agrees with scala computation") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
    val got = df.select(SimilarityOps.cosine($"a", $"b")).head().getDouble(0)
    val expected = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - expected) < 1e-12)
  }

  test("brute-force top-k returns same-cluster neighbors first") {
    val queries = corpus.filter($"vec_id" < 2)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val top = SimilarityOps.bruteForceTopK(corpus, queries, k = 5)
    val rows = top.collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val q = r.getLong(0); val hit = r.getLong(1)
      assert(hit % 10 == q % 10, s"query $q matched off-cluster $hit")
      assert(r.getDouble(2) > 0.9)
    }
  }

  test("LSH ANN recall >= 0.6 vs brute force at 16x bucket reduction") {
    val queries = corpus.filter($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val exact = SimilarityOps.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilarityOps.lshTopK(corpus, queries, k = 5, bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall=$recall")
    // approximate hits must still be genuinely similar (same cluster)
    approx.foreach { case (q, hit) => assert(hit % 10 == q % 10) }
  }

  test("multi-probe LSH: strictly higher recall than single-probe, no extra index") {
    val queries = corpus.filter($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val exact = SimilarityOps.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(got: Set[(Long, Long)]) =
      exact.intersect(got).size.toDouble / exact.size
    val single = recallOf(SimilarityOps.lshTopK(corpus, queries, k = 5,
      bits = 8).collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    val multi4 = SimilarityOps.lshTopKMultiProbe(corpus, queries, k = 5,
      bits = 8, probes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rMulti = recallOf(multi4)
    info(f"single-probe recall=$single%.3f multi-probe(4) recall=$rMulti%.3f")
    assert(rMulti >= single,
      s"multi-probe must never lose recall ($rMulti < $single)")
    assert(rMulti >= 0.8, s"multi-probe recall=$rMulti")
    multi4.foreach { case (q, hit) => assert(hit % 10 == q % 10) }
    // probes=0 degenerates to exactly the single-probe candidate set
    val zero = SimilarityOps.lshTopKMultiProbe(corpus, queries, k = 5,
      bits = 8, probes = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val singleSet = SimilarityOps.lshTopK(corpus, queries, k = 5, bits = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(zero == singleSet)
  }

  test("cosineNearDups finds intra-cluster pairs only") {
    val pairs = SimilarityOps.cosineNearDups(corpus.limit(50), threshold = 0.9)
    val rows = pairs.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 10 == r.getLong(1) % 10)
      assert(r.getDouble(2) >= 0.9)
    }
  }

  test("IVF ANN on clustered vectors: high recall at nprobe/nlist cost cut") {
    val queries = corpus.filter($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val exact = SimilarityOps.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityOps.ivfTopK(corpus, queries, k = 5, nlist = 12, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    info(f"IVF recall=$recall%.3f")
    assert(recall >= 0.8, s"recall=$recall")
    ivf.foreach { case (q, hit) => assert(hit % 10 == q % 10) } // same cluster
  }

  test("Lloyd-trained IVF centroids keep full recall with fewer probes") {
    val queries = corpus.filter($"vec_id" < 20)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val exact = SimilarityOps.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val trained = SimilarityOps.trainIvfCentroids(corpus, nlist = 12, iters = 2)
    val seeds = SimilarityOps.seedCentroids(corpus, nlist = 12)
    assert(trained.map(_._2) != seeds.map(_._2), "training changed nothing")
    val ivf = SimilarityOps.ivfTopK(corpus, queries, k = 5, nlist = 12,
        nprobe = 2, trained = Some(trained))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    info(f"trained-IVF recall=$recall%.3f at nprobe=2")
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("persisted IVF index: probe equals direct ivfTopK, scan is pruned and shuffle-free") {
    val root = tmpDir("ivfindex")
    val index = SimilarityOps.buildIvfIndex(corpus, root, nlist = 8)
    // reload round-trip: centroids survive persistence
    val loaded = SimilarityOps.loadIvfIndex(spark, root)
    assert(loaded.centroids == index.centroids)
    val queries = corpus.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val direct = SimilarityOps.ivfTopK(corpus, queries, k = 5, nlist = 8,
      nprobe = 2, trained = Some(index.centroids))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val indexed = SimilarityOps.ivfTopKIndexed(loaded, queries, k = 5, nprobe = 2)
    val got = indexed.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == direct, "indexed probe diverged from direct IVF scoring")
    // plan gates: the scan reads only the probed cell directories
    // (partition pruning) and corpus vectors never shuffle — the only
    // allowed exchange is the tiny per-query top-k rank. (AQE's toString
    // repeats the plan under "== Initial Plan ==" — gate the final one.)
    val full = indexed.queryExecution.executedPlan.toString
    val plan = full.split("== Initial Plan ==")(0)
    assert(plan.contains("PartitionFilters") &&
      plan.contains("cell"), s"scan not partition-pruned:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, // only the per-query rank may repartition
      s"probe plan shuffles corpus data ($exchanges exchanges):\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "queries side was not broadcast")
  }

  test("incremental IVF append: probe equals a rebuild over the grown corpus") {
    val first = corpus.filter($"vec_id" % 3 =!= 2)
    val growth1 = corpus.filter($"vec_id" % 3 === 2 && $"vec_id" < 60)
    val growth2 = corpus.filter($"vec_id" % 3 === 2 && $"vec_id" >= 60)
    val root = tmpDir("ivfappend")
    val index = SimilarityOps.buildIvfIndex(first, root, nlist = 8)
    SimilarityOps.appendToIvfIndex(index, growth1)
    SimilarityOps.appendToIvfIndex(index, growth2)
    // all appended rows landed, assigned to frozen centroids
    assert(spark.read.parquet(index.cellsPath).count() == corpus.count())
    val queries = corpus.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val grown = SimilarityOps.ivfTopKIndexed(index, queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    // rebuild from scratch with the SAME centroids over the full corpus
    val root2 = tmpDir("ivfappend-rebuild")
    SimilarityOps.assignCells(corpus, index.centroids)
      .write.mode("overwrite").partitionBy("cell").parquet(s"$root2/cells")
    val rebuilt = SimilarityOps.IvfIndex(root2, index.centroids)
    val want = SimilarityOps.ivfTopKIndexed(rebuilt, queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(grown == want, "appended index diverged from rebuild")
  }

  test("banded LSH near-dups reach >=0.85 recall vs brute force on real embeddings") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val exact = SimilarityOps.bruteForceNearDups(emb, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilarityOps.cosineNearDups(emb, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // LSH may only MISS pairs, never invent them (verification is exact)
    assert(approx.subsetOf(exact))
    val recall = approx.size.toDouble / exact.size
    info(f"recall=$recall%.3f (${approx.size}/${exact.size})")
    assert(recall >= 0.85, s"recall=$recall")
  }
}
