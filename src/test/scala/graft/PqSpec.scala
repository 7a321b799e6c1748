package graft

import org.apache.spark.sql.functions._

import graft.ops.SimilarityOps

class PqSpec extends SparkSpec {
  import spark.implicits._

  /** 240 vectors in 12 tight clusters (16-dim): PQ codes capture cluster
    * structure, so ADC candidates contain the true neighbors. */
  lazy val corpus = {
    val rnd = new scala.util.Random(11L)
    (0 until 240).map { i =>
      val c = i % 12
      val center = Array.tabulate(16)(j =>
        math.sin((c * 16 + j).toDouble).toFloat * 3f)
      (i.toLong, center.map(x => x + rnd.nextGaussian().toFloat * 0.15f).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("codes are within [0, ksub) and deterministic") {
    val cb = SimilarityOps.seedPqCodebooks(corpus, m = 4, ksub = 16)
    assert(cb.dsub == 4 && cb.codewords.size == 4 &&
      cb.codewords.forall(_.size == 16))
    val codes = SimilarityOps.pqEncode(corpus, cb)
      .select("pq_codes").collect().map(_.getSeq[Byte](0))
    assert(codes.forall(c => c.length == 4 && c.forall(b => b >= 0 && b < 16)))
    val codes2 = SimilarityOps.pqEncode(corpus, cb)
      .select("pq_codes").collect().map(_.getSeq[Byte](0))
    assert(codes.map(_.toList).toSeq == codes2.map(_.toList).toSeq)
  }

  test("ADC score equals the manual table-sum") {
    val cb = SimilarityOps.seedPqCodebooks(corpus, m = 4, ksub = 16)
    val q = corpus.filter($"vec_id" === 0L)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val qv = q.select("q_vec").head().getSeq[Float](0)
    val got = SimilarityOps.pqEncode(corpus.filter($"vec_id" === 7L), cb)
      .crossJoin(q.withColumn("__table", SimilarityOps.pqAdcTable($"q_vec", cb)))
      .select(graft.functions.PqAdcScore($"pq_codes", $"__table", cb.ksub))
      .head().getDouble(0)
    val codes = SimilarityOps.pqEncode(corpus.filter($"vec_id" === 7L), cb)
      .select("pq_codes").head().getSeq[Byte](0)
    val want = (0 until cb.m).map { j =>
      val cw = cb.codewords(j)(codes(j).toInt)._2
      val qs = qv.slice(j * cb.dsub, (j + 1) * cb.dsub)
      qs.zip(cw).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble }
    }.sum
    assert(math.abs(got - want) < 1e-9, s"$got vs $want")
  }

  test("trained PQ top-k recall vs brute force is high on clustered data") {
    val queries = corpus.filter($"vec_id" < 6)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val cb = SimilarityOps.trainPqCodebooks(corpus, m = 4, ksub = 16, iters = 2)
    val exact = SimilarityOps.bruteForceTopK(corpus, queries, k = 5)
      .select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilarityOps.pqTopK(corpus, queries, k = 5, m = 4,
        ksub = 16, overfetch = 6, trained = Some(cb))
      .select("q_id", "vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
  }

  test("plan gate: coarse scan reads codes only — no vectors, no sort") {
    val queries = corpus.filter($"vec_id" < 6)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val df = SimilarityOps.pqTopK(corpus, queries, k = 5, m = 4)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("pq_adc_score"), s"ADC kernel expected in: $p")
    assert(p.contains("collect_top_k"), "bounded-heap top-k expected")
    assert(!p.contains("Window"), "no window sort in either stage")
  }

  test("IVF-PQ recall vs brute force is high on clustered data") {
    val queries = corpus.filter($"vec_id" < 12)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val exact = SimilarityOps.bruteForceTopK(corpus, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimilarityOps.ivfPqTopK(corpus, queries, k = 5,
        nlist = 12, nprobe = 4, m = 4, ksub = 16, overfetch = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.85, s"IVF-PQ recall $recall too low")
  }

  test("IVF-PQ plan gate: cell-keyed join, ADC kernel, no corpus crossJoin") {
    val queries = corpus.filter($"vec_id" < 4)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val df = SimilarityOps.ivfPqTopK(corpus, queries, k = 5,
      nlist = 12, nprobe = 4, m = 4)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("pq_adc_score"), s"ADC kernel expected in: $p")
    assert(p.contains("collect_top_k"), "bounded-heap top-k expected")
    // the coarse stage must be the cell equi-join, not a nested-loop scan
    assert(!p.contains("BroadcastNestedLoopJoin"), s"crossJoin leaked into: $p")
    assert(!p.contains("Window"), "no window sort in either stage")
  }

  test("codebook save/load round-trips bit-exactly; encode is train-once/encode-many") {
    val trained = SimilarityOps.trainPqCodebooks(corpus, m = 4, ksub = 16, iters = 1)
    val path = tmpDir("pq-cb") + "/codebooks"
    SimilarityOps.savePqCodebooks(spark, trained, path)
    val loaded = SimilarityOps.loadPqCodebooks(spark, path)
    assert(loaded.m == trained.m && loaded.ksub == trained.ksub &&
      loaded.dsub == trained.dsub)
    assert(loaded.codewords == trained.codewords, "floats must round-trip bit-exactly")
    // encode-many with the persisted codebooks == encode with the trained ones
    def codes(cb: SimilarityOps.PqCodebooks) =
      SimilarityOps.pqEncode(corpus, cb)
        .select($"vec_id", $"pq_codes").orderBy($"vec_id").collect().toSeq
    assert(codes(loaded) == codes(trained))
  }

  test("encode kernel equals the literal sq_dist argmin formulation (bit-for-bit)") {
    // the codegen'd PqEncodeCodes replaced an array_min(struct(sq_dist_f,
    // cid)) literal tree; this pins the equivalence the swap relies on
    graft.functions.SqDistF.register(spark)
    val cb = SimilarityOps.seedPqCodebooks(corpus, m = 4, ksub = 16)
    val viaTree = corpus.withColumn("pq_codes",
      array((0 until cb.m).map { j =>
        array_min(array(cb.codewords(j).map { case (cid, c) =>
          struct(
            graft.functions.SqDistF(
              slice($"embedding", j * cb.dsub + 1, cb.dsub),
              array(c.map(lit): _*).cast("array<float>")).as("d"),
            lit(cid).as("cid"))
        }: _*)).getField("cid").cast("tinyint")
      }: _*))
      .select($"vec_id", $"pq_codes").orderBy($"vec_id").collect().toSeq
    val viaKernel = SimilarityOps.pqEncode(corpus, cb)
      .select($"vec_id", $"pq_codes").orderBy($"vec_id").collect().toSeq
    assert(viaKernel == viaTree)
  }

  test("ADC table kernel equals the literal dot_product formulation (bit-for-bit)") {
    val cb = SimilarityOps.seedPqCodebooks(corpus, m = 4, ksub = 16)
    val qs = corpus.filter($"vec_id" < 6)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val viaTree = qs.withColumn("t",
      array((for (j <- 0 until cb.m; (_, c) <- cb.codewords(j)) yield
        graft.functions.DotProductF(
          slice($"q_vec", j * cb.dsub + 1, cb.dsub),
          array(c.map(lit): _*).cast("array<float>"))): _*))
      .select($"q_id", $"t").orderBy($"q_id").collect().toSeq
    val viaKernel = qs
      .withColumn("t", SimilarityOps.pqAdcTable($"q_vec", cb))
      .select($"q_id", $"t").orderBy($"q_id").collect().toSeq
    assert(viaKernel == viaTree)
  }

  test("PQ kernels: interpreted eval equals codegen (both expression paths)") {
    // nullSafeEval (interpreted / fallback path) must match doGenCode —
    // CODEGEN_ONLY vs NO_CODEGEN factory modes run the same plan twice
    val cb = SimilarityOps.seedPqCodebooks(corpus, m = 4, ksub = 16)
    def run() = {
      val codes = SimilarityOps.pqEncode(corpus, cb)
        .select($"vec_id", $"pq_codes").orderBy($"vec_id").collect().toSeq
      val tables = corpus.filter($"vec_id" < 4)
        .select($"vec_id", SimilarityOps.pqAdcTable($"embedding", cb).as("t"))
        .orderBy($"vec_id").collect().toSeq
      (codes, tables)
    }
    val viaCodegen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val viaInterp = run()
      assert(viaInterp == viaCodegen)
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }
}
