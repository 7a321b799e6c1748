package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{CurationOps, DedupOps, MultimodalOps, SimilarityOps, TextOps}
import graft.sources.Tables

/** Driver-visible LLM-pipeline operator coverage on the `documents` and
  * `embeddings` tables: text analysis, dedup family, similarity search,
  * multimodal plumbing. SQL-expressible ops carry DuckDB oracle twins
  * (identical expression shape both sides); the hash-based ops (MinHash,
  * SimHash, LSH ANN) are rows-only — their correctness gates live in
  * ScalaTest with planted near-duplicates and recall-vs-brute-force
  * assertions.
  */
object LlmQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Token / char counting (whitespace + normalized) per doc. */
  def q22TokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id",
        TextOps.tokenCount($"text").as("n_tokens"),
        TextOps.subwordCountEstimate($"text").as("n_subwords"),
        length($"text").cast("long").as("n_chars_raw"))
      .orderBy($"doc_id")
  }

  /** Quality-score metrics per doc (C4-style cheap filters), via the
    * one-pass [[TextOps.withMetrics]] (tokenization materialized once —
    * the per-metric column functions re-tokenize 8×, measured 9× slower). */
  def q23TextQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextOps.withMetrics(Tables.load(s, dir, "documents"), "text")
      .select($"doc_id", $"n_tokens", $"punct_cnt", $"stop_cnt",
        // integer e4 fixed-point (floor(x*1e4+0.5)): same IEEE ops in any
        // engine, immune to HALF_UP-vs-C-round half-boundary skew
        floor($"avg_token_len" * 10000.0 + 0.5).as("avg_token_len_e4"),
        floor($"quality" * 10000.0 + 0.5).as("quality_e4"))
      .orderBy($"doc_id")
  }

  /** Language-ID scoring (marker n-gram heuristic) + agreement with the
    * dataset label, aggregated per labeled lang. */
  def q24LangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextOps.withMetrics(Tables.load(s, dir, "documents"), "text",
        includeLang = true)
      .groupBy($"lang", $"lang_pred")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"lang_pred")
  }

  /** Exact dedup by md5 content fingerprint: canonical doc per group. */
  def q25ExactDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    DedupOps.exactDedup(Tables.load(s, dir, "documents"), "text", "doc_id")
      .select($"doc_id", $"fingerprint", $"dup_count")
      .orderBy($"doc_id")
  }

  /** n-gram Jaccard near-dup pairs via inverted index. 2-grams over the
    * synthetic corpus's tiny vocabulary are near-universal, so the
    * stop-shingle cap (df <= 40) does real work here — exactly the guard
    * that keeps the index join sub-quadratic on a skewed real corpus. */
  def q26NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    DedupOps.ngramJaccardPairs(Tables.load(s, dir, "documents"),
        "text", "doc_id", shingleLen = 2, threshold = 0.03, maxDf = 40)
      .orderBy($"id1", $"id2")
  }

  /** EXACT set-similarity self-join (q175): every document pair with
    * 2-gram-shingle Jaccard ≥ 0.5, via
    * [[graft.ops.FuzzyJoin.jaccardSelfJoin]]'s AllPairs/PPJoin prefix
    * filtering — COMPLETE by the pigeonhole bound, unlike the
    * recall-bounded MinHash path (q27). The oracle enumerates pairs
    * from the raw inverted index with no prefix filter and no df cap,
    * so the hash gate checks that prefix filtering loses NOTHING, in
    * exact integer micro-units. */
  def q175JaccardJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // FULL corpus (the r6 `doc_id < 1500` bound is lifted): this
    // synthetic corpus draws from a ~30-word vocabulary, so even the
    // RAREST shingles have df in the hundreds and every document pair
    // shares most tokens — adversarial for any prefix filter; real
    // corpora are far sparser. The tight first-shared-token positional
    // bound plus array-intersect verification (r7) keep the unbounded
    // run inside the sweep budget where the r6 any-witness filter +
    // re-explode verification took ~118 s.
    val sets = Tables.load(s, dir, "documents")
      .select($"doc_id", TextOps.shingles($"text", 2).as("sh"))
    graft.ops.FuzzyJoin.jaccardSelfJoin(sets, "doc_id", "sh",
        minJaccardE6 = 500000L)
      .orderBy($"id1", $"id2")
  }

  /** EXACT containment self-join (q183): every ORDERED document pair
    * where ≥ 0.8 of the first document's 2-gram shingles appear in the
    * second — the asymmetric excerpt/quote/subset relation Jaccard
    * misses (a short quote inside a long article has tiny Jaccard but
    * containment ~1). Oracle = the unfiltered inverted-index
    * enumeration, so the gate proves the probe-prefix + witness-count
    * bounds lose NOTHING, in exact integer micro-units. */
  def q183ContainmentJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sets = Tables.load(s, dir, "documents")
      .select($"doc_id", TextOps.shingles($"text", 2).as("sh"))
    graft.ops.FuzzyJoin.containmentSelfJoin(sets, "doc_id", "sh",
        minContainE6 = 800000L)
      .orderBy($"id_a", $"id_b")
  }

  /** Documents plus planted exact duplicates (every 10th doc re-emitted
    * under doc_id+100000 with identical text) — shared by the dedup
    * queries so the DuckDB oracle can reproduce the exact same corpus. */
  private def withPlantedDups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")))

  /** MinHash-LSH near-dup pairs at threshold 1.0 over a planted-duplicate
    * corpus. HARD oracle: at jaccard 1.0 a pair means IDENTICAL shingle
    * sets, and identical sets provably produce identical signatures →
    * identical band hashes → guaranteed bucket collision. So the full
    * signatures→bands→buckets→verify pipeline must emit exactly the
    * identical-shingle-set pairs, which DuckDB computes directly by
    * grouping docs on their canonical (sorted) shingle set. Any bug in
    * the MinHash/banding path drops or adds a pair and breaks the hash. */
  def q27MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = withPlantedDups(Tables.load(s, dir, "documents"))
    DedupOps.minhashNearDups(docs, "text", "doc_id", threshold = 1.0)
      .orderBy($"id1", $"id2")
  }

  /** Portable 32-bit SimHash near-dup pairs (hamming <= 3) over the
    * planted-duplicate corpus. HARD oracle: per-token bits come from md5
    * hex chars (engine-independent), and the pigeonhole band join has
    * provable recall 1.0 at maxDist — so the banded plan's output must
    * equal DuckDB's brute-force all-pairs hamming join exactly. */
  def q28Simhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = withPlantedDups(Tables.load(s, dir, "documents"))
    val sims = DedupOps.simhashPortable(docs, "text", "doc_id")
    DedupOps.simhashNearDups(sims, "doc_id", maxDist = 3, sigBits = 32)
      .select($"id1", $"id2", $"hamming".cast("long").as("hamming"))
      .orderBy($"id1", $"id2")
  }

  /** Brute-force cosine top-k: first 3 vectors as queries over the corpus. */
  def q29CosineTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    SimilarityOps.bruteForceTopK(emb, queries, k = 10)
      .orderBy($"q_id", $"rank")
  }

  /** LSH-bucketed ANN. HARD oracle: the hyperplane values are embedded as
    * float literals in the oracle SQL (generated from the same seeded
    * generator), and both engines fold the projection dot product in the
    * same element order — so bucket codes, candidate sets, and ranked
    * cosines must agree exactly. Recall-vs-brute-force is additionally
    * gated in SimilarityOpsSpec. */
  def q30AnnLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    SimilarityOps.lshTopK(emb, queries, k = 5, bits = 4)
      .orderBy($"q_id", $"rank")
  }

  /** Multi-probe LSH ANN (q121): each query probes its own bucket plus
    * the flips of its `probes` least-confident hyperplane bits. HARD
    * oracle: planes are seeded float literals in BOTH engines, margins
    * fold in the same element order, and the (margin, plane-index) sort
    * is the identical lexicographic tie-break — so the probed bucket
    * sets, candidate sets, and ranked cosines must agree exactly.
    * Recall-vs-single-probe is additionally gated in SimilarityOpsSpec
    * (measured 0.71 → 0.97 at probes=4 on the clustered fixture). */
  def q121AnnMultiprobe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    SimilarityOps.lshTopKMultiProbe(emb, queries, k = 5, bits = 8,
        probes = 4)
      .orderBy($"q_id", $"rank")
  }

  /** Int8-quantized ANN with exact re-rank (q78): coarse candidates come
    * from the EXACT integer dot over symmetric int8 quantization (×
    * per-vector scales), so the candidate cut is engine-reproducible; the
    * oracle replays quantize → integer coarse top-20 → exact-cosine top-5
    * bit-for-bit. Covers SimilarityOps.quantizeInt8 + int8TopK end to
    * end through the driver gate. */
  def q78AnnInt8(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    SimilarityOps.int8TopK(emb, queries, k = 5, overfetch = 4)
      .orderBy($"q_id", $"rank")
  }

  /** Product-quantized ANN (q79): vectors encode to m=8 sub-codeword
    * bytes (32× compression at dim 64), the coarse pass scores via
    * per-query ADC table lookups, exact cosine re-ranks the top-20. The
    * codebooks are the deterministic every-7th-vector seeds (same
    * convention as the IVF oracle), so DuckDB replays seed → encode →
    * ADC → re-rank bit-for-bit; Lloyd-refined codebooks are gated in
    * PqSpec. */
  def q79AnnPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    SimilarityOps.pqTopK(emb, queries, k = 5, m = 8, ksub = 16, overfetch = 4)
      .orderBy($"q_id", $"rank")
  }

  /** IVF-PQ composed ANN (q88): the coarse quantizer restricts each
    * query to its 4 nearest of 16 cells, PQ ADC lookups score only the
    * m=8-byte codes inside those cells, exact cosine re-ranks the
    * top-20. Centroids AND codebooks are the deterministic every-7th
    * seeds, so DuckDB replays cell-assign → encode → probe → ADC →
    * re-rank bit-for-bit. */
  def q88AnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    SimilarityOps.ivfPqTopK(emb, queries, k = 5,
        nlist = 16, nprobe = 4, m = 8, ksub = 16, overfetch = 4)
      .orderBy($"q_id", $"rank")
  }

  /** Approximate query processing via deterministic sampling (q82):
    * revenue per return flag estimated from a seeded 10% Bernoulli
    * sample with the exact Horvitz-Thompson expansion. Because the
    * sample is a pure function of (seed, row key), the ESTIMATE itself
    * is hash-exact against the oracle — the sampled-aggregation pipeline
    * is gated end to end, not just "within error bounds". */
  def q82SampledAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
      .withColumn("rowkey",
        concat_ws("-", $"l_orderkey".cast("string"),
          $"l_linenumber".cast("string")))
      .withColumn("e4",
        floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 10000.0 + 0.5)
          .cast("long"))
    CurationOps.seededSample(li, "rowkey", rate = 0.1, seed = "q82")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_sampled"), sum($"e4").as("sum_e4"))
      .select($"l_returnflag", $"n_sampled", $"sum_e4",
        round($"sum_e4".cast("double") * lit(CurationOps.inverseRate(0.1)))
          .cast("long").as("est_e4"))
      .orderBy($"l_returnflag")
  }

  /** Reproducible train/val/test corpus split (q87): every document is
    * deterministically assigned by md5(seed:doc_id) against cumulative
    * 80/10/10 boundaries, then per-split counts and char volumes are
    * aggregated. The assignment is a pure scan-projection function —
    * hash-exact on every engine, stable under corpus growth — so the
    * oracle replays it literally (same hex thresholds). */
  def q87HashSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CurationOps.hashSplit(
        Tables.load(s, dir, "documents"),
        "doc_id", LlmQueries.q87Splits, seed = "q87")
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy($"split")
  }

  /** Token-budget mixture assembly (q127): four sources enter the mix
    * with explicit char budgets — two capped below their mass (sampled
    * at budget/T_d), one granted more than it has (taken whole), the
    * rest of the corpus excluded. The kept set is the deterministic
    * md5(seed:doc_id) Bernoulli selection, so the oracle replays the
    * entire decision — totals, rates, thresholds, hex comparison —
    * literally. */
  def q127BudgetMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CurationOps.budgetMix(
        Tables.load(s, dir, "documents"),
        sourceCol = "source", idCol = "doc_id", weightCol = "n_chars",
        budgets = Map("src0" -> 4000L, "src1" -> 1000000L,
          "src2" -> 2000L, "src3" -> 6000L),
        seed = "q127")
      .select($"doc_id", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  /** SemDeDup over the embeddings table (q81): coarse cells via the
    * deterministic seed centroids, exact cosine only within a cell, and
    * a vector is kept iff no smaller-id same-cell neighbor has cosine ≥
    * threshold. The whole decision — assignment tie-breaks included — is
    * replayed by the oracle. */
  def q81SemDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    SimilarityOps.semDedup(Tables.load(s, dir, "embeddings"),
        threshold = 0.9, nlist = 16)
      .orderBy($"vec_id")
  }

  /** Bigram-LM quality scoring (q80): every doc scored by mean ln p of
    * its token transitions under the corpus's own add-one bigram model
    * (the CCNet-perplexity-filter shape). The per-doc sum folds the
    * pos-ordered term list sequentially, so 4-decimal rounding is
    * engine-stable and DuckDB replays counts → smoothing → fold exactly. */
  def q80LmScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextOps.bigramLmScores(Tables.load(s, dir, "documents"), "text", "doc_id")
      .orderBy($"doc_id")
  }

  /** TF-IDF keyword extraction (q157): top-3 most characteristic terms
    * per document over a bounded sub-corpus. The window ranks by the
    * ROUNDED score then term, so DuckDB's ln and Java's ln agree on
    * order even at last-ulp differences — same determinism convention
    * as q80. */
  def q157Tfidf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextOps.tfidfTopTerms(
      Tables.load(s, dir, "documents").filter($"doc_id" < 100),
      "text", "doc_id", topK = 3)
      .orderBy($"doc_id", $"rank")
  }

  /** Multimodal: synthesize REAL media containers (ImageIO-encoded
    * PNG/JPEG/GIF, canonical WAV, stub video bytes), then run the
    * partition-batched extractor whose dims/format come from a REAL
    * magic-bytes header parse. The oracle reproduces the deterministic
    * dimension formulas — a header-parser bug yields wrong dims and
    * breaks the hash. */
  def q31Multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = MultimodalOps.synthesizeFromText(
      Tables.load(s, dir, "documents"), "doc_id", "text")
    MultimodalOps.extractFeatures(media).toDF()
      .select($"media_id", $"kind", $"width", $"height", $"format",
        $"n_frames".cast("long").as("n_frames"))
      .orderBy($"media_id")
  }

  /** Context-window chunking: token-bounded overlapping chunks, exploded
    * with positions. Chunking is a projection — zero shuffle at any scale. */
  def q34Chunking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id",
        posexplode(TextOps.chunk($"text", chunkTokens = 32, overlap = 8)))
      .select($"doc_id", $"pos".cast("long").as("chunk_idx"),
        $"col".as("chunk"),
        TextOps.tokenCount($"col").as("chunk_tokens"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** PII redaction: plant synthetic emails/phones/URLs, redact, verify by
    * oracle running the identical construction + regexes. */
  def q35Redact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .withColumn("dirty", concat($"text",
        lit(" contact user"), $"doc_id", lit("@example.com or http://ex.com/"),
        $"doc_id", lit(" tel 555-123-4567 ip 10.0.0.1")))
      .select($"doc_id", TextOps.redactPii($"dirty").as("clean"))
      .orderBy($"doc_id")
  }

  /** Corpus length percentiles per lang (exact linear-interpolation
    * percentile ≡ DuckDB quantile_cont). Exact percentile needs the full
    * sorted group — fine for per-lang stats; approx_percentile is the
    * streaming/100TB variant (not oracle-comparable). */
  def q36Percentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .groupBy($"lang")
      .agg(
        floor(expr("percentile(n_chars, 0.5)") * 10000.0 + 0.5).as("p50_e4"),
        floor(expr("percentile(n_chars, 0.9)") * 10000.0 + 0.5).as("p90_e4"),
        count(lit(1)).as("n"))
      .orderBy($"lang")
  }

  /** Deterministic stratified sampling: hash-free doc_id modulus with
    * per-stratum rates (en kept at ~10%, others ~30%) — reproducible
    * across engines and runs, no rand() in the plan. */
  def q37StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .filter($"doc_id" % 97 <
        when($"lang" === "en", 10).otherwise(29))
      .groupBy($"lang").agg(count(lit(1)).as("n_sampled"))
      .orderBy($"lang")
  }

  /** Fuzzy string matching (levenshtein) — the alias-free fallback for the
    * site-name harmonization tier. All nation-name pairs within edit
    * distance 5, over a 25-row broadcast dimension where a cross join is
    * the RIGHT plan. At corpus scale this shape is banned; the blocked
    * equivalent is [[graft.ops.FuzzyJoin.selfEditDistanceJoin]] (PassJoin
    * segment candidates + banded verify, gated by q160). */
  def q38FuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = Tables.load(s, dir, "nation").select($"n_name".as("name1"))
    val b = Tables.load(s, dir, "nation").select($"n_name".as("name2"))
    a.crossJoin(broadcast(b))
      .filter($"name1" < $"name2")
      .withColumn("dist", levenshtein($"name1", $"name2").cast("long"))
      .filter($"dist" <= 5)
      .orderBy($"name1", $"name2")
  }

  /** As-of join (TemporalJoins): every event gets the user's most recent
    * purchase value at-or-before its timestamp. Oracle = DuckDB's native
    * ASOF LEFT JOIN — our union+carry-forward window must agree exactly. */
  def q44AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events").withColumn("ts_us", unix_micros($"ts"))
    val left = ev.select($"user_id", $"event_id", $"ts_us")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_us".as("p_ts_us"), $"value")
    graft.ops.TemporalJoins.asOfJoin(left, purchases,
        keys = Seq("user_id"), leftTs = "ts_us", rightTs = "p_ts_us",
        valueCols = Seq("value"))
      .orderBy($"user_id", $"event_id")
  }

  /** Range join (TemporalJoins): clicks whose value falls inside a
    * [signup.value, signup.value+50] interval of the same user — the
    * bucketized equi-join formulation; oracle is the plain inequality
    * join (identical result set, quadratic plan DuckDB can afford). */
  def q45RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"value".as("click_value"))
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"event_id".as("signup_id"),
        $"value".as("lo"), ($"value" + 50.0).as("hi"))
    graft.ops.TemporalJoins.rangeJoin(clicks, "click_value", signups,
        "lo", "hi", keys = Seq("user_id"), bucketWidth = 50.0)
      .select($"user_id", $"click_id", $"signup_id", $"click_value", $"lo", $"hi")
      .orderBy($"user_id", $"click_id", $"signup_id")
  }

  /** SpaceSaving heavy hitters over corpus tokens. Capacity 512 >> the
    * synthetic vocabulary, so the sketch is provably exact here and the
    * DuckDB exact count oracle applies; the approximation regime is
    * exercised in SpaceSavingSpec. */
  def q46HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = Tables.load(s, dir, "documents")
      .select(explode(TextOps.tokens($"text")).as("tok"))
      .as[String]
    toks.select(graft.functions.SpaceSaving.topK(512).name("hh"))
      .withColumn("h", explode($"hh"))
      .select($"h.item".as("token"), $"h.count".as("n"))
      .orderBy($"n".desc, $"token")
      .limit(20)
  }

  /** Embedding-cosine near-dup pairs, exact (brute force with the fused
    * native expression) — oracle-checked; the banded-LSH variant with the
    * same output contract is recall-gated in SimilarityOpsSpec and
    * driver-gated in its guaranteed-recall regime by [[q119BandedNearDups]]. */
  def q52CosineNearDups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    SimilarityOps.bruteForceNearDups(
        Tables.load(s, dir, "embeddings"), threshold = 0.4)
      .orderBy($"id1", $"id2")
  }

  /** The SCALE-PATH near-dup pipeline (banded sign-LSH candidates →
    * exact-cosine verification), driver-gated in a GUARANTEED-recall
    * regime: exact duplicate vectors are planted (vec_id+1e6 copies of
    * the first 50), and at threshold 0.9 the only qualifying pairs are
    * those identical copies — measured max natural pairwise cosine is
    * 0.51 at sf0.01 / 0.60 at sf0.1, a ≥0.3 margin. Identical vectors
    * produce identical hyperplane signs in EVERY band, so banding can
    * never miss them; the DuckDB all-pairs oracle therefore gates the
    * full hash→band→join→verify pipeline exactly, while q52 stays the
    * recall oracle for the probabilistic regime. No CartesianProduct:
    * candidates come from band-code equi-joins (the global plan gate
    * covers this query). */
  def q119BandedNearDups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings").select($"vec_id", $"embedding")
    val planted = emb.filter($"vec_id" < 50)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    // 8-bit bands: identical vectors collide at ANY band width, so the
    // exact regime keeps 100% recall while candidate volume drops 16×
    // vs the recall-tuned 4-bit default (~n²/2^b per band) — band width
    // is the knob that scales this operator to corpus size. Wider codes
    // help further only until the per-vector hyperplane-projection cost
    // (bits × bands inlined dot products) dominates; 8×8 is the measured
    // sweet spot at this dim.
    SimilarityOps.cosineNearDups(emb.unionByName(planted), threshold = 0.9,
        bitsPerBand = 8, bands = 8)
      .orderBy($"id1", $"id2")
  }

  /** IVF ANN. HARD oracle: the stride-sampled seed centroids are
    * themselves SQL-expressible (row_number over vec_id order), so DuckDB
    * reproduces the full assign→probe→score→rank pipeline: cell argmax
    * with (cos, cid) tie-break, top-nprobe probes, exact cosine on probed
    * cells. Recall-vs-brute-force is additionally gated in
    * SimilarityOpsSpec. */
  def q53AnnIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    SimilarityOps.ivfTopK(emb, queries, k = 5, nlist = 16, nprobe = 4)
      .orderBy($"q_id", $"rank")
  }

  /** Duplicate clustering: the q26 near-dup pairs collapsed into
    * connected components, each doc labeled with its cluster id (min doc
    * id reachable), cluster size, and canonical-survivor flag. Oracle =
    * DuckDB recursive-CTE transitive closure over the identical pair
    * list — any propagation bug (dropped edge, early convergence) yields
    * different cluster ids and breaks the hash. */
  def q59DupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = DedupOps.ngramJaccardPairs(Tables.load(s, dir, "documents"),
      "text", "doc_id", shingleLen = 2, threshold = 0.03, maxDf = 40)
    DedupOps.dupClusters(pairs)
      .select($"node".as("doc_id"), $"cluster_id", $"cluster_size",
        $"is_canonical".cast("long").as("is_canonical"))
      .orderBy($"doc_id")
  }

  /** Alternating large-star/small-star connected components (q153):
    * the O(log n)-round CC variant over the same near-dup edge list as
    * q59 — the labels must EQUAL the min-label/recursive-CTE answer
    * exactly (both compute component minimum), which is what lets one
    * oracle gate two different distributed algorithms. */
  def q153CcAlternating(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = DedupOps.ngramJaccardPairs(Tables.load(s, dir, "documents"),
      "text", "doc_id", shingleLen = 2, threshold = 0.03, maxDf = 40)
    DedupOps.connectedComponentsAlternating(pairs)
      .select($"node".as("doc_id"), $"label".as("cluster_id"))
      .orderBy($"doc_id")
  }

  /** Benchmark decontamination: docs with doc_id % 50 == 7 act as the
    * "eval set"; every other doc is flagged iff it shares a 5-gram with
    * that set. Oracle computes the identical membership on string
    * 5-grams — the engine's xxhash64 gram keys must induce exactly the
    * same contaminated set (full-64-bit universe: collision-free here). */
  def q60Decontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    val bench = docs.filter($"doc_id" % 50 === 7)
      .select($"text".as("bench_text"))
    DedupOps.contaminationFlags(docs.filter($"doc_id" % 50 =!= 7),
        "text", "doc_id", bench, "bench_text", n = 5)
      .select($"doc_id", $"is_contaminated".cast("long").as("is_contaminated"))
      .orderBy($"doc_id")
  }

  /** BM25 lexical ranking of the corpus against a fixed query. e4
    * quantization AFTER the fixed-order per-term fold keeps the float
    * math engine-portable (grouped sums would not be). */
  def q63Bm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextOps.bm25(Tables.load(s, dir, "documents"), "text", "doc_id",
        terms = Seq("spark", "query", "fast"))
      .select($"doc_id", $"doc_len",
        floor($"score" * 10000.0 + 0.5).as("score_e4"))
      .orderBy($"doc_id")
  }

  /** Maintained inverted index + BM25 serving (q190): the q63 ranking
    * kept warm through a document CDC stream — two insert batches, a
    * takedown wave (per-term df, N, and avgdl ALL shift), a replayed
    * takedown (no-op), a whole-index compaction, then an edit wave
    * (−old +new under one batch id) that ADDS the query term 'spark'
    * to some docs — and finally served entirely from the maintained
    * postings/doc-length state, never re-reading the corpus. The serve
    * probe must partition-prune the postings store by term key
    * (in-query plan require). Oracle = the q63 SQL over the NET
    * corpus (takedowns removed, edits applied). */
  /** The q190/q193 index scenario: two insert batches, a takedown wave,
    * a replayed takedown, a whole-index compaction, an edit wave. */
  private def cdcTextIndex(s: SparkSession, dir: String,
                           tag: String): graft.ops.IncrementalTextIndex.Stores = {
    import s.implicits._
    import graft.ops.IncrementalTextIndex
    val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
    val st = IncrementalTextIndex.stores(s,
      java.nio.file.Files.createTempDirectory(tag).toString, "doc_id")
    IncrementalTextIndex.appendDelta(st,
      docs.filter($"doc_id" % 3 =!= 2), "text", 0L)
    IncrementalTextIndex.appendDelta(st,
      docs.filter($"doc_id" % 3 === 2), "text", 1L)
    val takedown = docs.filter($"doc_id" % 7 === 1)
      .withColumn("__delta", lit(-1L))
    IncrementalTextIndex.appendDelta(st, takedown, "text", 2L, Some("__delta"))
    IncrementalTextIndex.appendDelta(st, takedown, "text", 2L, Some("__delta"))
    IncrementalTextIndex.compact(st)
    val editable = docs.filter($"doc_id" % 11 === 3 && $"doc_id" % 7 =!= 1)
    val edit = editable.select($"doc_id", $"text", lit(-1L).as("__delta"))
      .unionByName(editable.select($"doc_id",
        concat($"text", lit(" spark")).as("text"), lit(1L).as("__delta")))
    IncrementalTextIndex.appendDelta(st, edit, "text", 3L, Some("__delta"))
    st
  }

  def q190IncTextIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.IncrementalTextIndex
    val st = cdcTextIndex(s, dir, "q190idx")
    val servedF = IncrementalTextIndex.bm25(st, Seq("spark", "query", "fast"))
    val plan = servedF.queryExecution.executedPlan.toString
    require("PartitionFilters: \\[[^\\]]*prefix[^\\]]*\\]".r
        .findFirstIn(plan).isDefined,
      "q190: the postings probe must carry a prefix partition filter")
    servedF.select($"doc_id", $"doc_len",
        floor($"score" * 10000.0 + 0.5).as("score_e4"))
      .orderBy($"doc_id")
  }

  /** Top-k search over the maintained index (q193): the q190 scenario
    * served through [[graft.ops.IncrementalTextIndex.bm25TopK]] —
    * scoring restricted to docs holding a query-term posting (sound:
    * unmatched docs score exactly 0, below every match), the cut a
    * distributed heap, ranks on the quantized (score_e4, doc_id) total
    * order. The plan must show NO join against the full doc-length
    * state on the scoring path (candidates inner-join doc lengths; the
    * only full passes are the two broadcast stat aggregates). Oracle =
    * the q190 ranking's top 25. */
  def q193TextTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.IncrementalTextIndex
    val st = cdcTextIndex(s, dir, "q193idx")
    val served =
      IncrementalTextIndex.bm25TopK(st, Seq("spark", "query", "fast"), 25)
    // serve-cost gate: (N, Σdl) must come from the maintained 1-row
    // stats store — NO grouping-less aggregate over the doc-length
    // state may survive in the plan (the r8 nit: a per-serve doc-state
    // aggregate scan), and the stats store must actually be scanned
    val lp = served.queryExecution.optimizedPlan
    def scanRoots(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      p.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toUri.getPath).toSeq
            case _ => Seq.empty[String]
          }
      }.flatten
    val docScansUnderGlobalAgg = lp.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
          if a.groupingExpressions.isEmpty => scanRoots(a)
    }.flatten.filter(_.startsWith(st.docs.location))
    require(docScansUnderGlobalAgg.isEmpty,
      "q193: global BM25 stats must serve from the stats store, but a " +
        s"grouping-less aggregate still scans $docScansUnderGlobalAgg")
    require(scanRoots(lp).exists(_.startsWith(st.stats.location)),
      "q193: the maintained stats store is not read — stats fell back " +
        "to some other path")
    served.select($"doc_id", $"doc_len", $"score_e4", $"rank")
      .orderBy($"rank")
  }

  /** CDC-fed search index, streaming (q194): the q190 scenario reached
    * at stream cadence — a three-wave signed document topic (inserts;
    * late inserts; takedowns + edits as −old/+new) drained by
    * [[graft.streaming.CorpusStream.maintainTextIndexAvailableNow]] at
    * one file per micro-batch, then compacted and served from state.
    * Signed deltas commute, so the ranking is invariant to how the
    * source carves files into batches. Oracle = batch BM25 over the net
    * corpus (same as q190). */
  def q194CdcTextIndex(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.ops.IncrementalTextIndex
    val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
    val topic = java.nio.file.Files.createTempDirectory("q194topic").toString
    def emit(df: DataFrame): Unit =
      df.coalesce(1).write.mode("append").parquet(topic)
    emit(docs.filter($"doc_id" % 3 =!= 2).withColumn("__delta", lit(1L)))
    emit(docs.filter($"doc_id" % 3 === 2).withColumn("__delta", lit(1L)))
    val editable = docs.filter($"doc_id" % 11 === 3 && $"doc_id" % 7 =!= 1)
    emit(docs.filter($"doc_id" % 7 === 1).withColumn("__delta", lit(-1L))
      .unionByName(editable.select($"doc_id", $"text",
        lit(-1L).as("__delta")))
      .unionByName(editable.select($"doc_id",
        concat($"text", lit(" spark")).as("text"), lit(1L).as("__delta"))))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("__delta", LongType)))
    val root = java.nio.file.Files.createTempDirectory("q194idx").toString
    val st = IncrementalTextIndex.stores(s, s"$root/index", "doc_id")
    val nBatches = graft.streaming.CorpusStream.maintainTextIndexAvailableNow(
      s, topic, schema, st, checkpointDir = s"$root/_checkpoint",
      deltaCol = Some("__delta"), maxFilesPerTrigger = Some(1))
    require(nBatches >= 3,
      s"expected one micro-batch per wave file at least, got $nBatches")
    IncrementalTextIndex.compact(st)
    IncrementalTextIndex.bm25(st, Seq("spark", "query", "fast"))
      .select($"doc_id", $"doc_len",
        floor($"score" * 10000.0 + 0.5).as("score_e4"))
      .orderBy($"doc_id")
  }

  /** ANN over the PERSISTED IVF index (the 100 TB shape): build the
    * cell-partitioned index once into a temp dir, then answer the same
    * query batch as q53 via a partition-pruned probe — nprobe cell
    * directories scanned, queries broadcast, zero corpus shuffle. Same
    * centroids (stride-sampled seeds) as q53, so the q53 oracle applies
    * verbatim: index build + probe must together reproduce the
    * recompute-everything pipeline exactly. */
  def q64AnnIvfIndexed(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val root = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    val idx = SimilarityOps.buildIvfIndex(emb, root, nlist = 16)
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    SimilarityOps.ivfTopKIndexed(idx, queries, k = 5, nprobe = 4)
      .orderBy($"q_id", $"rank")
  }

  /** ANN over the SIGNED (deletable) IVF index (q192): q64's probe kept
    * correct through a takedown wave (vectors %5=1 retract, memberships
    * net to zero), a replayed takedown straddling a compaction (manifest
    * no-op), and a re-embed wave (%7=3: −old +new under one batch id —
    * vectors may MOVE cells). Served results must equal a fresh IVF
    * build over the net corpus with the same frozen centroids; the
    * state probe must prune to the probed cell directories (in-query
    * plan require). */
  def q192SignedIvfAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.load(s, dir, "embeddings")
    val centroids = SimilarityOps.seedCentroids(emb, 16)
    val idx = SimilarityOps.openSignedIvf(s,
      java.nio.file.Files.createTempDirectory("q192ivf").toString, centroids)
    SimilarityOps.signedIvfAppend(idx, emb.filter($"vec_id" % 3 =!= 2), 0L)
    SimilarityOps.signedIvfAppend(idx, emb.filter($"vec_id" % 3 === 2), 1L)
    val td = emb.filter($"vec_id" % 5 === 1).withColumn("__delta", lit(-1L))
    SimilarityOps.signedIvfAppend(idx, td, 2L, Some("__delta"))
    SimilarityOps.signedIvfCompact(idx)
    SimilarityOps.signedIvfAppend(idx, td, 2L, Some("__delta")) // replay
    val re = emb.filter($"vec_id" % 7 === 3 && $"vec_id" % 5 =!= 1)
    SimilarityOps.signedIvfAppend(idx,
      re.select($"vec_id", $"embedding", lit(-1L).as("__delta"))
        .unionByName(re.select($"vec_id",
          reverse($"embedding").as("embedding"), lit(1L).as("__delta"))),
      3L, Some("__delta"))
    val queries = emb.filter($"vec_id" < 8)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val res = SimilarityOps.signedIvfTopK(idx, queries, k = 5, nprobe = 4)
    val plan = res.queryExecution.executedPlan.toString
    require("PartitionFilters: \\[[^\\]]*prefix[^\\]]*\\]".r
        .findFirstIn(plan).isDefined,
      "q192: the signed-IVF probe must prune on the prefix partition")
    res.orderBy($"q_id", $"rank")
  }

  /** Time-RANGE window frame: per-user rolling 10-minute value sum. RANGE
    * frames (vs ROWS) are the event-time analytics primitive — the frame
    * is defined by the ORDER-BY value, so ties share a frame and the
    * result is order-deterministic. Values quantized to cents BEFORE the
    * windowed sum: integer sums are exact in any accumulation order. */
  def q65RangeFrame(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts_s")
      .rangeBetween(-600, Window.currentRow)
    Tables.load(s, dir, "events")
      .select($"user_id", $"event_id",
        // integer µs division, not unix_seconds: engines must truncate
        // sub-second parts identically (same pattern as q44's epoch_us)
        expr("unix_micros(CAST(ts AS TIMESTAMP)) div 1000000").as("ts_s"),
        floor($"value" * 100.0 + 0.5).as("v_cents"))
      .withColumn("rolling_10m_cents", sum($"v_cents").over(w))
      .orderBy($"user_id", $"event_id")
  }

  /** Token-stream packing: shard-parallel prefix sums assign every doc a
    * byte-exact (shard, start_off, bin, straddles) packing position.
    * Integer math end to end — the oracle must agree bit for bit. */
  def q66Pack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .select($"doc_id", TextOps.tokenCount($"text").as("n_tokens"))
    TextOps.packStream(docs, "doc_id", "n_tokens", capacity = 512, shards = 8)
      .select($"doc_id", $"shard".cast("long").as("shard"),
        $"start_off", $"bin", $"straddles".cast("long").as("straddles"))
      .orderBy($"doc_id")
  }

  /** Gopher-style repetition metrics (duplicate/top 2-gram counts) per
    * document. Integer counts only — exact across engines; the derived
    * fractions stay engine-side (float division has no exact oracle). */
  def q70Repetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CurationOps.repetitionMetrics(
        Tables.load(s, dir, "documents"), "text", "doc_id", n = 2)
      .select($"doc_id", $"total_grams", $"distinct_grams", $"top_gram_count")
      .orderBy($"doc_id")
  }

  /** Temperature-tempered domain mixture sample (alpha = 0.5, target 50%):
    * the md5-keyed keep decision and the sqrt-only rate arithmetic are
    * engine-portable, so DuckDB reproduces the exact kept set. */
  def q71TemperatureSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CurationOps.temperatureSample(Tables.load(s, dir, "documents"),
        domainCol = "source", idCol = "doc_id",
        alpha = 0.5, targetFraction = 0.5)
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  /** Epoch-7 reproducible shuffle: gates the md5 shuffle-key computation
    * and exactly-once row preservation (the physical shard/sort layout is
    * asserted in CurationOpsSpec — a SQL result can't express it). */
  def q72EpochShuffle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CurationOps.epochShuffle(Tables.load(s, dir, "documents"),
        "doc_id", epoch = 7, numShards = 8)
      .select($"doc_id", $"shuffle_key")
      .orderBy($"shuffle_key")
  }

  /** Cross-document repeated 8-token spans (exact-substring dedup
    * signal). Integer token offsets and counts — exact oracle. */
  def q73RepeatedSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    DedupOps.repeatedSpans(Tables.load(s, dir, "documents"),
        "text", "doc_id", n = 8, minDocs = 2)
      .orderBy($"doc_id", $"span_start")
  }

  /** First BPE training iteration: freq-weighted adjacent character-pair
    * counts over the corpus vocabulary, top-50. Integer counts with a
    * total tie order — exact oracle; later iterations (multi-char
    * symbols) are gated by BpeSpec's hand-computed merge sequence. */
  def q74BpePairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wf = graft.ops.BpeOps.wordFreqs(Tables.load(s, dir, "documents"), "text")
    graft.ops.BpeOps.pairCounts(graft.ops.BpeOps.initSymbols(wf))
      .select(concat($"l", $"r").as("pair"), $"cnt")
      .orderBy($"cnt".desc, $"pair".asc)
      .limit(50)
  }

  /** Two-batch VERIFIED incremental near-dedup over the planted corpus
    * (batch 1 = originals, batch 2 = the planted exact copies), through
    * the append-only bucket store end to end. At threshold 1.0 a doc is
    * rejected iff an earlier-admitted doc has the IDENTICAL shingle set
    * (bucket collision is guaranteed for identical sets, and exact-Jaccard
    * verification kills every chance band collision), so the admitted
    * flag must equal "doc_id is the smallest of its shingle-set group"
    * — which DuckDB computes directly. */
  def q77IncrementalNearDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = withPlantedDups(Tables.load(s, dir, "documents"))
    val b1 = docs.filter($"doc_id" < 100000L)
    val b2 = docs.filter($"doc_id" >= 100000L)
    // k=32/bands=8: identical sets produce identical signatures at ANY k,
    // and verification kills chance band collisions, so the smaller
    // signature changes cost only, never the admitted set. prefixChars=1:
    // 16 store partitions — per-file constants, not partition count,
    // dominate at bench scale.
    val store = new graft.sinks.AppendOnlyStore(s,
      java.nio.file.Files.createTempDirectory("q77buckets").toString,
      prefixCol = "bucket_key", prefixChars = 1)
    val a1 = DedupOps.incrementalMinhashDedupVerified(b1, "text", "doc_id",
      store, corpus = b1.limit(0), threshold = 1.0, k = 32, bands = 8)
    val a2 = DedupOps.incrementalMinhashDedupVerified(b2, "text", "doc_id",
      store, corpus = a1, threshold = 1.0, k = 32, bands = 8)
    val admitted = a1.select($"doc_id").unionByName(a2.select($"doc_id"))
      .withColumn("admitted", lit(1L))
    docs.select($"doc_id").join(admitted, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"admitted", lit(0L)).as("admitted"))
      .orderBy($"doc_id")
  }

  /** Takedown-aware incremental near-dedup (q191): the q77 pipeline on
    * the SIGNED membership store — batch 1 (even ids) admits canonicals,
    * a takedown wave retracts every admitted doc ending in 4 (their LSH
    * memberships net to zero), the store compacts, the takedown REPLAYS
    * (manifest no-op), then batch 2 (odd ids, including planted twins of
    * exactly the taken-down docs) is admitted against the LIVE store —
    * so a twin of a taken-down doc gets IN, while a twin of a surviving
    * canonical stays out. At threshold 1.0 the live set is a pure
    * function of shingle-set groups and the even/odd/takedown schedule,
    * which DuckDB computes directly. */
  def q191TakedownNearDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = withPlantedDups(Tables.load(s, dir, "documents"))
    // odd twins of the future takedown wave: the docs whose admission
    // REQUIRES the takedown to have really freed their shingle group
    val docs = base.unionByName(
      base.filter($"doc_id" % 10 === 4)
        .select(($"doc_id" + 200001L).as("doc_id"), $"text"))
    val even = docs.filter($"doc_id" % 2 === 0)
    val odd = docs.filter($"doc_id" % 2 === 1)
    val store = DedupOps.signedBucketStore(s,
      java.nio.file.Files.createTempDirectory("q191buckets").toString)
    val a1 = DedupOps.signedMinhashDedupVerified(even, "text", "doc_id",
      store, corpus = even.limit(0), threshold = 1.0, batchId = 0L,
      k = 32, bands = 8)
    val takedown = a1.filter($"doc_id" % 10 === 4)
    DedupOps.nearDupTakedown(store, takedown, "text", "doc_id", 1L,
      k = 32, bands = 8)
    graft.ops.IncrementalAgg.compact(store, DedupOps.signedBucketSpec("doc_id"))
    // replayed takedown AFTER compaction: the applied-batch manifest
    // makes it a physical no-op (double-retraction would corrupt nets)
    DedupOps.nearDupTakedown(store, takedown, "text", "doc_id", 1L,
      k = 32, bands = 8)
    val live1 = a1.filter($"doc_id" % 10 =!= 4)
    val a2 = DedupOps.signedMinhashDedupVerified(odd, "text", "doc_id",
      store, corpus = live1, threshold = 1.0, batchId = 2L,
      k = 32, bands = 8)
    docs.select($"doc_id")
      .join(live1.select($"doc_id").unionByName(a2.select($"doc_id"))
        .withColumn("live", lit(1L)), Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"live", lit(0L)).as("live"))
      .orderBy($"doc_id")
  }

  /** END-TO-END right-to-be-forgotten (q205): ONE signed document topic
    * drained in ONE AvailableNow pass
    * ([[graft.streaming.CorpusStream.maintainRtbfAvailableNow]])
    * maintains all three serving surfaces a takedown must reach — the
    * BM25 search index, the near-dup ADMISSION store (q191's), and the
    * dup-CLUSTER labels (q200's signed CC, edges derived per batch from
    * an all-live-docs membership store) — then one takedown wave
    * (doc_id ≡ 4 mod 9) must remove its docs from ALL of them at once.
    * Per doc: net liveness, admission-store liveness, served cluster
    * label (−1 when unclustered/removed), served BM25 score (−1 when
    * not served). ONE oracle over the net corpus computes all four
    * columns — shingle-set groups for admission/labels, the BM25 net
    * formula for scores. */
  def q205RtbfE2e(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import graft.ops.{IncrementalAgg, IncrementalCc, IncrementalTextIndex}
    val docs = graft.ops.Lineage.cut(
      withPlantedDups(Tables.load(s, dir, "documents")))
    val topic = java.nio.file.Files.createTempDirectory("q205topic").toString
    def emit(df: DataFrame): Unit =
      df.coalesce(1).write.mode("append").parquet(topic)
    emit(docs.filter($"doc_id" % 2 === 0).withColumn("__delta", lit(1L)))
    emit(docs.filter($"doc_id" % 2 === 1).withColumn("__delta", lit(1L)))
    emit(docs.filter($"doc_id" % 9 === 4).withColumn("__delta", lit(-1L)))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("__delta", LongType)))
    val root = java.nio.file.Files.createTempDirectory("q205").toString
    val index = IncrementalTextIndex.stores(s, s"$root/index", "doc_id")
    val admission = DedupOps.signedBucketStore(s, s"$root/admission")
    val members = DedupOps.signedBucketStore(s, s"$root/members")
    val cc = IncrementalCc.signedStores(s, s"$root/cc")
    val nBatches = graft.streaming.CorpusStream.maintainRtbfAvailableNow(
      s, topic, schema, index, admission, members, cc, lookup = docs,
      checkpointDir = s"$root/_ckpt", k = 32, bands = 8,
      maxFilesPerTrigger = Some(1))
    require(nBatches >= 3,
      s"expected one micro-batch per wave file at least, got $nBatches")
    // compaction across every store, then serve — result-invariant
    IncrementalTextIndex.compact(index)
    IncrementalAgg.compact(admission, DedupOps.signedBucketSpec("doc_id"))
    IncrementalAgg.compact(members, DedupOps.signedBucketSpec("doc_id"))
    IncrementalCc.compact(cc)
    val bm = IncrementalTextIndex.bm25(index, Seq("spark", "query", "fast"))
      .select($"doc_id",
        floor($"score" * 10000.0 + 0.5).cast("long").as("score_e4"))
    val labels = IncrementalCc.currentLabels(cc)
      .select($"node".as("doc_id"), $"label")
    val adm = DedupOps.liveMembers(admission, docs, "text", "doc_id",
        k = 32, bands = 8)
      .select($"doc_id").withColumn("admitted", lit(1L))
    docs.select($"doc_id")
      .withColumn("live",
        when($"doc_id" % 9 =!= 4, 1L).otherwise(0L))
      .join(adm, Seq("doc_id"), "left")
      .join(labels, Seq("doc_id"), "left")
      .join(bm, Seq("doc_id"), "left")
      .select($"doc_id", $"live",
        coalesce($"admitted", lit(0L)).as("admitted"),
        coalesce($"label", lit(-1L)).as("label"),
        coalesce($"score_e4", lit(-1L)).as("score_e4"))
      .orderBy($"doc_id")
  }

  /** Canonical retention after near-dup clustering — the pruning step a
    * curation pipeline actually runs: the q26/q59 edge list collapsed to
    * components, then ONE survivor per cluster picked by the
    * longest-text-then-smallest-id quality policy (every unpaired doc is
    * its own singleton and survives). Oracle = the same recursive-CTE
    * transitive closure plus a window pick, so a divergence in either the
    * cluster labels or the retention policy breaks the hash. */
  def q128CanonicalRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
    // threshold 0.1 (vs q59's 0.03): at 0.03 this synthetic corpus is ONE
    // connected component and retention would keep a single doc — 0.1
    // yields ~63 clusters (biggest 8) so the policy is actually exercised
    val pairs = DedupOps.ngramJaccardPairs(docs, "text", "doc_id",
      shingleLen = 2, threshold = 0.1, maxDf = 40)
    DedupOps.keepCanonical(docs, pairs, "doc_id",
        qualityOrder = Seq($"n_chars".desc))
      .select($"doc_id", $"cluster_id", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Quality-filter funnel with first-fail stage attribution (the CCNet /
    * RefinedWeb curation report): language keep-list, minimum length,
    * minimum token count, then a repetition gate expressed as the pure
    * integer cross-multiplication `distinct·1e6 ≥ 500000·total` (exactly
    * ratio ≥ 0.5, no float division on either engine). One corpus scan,
    * |stages|-row output, zero-drop stages reported as 0. */
  def q129FilterFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = TextOps.tokens($"text")
    CurationOps.filterFunnel(Tables.load(s, dir, "documents"), Seq(
      "1_lang_en" -> ($"lang" === "en"),
      "2_min_chars" -> ($"n_chars" >= 100),
      "3_min_tokens" -> (TextOps.tokenCount($"text") >= 20),
      "4_repetition" -> (size(array_distinct(toks)).cast("long") * 1000000L >=
        lit(500000L) * size(toks).cast("long"))))
      .orderBy($"stage")
  }

  /** Pairwise source vocabulary-overlap matrix (domain-similarity /
    * cross-source contamination report): distinct (source, token) sets,
    * inverted-index intersection counts, integer-DIV-e6 Jaccard. All
    * integer — exact oracle over the identical token sets. */
  def q130SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextOps.vocabOverlap(Tables.load(s, dir, "documents"), "source", "text")
      .orderBy($"g1", $"g2")
  }

  /** Contiguous stable-id assignment in doc_id order — the scale-safe
    * replacement for `row_number() OVER (ORDER BY ...)` (which sorts the
    * corpus in ONE reducer): range partition + local sort + two-phase
    * zipWithIndex. The oracle IS that global window — the distributed
    * enumeration must reproduce it exactly. */
  /** Sharded training-data export, gated END-TO-END: writes the real
    * 8-shard export of `documents` to a scratch dir (one file per shard,
    * manifest JSON), then computes the manifest FROM THE WRITTEN FILES —
    * so the oracle checks assignment portability (md5 idiom), the
    * partitioned write, and the read-back in one hash. */
  def q135ShardExport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("q135shards").toString
    graft.sinks.ShardedExport.write(
      Tables.load(s, dir, "documents"), out, nShards = 8,
      idCol = "doc_id", tokenCol = "n_chars", seed = "q135")
    s.read.option("basePath", out).parquet(out)
      .groupBy($"shard".cast("long").as("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum($"n_chars".cast("long")).as("sum_tokens"))
      .orderBy($"shard")
  }

  /** Gopher rule-based quality filter (Rae et al. 2021) — per-rule
    * boolean attribution over the corpus. Every rule is integer
    * arithmetic (cross-multiplied ratios), so the DuckDB twin computes
    * bit-identical flags; the corpus fails ~half on word count and a
    * tail on stopwords, so the gate exercises both outcomes of every
    * CASE. */
  def q137GopherRules(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextOps.gopherQualityFlags(Tables.load(s, dir, "documents"), "text")
      .select($"doc_id",
        $"r_word_count".cast("long").as("r_word_count"),
        $"r_mean_word_len".cast("long").as("r_mean_word_len"),
        $"r_symbol_ratio".cast("long").as("r_symbol_ratio"),
        $"r_alpha_ratio".cast("long").as("r_alpha_ratio"),
        $"r_stopwords".cast("long").as("r_stopwords"),
        $"gopher_pass".cast("long").as("gopher_pass"))
      .orderBy($"doc_id")
  }

  /** C4-style line-level boilerplate removal over a deterministically
    * line-structured corpus (the synthetic docs carry no newlines, so
    * the gate splits on three frequent words — the identical `replace`
    * chain runs in DuckDB, making the WHOLE pipeline — line explode,
    * doc-frequency threshold, order-preserving rebuild — hash-checkable
    * end to end). */
  def q136LineDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val lined = Tables.load(s, dir, "documents").select($"doc_id",
      expr("replace(replace(replace(text, ' the ', chr(10)), ' a ', " +
        "chr(10)), ' table ', chr(10))").as("text"))
    TextOps.dedupFrequentLines(lined, "text", "doc_id", minDocFreq = 10)
      .select($"doc_id", $"text".as("clean_text"),
        $"n_lines_kept", $"n_lines_removed")
      .orderBy($"doc_id")
  }

  /** Unicode canonicalization gate. The synthetic corpus is pure ASCII —
    * where NFC is the identity — so the gate *injects* the interesting
    * cases deterministically in both engines: every 'e' becomes the
    * decomposed "e"+U+0301 (NFC must re-compose it to "é"), a BEL control
    * byte is appended (the cleaner must strip it), and a "Ã©" mojibake
    * artifact is appended (the counter must see it). The md5 over the
    * cleaned text then proves Spark's [[graft.functions.NfcNormalize]] is
    * bit-identical to DuckDB's ICU `nfc_normalize`, and `n_composed` > 0
    * on every row with an 'e' proves the gate isn't vacuous. */
  def q138NfcClean(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val inj = concat(
      regexp_replace($"text", "e", "e\u0301"), expr("chr(7)"), lit(" \u00c3\u00a9"))
    Tables.load(s, dir, "documents")
      .withColumn("inj", inj)
      .select($"doc_id",
        md5(TextOps.cleanText($"inj")).as("h_clean"),
        (length($"inj") - length(TextOps.cleanText($"inj")))
          .cast("long").as("n_composed"),
        TextOps.mojibakeCount($"inj").as("n_mojibake"))
      .orderBy($"doc_id")
  }

  /** Per-source weighted sample without replacement (A-ES, k = 5,
    * weight = n_chars): the kept doc set is a pure function of
    * (seed, id, weight), reproduced row-for-row by the DuckDB twin —
    * gating both the portable-uniform construction and the ln-key
    * ordering. */
  def q139WeightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CurationOps.weightedSample(Tables.load(s, dir, "documents"),
        strataCol = "source", idCol = "doc_id", weightCol = "n_chars",
        k = 5, seed = "q139")
      .select($"source", $"doc_id", $"n_chars")
      .orderBy($"source", $"doc_id")
  }

  /** Vocabulary id-encoding gate: top-50 vocab by (count desc, token)
    * — a deterministic total order — then every doc's token sequence
    * becomes an id array via the broadcast-vocab expression. The
    * position-weighted checksum (`ids_pos_sum`) proves the ARRAY ORDER
    * matches the token order, not just the multiset. */
  def q140VocabEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val enc = graft.ops.VocabOps.encode(
      Tables.load(s, dir, "documents"), "text", topN = 50)
    enc.select($"doc_id", posexplode($"ids"))
      .toDF("doc_id", "pos", "id")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"id" === 0, 1L).otherwise(0L)).as("n_oov"),
        sum($"id".cast("long")).as("ids_sum"),
        sum(($"id" * ($"pos" + 1)).cast("long")).as("ids_pos_sum"))
      .orderBy($"doc_id")
  }

  /** HTML extraction gate. The corpus is plain text, so the gate wraps
    * every doc in deterministic markup - tags, a script block whose body
    * contains fake tags, a style block, and the entity set including a
    * double-escape - in BOTH engines, then md5-compares the extraction.
    * Also proves decode ORDER: "&lt;tag&gt;" must survive as literal
    * "<tag>" text because entities decode after tag-stripping. */
  def q141HtmlStrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val suffix = "</p><script type=\"text/javascript\">var x = \"<p>not " +
      "text</p>\";</script><style>p { color: red }</style>&amp;lt; " +
      "&quot;q&quot; &#39;s&#39; &nbsp;&amp; &lt;tag&gt;</body></html>"
    val raw = concat(lit("<html><body clAss=\"x\"><p>"),
      replace($"text", lit(" the "), lit(" <b>the</b> ")), lit(suffix))
    Tables.load(s, dir, "documents")
      .withColumn("html", raw)
      .select($"doc_id", md5(TextOps.stripHtml($"html")).as("h_text"),
        length(TextOps.stripHtml($"html")).cast("long").as("n_chars_clean"))
      .orderBy($"doc_id")
  }

  /** Cross-source duplication matrix at an 8-token-prefix fingerprint
    * (full-document hashes share nothing in this corpus; leading-token
    * fingerprints expose the template overlap — 24 source pairs at
    * sf0.01, so both the multi-source filter and the pair expansion are
    * exercised). */
  def q142CrossSourceDups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    DedupOps.crossSourceDupMatrix(Tables.load(s, dir, "documents"),
        "text", "source", prefixTokens = 8)
      .orderBy($"src_a", $"src_b")
  }

  /** Compression-quality signal over the corpus (no SQL oracle — DuckDB
    * has no zlib — so this is a rows-only driver gate; the signal's
    * ordering properties are spec-gated in TextOpsSpec). Bucketed
    * ratios keep the output stable against zlib-version drift. */
  def q143CompressionSignal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"source",
        floor(TextOps.compressionRatio($"text") * 10).cast("long").as("decile"))
      .groupBy($"source", $"decile").agg(count(lit(1)).as("n_docs"))
      .orderBy($"source", $"decile")
  }

  /** URL canonicalization + per-domain stats gate. The corpus has no URL
    * column, so (q141-style) both engines build the same adversarial
    * URLs from doc_id — mixed-case scheme/host, `www.`, default and
    * non-default ports, trailing slashes, unsorted query params with
    * tracking noise, fragments — then canonicalize and group by
    * registered domain. `n_canonical < n_docs` proves variants collapse;
    * `sample_url` pins the exact canonical string. */
  def q144UrlCanon(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = $"doc_id"
    val site = element_at(array(lit("Example.COM"), lit("Sub.Example.CO.UK"),
      lit("cdn.News-Site.ORG")), (pmod(d, lit(3)) + 1).cast("int"))
    val raw = concat(
      when(pmod(d, lit(2)) === 0, "HTTPS").otherwise("http"), lit("://"),
      when(pmod(d, lit(4)) === 1, "WWW.").otherwise(""), site,
      when(pmod(d, lit(7)) === 0, ":8080")
        .when(pmod(d, lit(2)) === 0, ":443").otherwise(":80"),
      lit("/Articles/"), pmod(d, lit(50)),
      when(pmod(d, lit(5)) === 0, "/").otherwise(""),
      lit("?b=2&utm_campaign=c"), d, lit("&id="), pmod(d, lit(50)),
      lit("&ref=rss&a=1&gclid=X#sec"), d)
    Tables.load(s, dir, "documents")
      .select(TextOps.canonicalizeUrl(raw).as("curl"))
      .groupBy(TextOps.registeredDomain(
          regexp_replace(regexp_extract($"curl", "^[a-z]+://([^/?#]*)", 1),
            ":[0-9]+$", "")).as("domain"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"curl").as("n_canonical"),
        min($"curl").as("sample_url"))
      .orderBy($"domain")
  }

  /** PMI collocation mining over the corpus: integer-lift ranking (order
    * identical to PMI — see [[TextOps.collocations]]) keeps the whole
    * pipeline transcendental-free, so DuckDB replays it bit-for-bit. */
  def q145Collocations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    TextOps.collocations(Tables.load(s, dir, "documents"), "text",
      minCount = 5L, topK = 20)
  }

  /** Image perceptual near-dup gate (rows-only: DuckDB has no image
    * codec; the exact pair set — planted copies at their constructed
    * hamming distances, nothing else — is spec-gated in
    * MultimodalOpsSpec). Every doc becomes a patterned PNG/GIF; the
    * first 25 get a re-encoded copy with 1-3 inverted blocks under
    * id+10⁶. The banded join must surface exactly those copies. */
  def q146ImageNearDups(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.load(s, dir, "documents")
      .select($"doc_id").as[Long].mapPartitions { it =>
        it.flatMap { id =>
          val fmt = if (id % 2 == 0) "png" else "gif"
          val w = 8 + (id % 24).toInt; val h = 8 + ((id * 7) % 24).toInt
          val base = (id, MultimodalOps.encodePatternImage(w, h, id, fmt))
          if (id < 25)
            Seq(base, (id + 1000000L, MultimodalOps.encodePatternImage(
              w, h, id, fmt, invertBlocks = 1 + (id % 3).toInt)))
          else Seq(base)
        }
      }.toDF("media_id", "payload")
    MultimodalOps.imageNearDups(media, maxHamming = 3)
      .orderBy($"id1", $"id2")
  }

  /** Declarative SQL-project gate: a two-model dbt-style project (merge-
    * materialized scored layer with unique/not_null tests → tested
    * rollup) is written to disk, loaded by [[graft.pipeline.SqlProject]],
    * run through the full WAP pipeline, and the PUBLISHED rollup table is
    * compared against DuckDB running the composed SQL — gating the
    * loader, ref-graph ordering, merge materialization and publication
    * end to end. */
  def q147SqlProject(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val models = java.nio.file.Files.createTempDirectory("q147-models")
    val lake = java.nio.file.Files.createTempDirectory("q147-lake").toString
    def w(n: String, t: String) = java.nio.file.Files.write(
      models.resolve(s"$n.sql"), t.getBytes("UTF-8"))
    w("docs_scored",
      """-- graft: materialized=merge unique_key=doc_id order_by=doc_id tags=raw
        |-- test: not_null doc_id
        |-- test: unique doc_id
        |SELECT doc_id, source, lang, CAST(length(text) AS BIGINT) AS n_chars_m
        |FROM {{ source('documents') }} WHERE doc_id IS NOT NULL""".stripMargin)
    w("source_rollup",
      """-- graft: materialized=table
        |-- test: not_null source
        |-- test: row_count_between 1 1000000
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars_m) AS BIGINT) AS total_chars,
        |       count(DISTINCT lang) AS n_langs
        |FROM {{ ref('docs_scored') }}
        |GROUP BY source""".stripMargin)
    val p = graft.pipeline.SqlProject.load(s, models.toString, lake,
      Map("documents" -> (ss => Tables.load(ss, dir, "documents"))))
    val res = p.run(s, _ => ())
    require(res.ok, s"sql project run failed: ${res.toJson}")
    new graft.sinks.SnapshotTable(s, s"$lake/source_rollup").read()
      .orderBy($"source")
  }

  /** Blocklist filtering gate: five phrase patterns over the normalized
    * corpus via ONE Aho-Corasick scan per row
    * ([[TextOps.blocklistCount]]); DuckDB replays each phrase's
    * occurrence count with replace()-length arithmetic (exact because the
    * phrases have no self-border, so overlapping == non-overlapping). */
  def q148Blocklist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pats = Seq("spark merge", "batch table", "the data",
      "window join", "slow row")
    Tables.load(s, dir, "documents")
      .select($"source",
        TextOps.blocklistCount(TextOps.normalize($"text"), pats).as("n"))
      .groupBy($"source")
      .agg(sum($"n").as("total_hits"),
        sum(when($"n" > 0, 1L).otherwise(0L)).as("n_docs_hit"),
        count(lit(1)).as("n_docs"))
      .orderBy($"source")
  }

  /** Incremental-model gate: a dbt-style `is_incremental()` model runs
    * twice — first over the early half of `events`, then over the full
    * feed with `{{ this }}` restricting the rescan to rows newer than the
    * published max — and the merged result must equal one full refresh
    * (the incremental/full-refresh equivalence contract a dbt user
    * relies on; [[graft.pipeline.SqlProject]]). At 100 TB the second
    * run's scan is bounded by the `ts` predicate, not history. */
  def q149IncrementalModel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val models = java.nio.file.Files.createTempDirectory("q149-models")
    val lake = java.nio.file.Files.createTempDirectory("q149-lake").toString
    java.nio.file.Files.write(models.resolve("inc_events.sql"),
      """-- graft: materialized=merge unique_key=event_id order_by=ts
        |select event_id, user_id, event_type, ts
        |from {{ source('events') }}
        |{% if is_incremental() %}
        |where ts > (select max(ts) from {{ this }})
        |{% endif %}""".stripMargin.getBytes("UTF-8"))
    def run(src: DataFrame): Unit = {
      val res = graft.pipeline.SqlProject.load(s, models.toString, lake,
        Map("events" -> (_ => src))).run(s, _ => ())
      require(res.ok, s"incremental model run failed: ${res.toJson}")
    }
    val ev = Tables.load(s, dir, "events")
    run(ev.filter($"ts" < lit("2024-01-15").cast("timestamp")))
    run(ev) // only rows past the published max(ts) are rescanned/merged
    // epoch-micros output: timestamp carriers round-trip engines at
    // different physical precisions; integers don't
    new graft.sinks.SnapshotTable(s, s"$lake/inc_events").read()
      .select($"event_id", $"user_id", $"event_type",
        unix_micros($"ts").as("ts_us"))
      .orderBy($"event_id")
  }

  /** insert_overwrite gate: a partition-refresh model runs twice — first
    * deriving every month with formula A, then re-deriving only months
    * ≥ 1996-01 with formula B. The batch's partitions REPLACE the
    * table's same partitions (dynamic partition overwrite, no key
    * matching); earlier months must survive untouched. The oracle
    * replays the month-split replacement in one SQL pass. */
  def q150InsertOverwrite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val models = java.nio.file.Files.createTempDirectory("q150-models")
    val lake = java.nio.file.Files.createTempDirectory("q150-lake").toString
    java.nio.file.Files.write(models.resolve("monthly.sql"),
      """-- graft: materialized=insert_overwrite partition_by=month
        |select month, n_orders, rev from {{ source('batch') }}""".stripMargin
        .getBytes("UTF-8"))
    def run(src: DataFrame): Unit = {
      val res = graft.pipeline.SqlProject.load(s, models.toString, lake,
        Map("batch" -> (_ => src))).run(s, _ => ())
      require(res.ok, s"insert_overwrite model run failed: ${res.toJson}")
    }
    val monthly = Tables.load(s, dir, "orders")
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
    // per-row floor() then integer-sum: bit-portable across engines
    run(monthly.agg(count(lit(1)).as("n_orders"),
      sum(floor($"o_totalprice")).cast("long").as("rev")))
    run(monthly.agg(count(lit(1)).as("n_orders"),
      sum(floor($"o_totalprice" / 2)).cast("long").as("rev"))
      .filter($"month" >= "1996-01"))
    new graft.sinks.SnapshotTable(s, s"$lake/monthly").readInPlace()
      .select($"month", $"n_orders", $"rev")
      .orderBy($"month")
  }

  def q131StableIds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CurationOps.assignStableIds(
        Tables.load(s, dir, "documents").select($"doc_id", $"source"),
        orderCol = "doc_id", partitions = 8)
      .select($"doc_id", $"source", $"stable_id")
      .orderBy($"doc_id")
  }

  /** Model-based quality filter end to end: weak labels (lang == 'en'),
    * hashed-BoW logistic regression, score + confusion summary. No SQL
    * oracle — L-BFGS float aggregation is not bit-portable across
    * engines — so this is a rows-only driver gate; the separation
    * quality itself is gated in QualityClassifierSpec. */
  def q132QualityClassifier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents")
      .withColumn("label", ($"lang" === "en").cast("int"))
    val m = graft.ops.QualityClassifier.train(docs, "text", "label",
      numFeatures = 1 << 14, maxIter = 20)
    graft.ops.QualityClassifier.score(m, docs, "text")
      .groupBy($"label", ($"quality_prob" >= 0.5).cast("int").as("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"label", $"predicted")
  }

  /** q87's split spec; thresholds shared verbatim with the oracle. */
  private[graft] val q87Splits =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  val queries: Map[String, Q] = Map(
    "q88_ann_ivfpq" -> (q88AnnIvfPq _),
    "q87_hash_split" -> (q87HashSplit _),
    "q127_budget_mix" -> (q127BudgetMix _),
    "q128_canonical_retention" -> (q128CanonicalRetention _),
    "q129_filter_funnel" -> (q129FilterFunnel _),
    "q130_source_overlap" -> (q130SourceOverlap _),
    "q131_stable_ids" -> (q131StableIds _),
    "q135_shard_export" -> (q135ShardExport _),
    "q136_line_dedup" -> (q136LineDedup _),
    "q137_gopher_rules" -> (q137GopherRules _),
    "q138_nfc_clean" -> (q138NfcClean _),
    "q139_weighted_sample" -> (q139WeightedSample _),
    "q140_vocab_encode" -> (q140VocabEncode _),
    "q141_html_strip" -> (q141HtmlStrip _),
    "q142_cross_source_dups" -> (q142CrossSourceDups _),
    "q143_compression_signal" -> (q143CompressionSignal _),
    "q144_url_canon" -> (q144UrlCanon _),
    "q145_collocations" -> (q145Collocations _),
    "q146_image_neardups" -> (q146ImageNearDups _),
    "q147_sql_project" -> (q147SqlProject _),
    "q148_blocklist" -> (q148Blocklist _),
    "q149_incremental_model" -> (q149IncrementalModel _),
    "q150_insert_overwrite" -> (q150InsertOverwrite _),
    "q132_quality_classifier" -> (q132QualityClassifier _),
    "q82_sampled_agg" -> (q82SampledAgg _),
    "q81_semdedup" -> (q81SemDedup _),
    "q80_lm_score" -> (q80LmScore _),
    "q157_tfidf" -> (q157Tfidf _),
    "q79_ann_pq" -> (q79AnnPq _),
    "q78_ann_int8" -> (q78AnnInt8 _),
    "q77_incremental_neardup" -> (q77IncrementalNearDedup _),
    "q191_takedown_neardup" -> (q191TakedownNearDedup _),
    "q205_rtbf_e2e" -> (q205RtbfE2e _),
    "q74_bpe_pairs" -> (q74BpePairs _),
    "q73_repeated_spans" -> (q73RepeatedSpans _),
    "q70_repetition" -> (q70Repetition _),
    "q71_temperature_sample" -> (q71TemperatureSample _),
    "q72_epoch_shuffle" -> (q72EpochShuffle _),
    "q66_pack" -> (q66Pack _),
    "q65_range_frame" -> (q65RangeFrame _),
    "q64_ann_ivf_indexed" -> (q64AnnIvfIndexed _),
    "q192_signed_ivf_ann" -> (q192SignedIvfAnn _),
    "q63_bm25" -> (q63Bm25 _),
    "q190_inc_text_index" -> (q190IncTextIndex _),
    "q193_text_topk" -> (q193TextTopK _),
    "q194_cdc_text_index" -> (q194CdcTextIndex _),
    "q60_decontaminate" -> (q60Decontaminate _),
    "q59_dup_clusters" -> (q59DupClusters _),
    "q153_cc_alternating" -> (q153CcAlternating _),
    "q53_ann_ivf" -> (q53AnnIvf _),
    "q52_cosine_neardups" -> (q52CosineNearDups _),
    "q119_banded_neardup" -> (q119BandedNearDups _),
    "q44_asof_join" -> (q44AsofJoin _),
    "q45_range_join" -> (q45RangeJoin _),
    "q46_heavy_hitters" -> (q46HeavyHitters _),
    "q34_chunking" -> (q34Chunking _),
    "q35_redact" -> (q35Redact _),
    "q36_percentiles" -> (q36Percentiles _),
    "q37_stratified_sample" -> (q37StratifiedSample _),
    "q38_fuzzy_match" -> (q38FuzzyMatch _),
    "q22_token_count" -> (q22TokenCount _),
    "q23_text_quality" -> (q23TextQuality _),
    "q24_lang_id" -> (q24LangId _),
    "q25_exact_dedup" -> (q25ExactDedup _),
    "q26_ngram_jaccard" -> (q26NgramJaccard _),
    "q175_jaccard_join" -> (q175JaccardJoin _),
    "q183_containment_join" -> (q183ContainmentJoin _),
    "q27_minhash_lsh" -> (q27MinhashLsh _),
    "q28_simhash" -> (q28Simhash _),
    "q29_cosine_topk" -> (q29CosineTopK _),
    "q30_ann_lsh" -> (q30AnnLsh _),
    "q121_ann_multiprobe" -> (q121AnnMultiprobe _),
    "q31_multimodal" -> (q31Multimodal _)
  )

  private val normSql =
    "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
  private val toksSql = s"string_split($normSql, ' ')"
  private val nTokSql =
    s"CASE WHEN length($normSql) = 0 THEN 0 ELSE len($toksSql) END"
  private val stopListSql = TextOps.stopwords.map(w => s"'$w'").mkString(", ")

  /** BM25 over the q190/q193/q194 NET corpus (takedowns %7=1 removed,
    * edits %11=3 applied), as DuckDB SQL — full ranking ordered by
    * doc_id, or the top-`topK` cut on the (score_e4, doc_id) total
    * order with ranks. */
  private def bm25NetOracle(topK: Option[Int]): String = {
    val terms = Seq("spark", "query", "fast")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(t, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n    ")
    val dfCols = terms.indices.map(i =>
      s"sum(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i")
      .mkString(",\n    ")
    val scoreSql = terms.indices.map { i =>
      s"""ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0)
         | * (tf$i * 2.2) / (tf$i + 1.2 * (0.25 + 0.75 * dl / avgdl))"""
        .stripMargin.replace("\n", "")
    }.mkString("\n    + ")
    val tail = topK match {
      case None =>
        s"""SELECT doc_id, CAST(dl AS BIGINT) AS doc_len,
           |  CAST(floor(($scoreSql) * 10000.0 + 0.5) AS BIGINT) AS score_e4
           |FROM tf, stats
           |ORDER BY doc_id""".stripMargin
      case Some(k) =>
        s"""scored AS (
           |  SELECT doc_id, CAST(dl AS BIGINT) AS doc_len,
           |    CAST(floor(($scoreSql) * 10000.0 + 0.5) AS BIGINT) AS score_e4
           |  FROM tf, stats)
           |SELECT doc_id, doc_len, score_e4,
           |  row_number() OVER (ORDER BY score_e4 DESC, doc_id) AS rank
           |FROM scored
           |ORDER BY score_e4 DESC, doc_id
           |LIMIT $k""".stripMargin
    }
    val statsClose = if (topK.isDefined) "," else ""
    s"""WITH net AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 11 = 3 THEN text || ' spark' ELSE text END
       |      AS text
       |  FROM documents WHERE doc_id % 7 <> 1),
       |toks AS (
       |  SELECT doc_id, $toksSql AS t,
       |    CAST($nTokSql AS DOUBLE) AS dl
       |  FROM net),
       |tf AS (
       |  SELECT doc_id, dl,
       |    $tfCols
       |  FROM toks),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) / count(*) AS avgdl,
       |    $dfCols
       |  FROM tf)$statsClose
       |$tail""".stripMargin
  }

  /** The planted-duplicate corpus, as SQL (twin of [[withPlantedDups]]). */
  private val plantedSql =
    """SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents
      |  WHERE doc_id % 10 = 0""".stripMargin

  /** Word 3-gram shingle list (twin of TextOps.shingles(k=3)). */
  private val shingles3Sql =
    s"""CASE WHEN len($toksSql) < 3 THEN [$normSql]
       |     ELSE list_distinct(list_transform(
       |       range(0, len($toksSql) - 2),
       |       i -> concat_ws(' ', $toksSql[i+1], $toksSql[i+2], $toksSql[i+3])))
       |END""".stripMargin

  /** Sequential-fold cosine between two FLOAT[] expressions — identical
    * accumulation order to the engine's fused CosineSimilarity. */
  private def cosSql(a: String, b: String): String =
    s"""(list_sum(list_transform(list_zip($a, $b),
       |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
       |  (sqrt(list_sum(list_transform($a,
       |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       |   sqrt(list_sum(list_transform($b,
       |     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))))""".stripMargin

  /** Sequential-fold dot product (twin of the fused DotProductF). */
  private def dotSql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b),
       |    x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))""".stripMargin

  /** The q30 hyperplanes as FLOAT[] SQL literals — the same seeded values
    * lshTopK(bits=4, dim=64, seed=42) materializes as float literals in
    * its plan, so both engines project against bit-identical planes. */
  private def planeSqlLits(bits: Int, dim: Int, seed: Long): Seq[String] =
    graft.ops.SimilarityOps.hyperplanes(bits, dim, seed).map { p =>
      p.map(x => java.lang.Float.toString(x.toFloat))
        .mkString("[", ", ", "]::FLOAT[]")
    }

  /** Bucket-code SQL: bit j set iff dot(vec, plane_j) >= 0. */
  private def bucketSql(vec: String, planes: Seq[String]): String =
    planes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN ${dotSql(vec, p)} >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString("(", "\n + ", ")")

  /** Portable 32-bit simhash signature SQL over a token-hash column `h`
    * (md5 hex): per-bit ±1 sums, sign → bit — twin of
    * DedupOps.simhashPortable. */
  private val simhashBitSumsSql: String = (0 until 32).map { j =>
    s"""SUM(CASE WHEN substr(h, ${j + 1}, 1) IN
       | ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b$j"""
      .stripMargin.replace("\n", "")
  }.mkString(",\n    ")
  private val simhashFromBitsSql: String = (0 until 32).map { j =>
    s"(CASE WHEN b$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
  }.mkString(" + ")

  /** The q26 2-gram Jaccard pair pipeline as a CTE chain (sets → sizes →
    * inv → capped → inter), shared by q26 and the q59 clustering oracle so
    * both engines see the identical edge list. */
  private val jaccard2gramCtes =
    s"""sets AS (
       |  SELECT doc_id,
       |    CASE WHEN len($toksSql) < 2 THEN [$normSql]
       |         ELSE list_distinct(list_transform(
       |           range(0, len($toksSql) - 1),
       |           i -> concat_ws(' ', $toksSql[i+1], $toksSql[i+2])))
       |    END AS sh
       |  FROM documents),
       |sizes AS (SELECT doc_id, len(sh) AS n FROM sets),
       |inv AS (SELECT doc_id, unnest(sh) AS g FROM sets),
       |capped AS (
       |  SELECT doc_id, g FROM (
       |    SELECT doc_id, g, count(*) OVER (PARTITION BY g) AS df FROM inv)
       |  WHERE df <= 40),
       |inter AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
       |  FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)""".stripMargin

  /** The IVF assign→probe→score→rank pipeline as DuckDB SQL — shared by
    * q53 (recompute path) and q64 (persisted-index path), which must
    * agree exactly. */
  private lazy val ivfOracleSql: String =
    s"""WITH cent AS (
       |  SELECT CAST((rn - 1) / 7 AS INT) AS cid, embedding AS c
       |  FROM (SELECT vec_id, embedding,
       |          row_number() OVER (ORDER BY vec_id) AS rn
       |        FROM embeddings ORDER BY vec_id LIMIT 112)
       |  WHERE (rn - 1) % 7 = 0),
       |assigned AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cid AS cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "c.c")} DESC, c.cid DESC) AS rn
       |    FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
       |q AS (
       |  SELECT vec_id AS q_id, embedding AS q_vec
       |  FROM embeddings WHERE vec_id < 8),
       |probes AS (
       |  SELECT q_id, q_vec, cell FROM (
       |    SELECT q.q_id, q.q_vec, c.cid AS cell,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${cosSql("q.q_vec", "c.c")} DESC, c.cid DESC) AS rn
       |    FROM q CROSS JOIN cent c) WHERE rn <= 4),
       |scored AS (
       |  SELECT p.q_id, a.vec_id,
       |    round(${cosSql("a.embedding", "p.q_vec")}, 4) AS cos
       |  FROM assigned a JOIN probes p ON a.cell = p.cell
       |  WHERE a.vec_id <> p.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
       |  FROM scored)
       |SELECT q_id, vec_id, cos, rank
       |FROM ranked WHERE rank <= 5
       |ORDER BY q_id, rank""".stripMargin

  val oracles: Map[String, String] = Map(
    "q88_ann_ivfpq" ->
      s"""WITH seeds AS (
         |  SELECT CAST((rn - 1) / 7 AS INT) AS cid, embedding AS c
         |  FROM (SELECT vec_id, embedding,
         |          row_number() OVER (ORDER BY vec_id) AS rn
         |        FROM embeddings ORDER BY vec_id LIMIT 112)
         |  WHERE (rn - 1) % 7 = 0),
         |assigned AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, s.cid AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "s.c")} DESC, s.cid DESC)
         |        AS rn
         |    FROM embeddings e CROSS JOIN seeds s) WHERE rn = 1),
         |cw AS (
         |  SELECT j, cid, list_slice(c, j * 8 + 1, j * 8 + 8) AS sub
         |  FROM seeds, (SELECT unnest(range(0, 8)) AS j)),
         |codes AS (
         |  SELECT vec_id, j, cid FROM (
         |    SELECT e.vec_id, w.j, w.cid,
         |      row_number() OVER (PARTITION BY e.vec_id, w.j
         |        ORDER BY list_sum(list_transform(
         |          list_zip(list_slice(e.embedding, w.j * 8 + 1, w.j * 8 + 8),
         |                   w.sub),
         |          p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         |             * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) ASC,
         |        w.cid ASC) AS rn
         |    FROM embeddings e CROSS JOIN cw w) WHERE rn = 1),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS q_vec
         |  FROM embeddings WHERE vec_id < 8),
         |probes AS (
         |  SELECT q_id, cell FROM (
         |    SELECT q.q_id, s.cid AS cell,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${cosSql("q.q_vec", "s.c")} DESC, s.cid DESC) AS rn
         |    FROM q CROSS JOIN seeds s) WHERE rn <= 4),
         |tab AS (
         |  SELECT q.q_id, w.j, w.cid,
         |    list_sum(list_transform(
         |      list_zip(list_slice(q.q_vec, w.j * 8 + 1, w.j * 8 + 8), w.sub),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dp
         |  FROM q CROSS JOIN cw w),
         |cellmatch AS (
         |  SELECT p.q_id, a.vec_id
         |  FROM assigned a JOIN probes p ON a.cell = p.cell
         |  WHERE a.vec_id <> p.q_id),
         |coarse AS (
         |  SELECT cm.q_id, cm.vec_id,
         |    list_sum(list(t.dp ORDER BY t.j)) AS approx
         |  FROM cellmatch cm
         |    JOIN codes c ON c.vec_id = cm.vec_id
         |    JOIN tab t ON t.q_id = cm.q_id AND t.j = c.j AND t.cid = c.cid
         |  GROUP BY cm.q_id, cm.vec_id),
         |cand AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id, row_number() OVER
         |      (PARTITION BY q_id ORDER BY approx DESC, vec_id ASC) AS rn
         |    FROM coarse) WHERE rn <= 20),
         |rescored AS (
         |  SELECT cand.q_id, cand.vec_id,
         |    round(${cosSql("e.embedding", "q.q_vec")}, 4) AS cos
         |  FROM cand
         |    JOIN embeddings e ON cand.vec_id = e.vec_id
         |    JOIN q ON cand.q_id = q.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cos,
         |    CAST(row_number() OVER
         |      (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS BIGINT)
         |      AS rank
         |  FROM rescored)
         |SELECT q_id, vec_id, cos, rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,
    "q137_gopher_rules" ->
      s"""WITH m AS (
        |  SELECT doc_id,
        |    CAST($nTokSql AS BIGINT) AS nw,
        |    CAST(CASE WHEN $nTokSql = 0 THEN 0
        |      ELSE length($normSql) - $nTokSql + 1 END AS BIGINT)
        |      AS sum_chars,
        |    CAST(length(text) - length(replace(text, '#', '')) AS BIGINT)
        |      AS n_hash,
        |    CAST((length(text) - length(replace(text, '...', ''))) / 3
        |      AS BIGINT) AS n_ell,
        |    CAST(len(list_filter($toksSql,
        |      w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |    CAST(len(list_intersect($toksSql,
        |      ['the','be','to','of','and','that','have','with']))
        |      AS BIGINT) AS n_stop
        |  FROM documents),
        |r AS (
        |  SELECT doc_id,
        |    CASE WHEN nw >= 50 AND nw <= 100000 THEN 1 ELSE 0 END
        |      AS r_word_count,
        |    CASE WHEN nw > 0 AND sum_chars >= 3 * nw
        |      AND sum_chars <= 10 * nw THEN 1 ELSE 0 END AS r_mean_word_len,
        |    CASE WHEN 10 * (n_hash + n_ell) < nw THEN 1 ELSE 0 END
        |      AS r_symbol_ratio,
        |    CASE WHEN 5 * n_alpha >= 4 * nw THEN 1 ELSE 0 END
        |      AS r_alpha_ratio,
        |    CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS r_stopwords
        |  FROM m)
        |SELECT doc_id, CAST(r_word_count AS BIGINT) AS r_word_count,
        |  CAST(r_mean_word_len AS BIGINT) AS r_mean_word_len,
        |  CAST(r_symbol_ratio AS BIGINT) AS r_symbol_ratio,
        |  CAST(r_alpha_ratio AS BIGINT) AS r_alpha_ratio,
        |  CAST(r_stopwords AS BIGINT) AS r_stopwords,
        |  CAST(r_word_count * r_mean_word_len * r_symbol_ratio *
        |       r_alpha_ratio * r_stopwords AS BIGINT) AS gopher_pass
        |FROM r
        |ORDER BY doc_id""".stripMargin,
    "q148_blocklist" ->
      """WITH n AS (
        |  SELECT source, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |c AS (SELECT source,
        |  (length(t) - length(replace(t, 'spark merge', ''))) // 11 +
        |  (length(t) - length(replace(t, 'batch table', ''))) // 11 +
        |  (length(t) - length(replace(t, 'the data', ''))) // 8 +
        |  (length(t) - length(replace(t, 'window join', ''))) // 11 +
        |  (length(t) - length(replace(t, 'slow row', ''))) // 8 AS n
        |  FROM n)
        |SELECT source, CAST(sum(n) AS BIGINT) AS total_hits,
        |  CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_hit,
        |  count(*) AS n_docs
        |FROM c GROUP BY source ORDER BY source""".stripMargin,
    "q147_sql_project" ->
      """WITH docs_scored AS (
        |  SELECT doc_id, source, lang, CAST(length(text) AS BIGINT) AS n_chars_m
        |  FROM documents WHERE doc_id IS NOT NULL)
        |SELECT source, count(*) AS n_docs,
        |  CAST(sum(n_chars_m) AS BIGINT) AS total_chars,
        |  count(DISTINCT lang) AS n_langs
        |FROM docs_scored GROUP BY source ORDER BY source""".stripMargin,
    "q149_incremental_model" ->
      // two incremental runs must equal one full refresh
      """SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        |FROM events ORDER BY event_id""".stripMargin,
    "q150_insert_overwrite" ->
      // replay the partition replacement: months >= 1996-01 carry the
      // second batch's derivation, earlier months the first's
      """WITH m AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |    count(*) AS n_orders,
        |    CAST(sum(floor(o_totalprice)) AS BIGINT) AS rev_a,
        |    CAST(sum(floor(o_totalprice / 2)) AS BIGINT) AS rev_b
        |  FROM orders GROUP BY 1)
        |SELECT month, n_orders,
        |  CASE WHEN month >= '1996-01' THEN rev_b ELSE rev_a END AS rev
        |FROM m ORDER BY month""".stripMargin,
    "q144_url_canon" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) || '://' ||
        |    (CASE WHEN doc_id % 4 = 1 THEN 'WWW.' ELSE '' END) ||
        |    (CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'Example.COM'
        |      WHEN 1 THEN 'Sub.Example.CO.UK' ELSE 'cdn.News-Site.ORG' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN ':8080'
        |      WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END) ||
        |    '/Articles/' || (doc_id % 50) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
        |    '?b=2&utm_campaign=c' || doc_id || '&id=' || (doc_id % 50) ||
        |    '&ref=rss&a=1&gclid=X#sec' || doc_id AS url
        |  FROM documents),
        |c0 AS (SELECT regexp_replace(trim(url), '#.*$', '') AS nf FROM u),
        |c1 AS (SELECT
        |  lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS s,
        |  lower(regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
        |  regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS p0,
        |  regexp_extract(nf, '\?([^#]*)', 1) AS q0
        |  FROM c0),
        |c2 AS (SELECT s,
        |  regexp_replace(CASE WHEN s = 'http' THEN regexp_replace(auth, ':80$', '')
        |    WHEN s = 'https' THEN regexp_replace(auth, ':443$', '')
        |    ELSE auth END, '^www\.', '') AS host,
        |  CASE WHEN length(regexp_replace(p0, '/+$', '')) = 0 THEN '/'
        |    ELSE regexp_replace(p0, '/+$', '') END AS p,
        |  array_to_string(list_sort(list_filter(string_split(q0, '&'),
        |    x -> x <> '' AND NOT regexp_matches(x, '^(utm_[^=]*|gclid|fbclid|ref)='))),
        |    '&') AS qs
        |  FROM c1),
        |c3 AS (SELECT
        |  s || '://' || host || p ||
        |    (CASE WHEN qs = '' THEN '' ELSE '?' || qs END) AS curl,
        |  string_split(regexp_replace(host, ':[0-9]+$', ''), '.') AS l,
        |  regexp_replace(host, ':[0-9]+$', '') AS hname
        |  FROM c2)
        |SELECT
        |  CASE WHEN len(l) <= 2 THEN hname
        |    WHEN l[-2] IN ('co','com','net','org','gov','ac','edu')
        |      THEN array_to_string(l[-3:], '.')
        |    ELSE array_to_string(l[-2:], '.') END AS domain,
        |  count(*) AS n_docs,
        |  count(DISTINCT curl) AS n_canonical,
        |  min(curl) AS sample_url
        |FROM c3 GROUP BY 1 ORDER BY 1""".stripMargin,
    "q145_collocations" ->
      """WITH toks AS (
        |  SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
        |    ' ') AS t
        |  FROM documents WHERE len(string_split(trim(
        |    regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) > 0),
        |uni AS (
        |  SELECT u.w, count(*) AS c
        |  FROM toks, LATERAL (SELECT unnest(t) AS w) u GROUP BY 1),
        |bi AS (
        |  SELECT t[i] AS w1, t[i + 1] AS w2, count(*) AS c12
        |  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT bi.w1, bi.w2, bi.c12, u1.c AS c1, u2.c AS c2,
        |  bi.c12 * 1000000 // (u1.c * u2.c) AS lift_e6
        |FROM bi JOIN uni u1 ON bi.w1 = u1.w JOIN uni u2 ON bi.w2 = u2.w
        |ORDER BY lift_e6 DESC, c12 DESC, w1, w2 LIMIT 20""".stripMargin,
    "q142_cross_source_dups" ->
      """WITH fp AS (
        |  SELECT DISTINCT
        |    md5(array_to_string(list_slice(string_split(
        |      trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '),
        |      1, 8), ' ')) AS f,
        |    source
        |  FROM documents)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  count(*) AS n_shared
        |FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q141_html_strip" ->
      """WITH h AS (
        |  SELECT doc_id, '<html><body clAss="x"><p>'
        |    || replace(text, ' the ', ' <b>the</b> ')
        |    || '</p><script type="text/javascript">var x = "<p>not text</p>";'
        |    || '</script><style>p { color: red }</style>&amp;lt; &quot;q&quot;'
        |    || ' &#39;s&#39; &nbsp;&amp; &lt;tag&gt;</body></html>'
        |    AS html
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(html,
        |              '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |            '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |          '<[^>]+>', ' ', 'g'),
        |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
        |        '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS t
        |  FROM h)
        |SELECT doc_id, md5(t) AS h_text,
        |  length(t) AS n_chars_clean
        |FROM c ORDER BY doc_id""".stripMargin,
    "q140_vocab_encode" ->
      """WITH toks AS (
        |  SELECT doc_id, u.tok, u.ord FROM (
        |    SELECT doc_id, string_split(
        |      trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts
        |    FROM documents) d,
        |  LATERAL (SELECT unnest(ts) AS tok,
        |           generate_subscripts(ts, 1) AS ord) u
        |  WHERE u.tok <> ''),
        |vocab AS (
        |  SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS id FROM (
        |    SELECT tok, count(*) AS cnt FROM toks GROUP BY tok
        |    ORDER BY cnt DESC, tok LIMIT 50)),
        |enc AS (
        |  SELECT t.doc_id, t.ord, coalesce(v.id, 0) AS id
        |  FROM toks t LEFT JOIN vocab v USING (tok))
        |SELECT doc_id, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(sum(id) AS BIGINT) AS ids_sum,
        |  CAST(sum(id * ord) AS BIGINT) AS ids_pos_sum
        |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q138_nfc_clean" ->
      """WITH inj AS (
        |  SELECT doc_id,
        |    replace(text, 'e', 'e\u0301') || chr(7) || ' \u00c3\u00a9' AS t
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, t,
        |    regexp_replace(nfc_normalize(t),
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]', '', 'g') AS ct
        |  FROM inj)
        |SELECT doc_id, md5(ct) AS h_clean,
        |  length(t) - length(ct) AS n_composed,
        |  CAST(len(regexp_extract_all(t,
        |    '\u00c3|\u00c2|\u00e2\u20ac|\u00ef\u00bf\u00bd|\ufffd')) AS BIGINT)
        |    AS n_mojibake
        |FROM c ORDER BY doc_id""".stripMargin,
    "q139_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT source, doc_id, n_chars,
        |    ln((CAST(CAST('0x' || substr(md5('q139:' || CAST(doc_id AS VARCHAR)),
        |        1, 15) AS BIGINT) AS DOUBLE) + 0.5) / 1152921504606846976.0)
        |      / CAST(n_chars AS DOUBLE) AS k
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY source ORDER BY k DESC, doc_id DESC)
        |      AS rn
        |  FROM keyed)
        |SELECT source, doc_id, n_chars FROM r WHERE rn <= 5
        |ORDER BY source, doc_id""".stripMargin,
    "q136_line_dedup" ->
      """WITH lined AS (
        |  SELECT doc_id, replace(replace(replace(text, ' the ', chr(10)),
        |    ' a ', chr(10)), ' table ', chr(10)) AS t
        |  FROM documents),
        |lines AS (
        |  SELECT doc_id, u.line, u.ord
        |  FROM lined, LATERAL (
        |    SELECT unnest(string_split(t, chr(10))) AS line,
        |           generate_subscripts(string_split(t, chr(10)), 1) AS ord) u),
        |freq AS (SELECT line FROM lines GROUP BY line
        |         HAVING count(DISTINCT doc_id) >= 10),
        |kept AS (
        |  SELECT doc_id, string_agg(line, chr(10) ORDER BY ord) AS txt,
        |         count(*) AS nk
        |  FROM lines WHERE line NOT IN (SELECT line FROM freq)
        |  GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS nl FROM lines GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(k.txt, '') AS clean_text,
        |  coalesce(k.nk, 0) AS n_lines_kept,
        |  t.nl - coalesce(k.nk, 0) AS n_lines_removed
        |FROM tot t LEFT JOIN kept k USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,
    "q135_shard_export" ->
      """SELECT
        |  CAST(CAST('0x' || substr(md5('q135:' || CAST(doc_id AS VARCHAR)), 1, 8)
        |       AS BIGINT) % 8 AS BIGINT) AS shard,
        |  count(*) AS n_rows,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_tokens
        |FROM documents
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,
    "q87_hash_split" -> {
      val Seq(t1, t2) = CurationOps.splitThresholdsHex(q87Splits)
      s"""SELECT
         |  CASE WHEN substr(md5('q87:' || CAST(doc_id AS VARCHAR)), 1, 8)
         |         < '$t1' THEN 'train'
         |       WHEN substr(md5('q87:' || CAST(doc_id AS VARCHAR)), 1, 8)
         |         < '$t2' THEN 'val'
         |       ELSE 'test' END AS split,
         |  count(*) AS n_docs,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents
         |GROUP BY 1
         |ORDER BY 1""".stripMargin
    },
    "q82_sampled_agg" ->
      s"""WITH s AS (
         |  SELECT l_returnflag,
         |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5)
         |         AS BIGINT) AS e4
         |  FROM lineitem
         |  WHERE substr(md5('q82:' || (CAST(l_orderkey AS VARCHAR) || '-' ||
         |                              CAST(l_linenumber AS VARCHAR))), 1, 8)
         |    < lpad(lower(hex(CAST(floor(0.1 * 4294967296.0) AS BIGINT))),
         |           8, '0'))
         |SELECT l_returnflag, count(*) AS n_sampled,
         |  CAST(sum(e4) AS BIGINT) AS sum_e4,
         |  CAST(round(CAST(sum(e4) AS DOUBLE)
         |             * ${CurationOps.inverseRate(0.1)}) AS BIGINT) AS est_e4
         |FROM s GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin,
    "q81_semdedup" ->
      s"""WITH cent AS (
         |  SELECT CAST((rn - 1) / 7 AS INT) AS cid, embedding AS c
         |  FROM (SELECT vec_id, embedding,
         |          row_number() OVER (ORDER BY vec_id) AS rn
         |        FROM embeddings ORDER BY vec_id LIMIT 112)
         |  WHERE (rn - 1) % 7 = 0),
         |assigned AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.cid AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.c")} DESC, c.cid DESC) AS rn
         |    FROM embeddings e CROSS JOIN cent c) WHERE rn = 1),
         |dups AS (
         |  SELECT a.vec_id, min(b.vec_id) AS dup_of
         |  FROM assigned a JOIN assigned b
         |    ON a.cell = b.cell AND b.vec_id < a.vec_id
         |  WHERE round(${cosSql("a.embedding", "b.embedding")}, 4) >= 0.9
         |  GROUP BY a.vec_id)
         |SELECT a.vec_id, CAST(a.cell AS BIGINT) AS cell,
         |  CAST(CASE WHEN d.dup_of IS NULL THEN 1 ELSE 0 END AS BIGINT)
         |    AS keep,
         |  d.dup_of
         |FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
         |ORDER BY a.vec_id""".stripMargin,
    "q157_tfidf" ->
      s"""WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
        |toks AS (
        |  SELECT doc_id, unnest($toksSql) AS term FROM docs),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks
        |  WHERE length(term) > 0 GROUP BY doc_id, term),
        |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM docs),
        |scored AS (
        |  SELECT doc_id, term,
        |    round(tf * ln(CAST(n_docs AS DOUBLE) / df), 4) AS score4
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, score4,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score4 DESC, term) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT doc_id, rank, term, score4 FROM ranked
        |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "q80_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id, TOKS AS toks FROM documents WHERE len(TOKS) >= 2),
        |stream AS (SELECT doc_id, unnest(toks) AS w FROM t),
        |uni AS (SELECT w, count(*) AS c1 FROM stream GROUP BY w),
        |v AS (SELECT count(DISTINCT w) AS vv FROM stream),
        |bg AS (
        |  SELECT doc_id, pos, toks[pos + 1] AS w1,
        |    toks[pos + 1] || chr(31) || toks[pos + 2] AS bigram
        |  FROM (SELECT doc_id, toks,
        |          unnest(range(0, len(toks) - 1)) AS pos FROM t)),
        |c2 AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
        |terms AS (
        |  SELECT b.doc_id, b.pos,
        |    ln((CAST(c2.c2 AS DOUBLE) + 1.0) /
        |       (CAST(u.c1 AS DOUBLE) + CAST(v.vv AS DOUBLE))) AS term
        |  FROM bg b
        |    JOIN c2 ON b.bigram = c2.bigram
        |    JOIN uni u ON b.w1 = u.w
        |    CROSS JOIN v)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(list_sum(list(term ORDER BY pos)) / count(*), 4) AS avg_logp
        |FROM terms GROUP BY doc_id
        |ORDER BY doc_id""".stripMargin
        .replace("TOKS",
          "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"),
    "q79_ann_pq" ->
      s"""WITH seeds AS (
         |  SELECT CAST((rn - 1) / 7 AS INT) AS cid, embedding AS c
         |  FROM (SELECT vec_id, embedding,
         |          row_number() OVER (ORDER BY vec_id) AS rn
         |        FROM embeddings ORDER BY vec_id LIMIT 112)
         |  WHERE (rn - 1) % 7 = 0),
         |cw AS (
         |  SELECT j, cid, list_slice(c, j * 8 + 1, j * 8 + 8) AS sub
         |  FROM seeds, (SELECT unnest(range(0, 8)) AS j)),
         |codes AS (
         |  SELECT vec_id, j, cid FROM (
         |    SELECT e.vec_id, w.j, w.cid,
         |      row_number() OVER (PARTITION BY e.vec_id, w.j
         |        ORDER BY list_sum(list_transform(
         |          list_zip(list_slice(e.embedding, w.j * 8 + 1, w.j * 8 + 8),
         |                   w.sub),
         |          p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
         |             * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) ASC,
         |        w.cid ASC) AS rn
         |    FROM embeddings e CROSS JOIN cw w) WHERE rn = 1),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS q_vec
         |  FROM embeddings WHERE vec_id < 8),
         |tab AS (
         |  SELECT q.q_id, w.j, w.cid,
         |    list_sum(list_transform(
         |      list_zip(list_slice(q.q_vec, w.j * 8 + 1, w.j * 8 + 8), w.sub),
         |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS dp
         |  FROM q CROSS JOIN cw w),
         |coarse AS (
         |  SELECT t.q_id, c.vec_id,
         |    list_sum(list(t.dp ORDER BY t.j)) AS approx
         |  FROM codes c JOIN tab t ON c.j = t.j AND c.cid = t.cid
         |  WHERE c.vec_id <> t.q_id
         |  GROUP BY t.q_id, c.vec_id),
         |cand AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id, row_number() OVER
         |      (PARTITION BY q_id ORDER BY approx DESC, vec_id ASC) AS rn
         |    FROM coarse) WHERE rn <= 20),
         |rescored AS (
         |  SELECT cand.q_id, cand.vec_id,
         |    round(${cosSql("e.embedding", "q.q_vec")}, 4) AS cos
         |  FROM cand
         |    JOIN embeddings e ON cand.vec_id = e.vec_id
         |    JOIN q ON cand.q_id = q.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cos,
         |    CAST(row_number() OVER
         |      (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS BIGINT)
         |      AS rank
         |  FROM rescored)
         |SELECT q_id, vec_id, cos, rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,
    "q78_ann_int8" ->
      s"""WITH qz AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding,
         |      x -> abs(CAST(x AS DOUBLE)))) AS ma
         |  FROM embeddings),
         |q8 AS (
         |  SELECT vec_id, embedding,
         |    CASE WHEN ma = 0
         |      THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
         |      ELSE list_transform(embedding,
         |        x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / ma) AS BIGINT))
         |    END AS qv,
         |    ma / 127.0 AS scale
         |  FROM qz),
         |qs AS (
         |  SELECT vec_id AS q_id, embedding AS q_vec, qv AS q_qv,
         |    scale AS q_scale
         |  FROM q8 WHERE vec_id < 8),
         |coarse AS (
         |  SELECT q.q_id, c.vec_id,
         |    CAST(list_sum(list_transform(list_zip(c.qv, q.q_qv),
         |      p -> CAST(p[1] AS BIGINT) * CAST(p[2] AS BIGINT))) AS DOUBLE)
         |      * c.scale * q.q_scale AS approx
         |  FROM q8 c JOIN qs q ON c.vec_id <> q.q_id),
         |cand AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id, row_number() OVER
         |      (PARTITION BY q_id ORDER BY approx DESC, vec_id ASC) AS rn
         |    FROM coarse) WHERE rn <= 20),
         |rescored AS (
         |  SELECT cand.q_id, cand.vec_id,
         |    round(${cosSql("e.embedding", "q.q_vec")}, 4) AS cos
         |  FROM cand
         |    JOIN embeddings e ON cand.vec_id = e.vec_id
         |    JOIN qs q ON cand.q_id = q.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cos,
         |    CAST(row_number() OVER
         |      (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS BIGINT)
         |      AS rank
         |  FROM rescored)
         |SELECT q_id, vec_id, cos, rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,
    // q205: the end-to-end right-to-be-forgotten gate — one oracle over
    // the net corpus computes net liveness, the admission store's final
    // live set (even wave admits min-even per shingle group, odd wave
    // admits min-odd only where no even exists, takedown %9=4 last),
    // the dup-cluster labels (min net member of every ≥2-member net
    // group), and the BM25 net scores
    "q205_rtbf_e2e" -> {
      val terms = Seq("spark", "query", "fast")
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(t, x -> x = '$t')) AS DOUBLE) AS tf$i"
      }.mkString(",\n    ")
      val dfCols = terms.indices.map(i =>
        s"sum(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i")
        .mkString(",\n    ")
      val scoreSql = terms.indices.map { i =>
        s"""ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0)
           | * (tf$i * 2.2) / (tf$i + 1.2 * (0.25 + 0.75 * dl / avgdl))"""
          .stripMargin.replace("\n", "")
      }.mkString("\n    + ")
      s"""WITH base AS (
         |  $plantedSql),
         |keyed AS (
         |  SELECT doc_id,
         |    md5(array_to_string(list_sort($shingles3Sql), chr(30))) AS set_key
         |  FROM base),
         |g AS (
         |  SELECT set_key,
         |    min(CASE WHEN doc_id % 2 = 0 THEN doc_id END) AS min_even,
         |    min(CASE WHEN doc_id % 2 = 1 THEN doc_id END) AS min_odd
         |  FROM keyed GROUP BY set_key),
         |adm AS (
         |  SELECT k.doc_id,
         |    CASE WHEN ((k.doc_id % 2 = 0 AND k.doc_id = g.min_even)
         |           OR (k.doc_id % 2 = 1 AND g.min_even IS NULL
         |               AND k.doc_id = g.min_odd))
         |          AND k.doc_id % 9 <> 4 THEN 1 ELSE 0 END AS admitted
         |  FROM keyed k JOIN g USING (set_key)),
         |netkey AS (SELECT doc_id, set_key FROM keyed WHERE doc_id % 9 <> 4),
         |lab AS (
         |  SELECT doc_id,
         |    CASE WHEN count(*) OVER (PARTITION BY set_key) >= 2
         |         THEN min(doc_id) OVER (PARTITION BY set_key)
         |         ELSE -1 END AS label
         |  FROM netkey),
         |net AS (SELECT doc_id, text FROM base WHERE doc_id % 9 <> 4),
         |toks AS (
         |  SELECT doc_id, $toksSql AS t,
         |    CAST($nTokSql AS DOUBLE) AS dl
         |  FROM net),
         |tf AS (
         |  SELECT doc_id, dl,
         |    $tfCols
         |  FROM toks),
         |stats AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |    CAST(sum(CAST(dl AS BIGINT)) AS DOUBLE) / count(*) AS avgdl,
         |    $dfCols
         |  FROM tf),
         |sc AS (
         |  SELECT doc_id,
         |    CAST(floor(($scoreSql) * 10000.0 + 0.5) AS BIGINT) AS score_e4
         |  FROM tf, stats)
         |SELECT b.doc_id,
         |  CAST(CASE WHEN b.doc_id % 9 <> 4 THEN 1 ELSE 0 END AS BIGINT)
         |    AS live,
         |  CAST(a.admitted AS BIGINT) AS admitted,
         |  CAST(COALESCE(l.label, -1) AS BIGINT) AS label,
         |  COALESCE(s.score_e4, -1) AS score_e4
         |FROM base b
         |JOIN adm a USING (doc_id)
         |LEFT JOIN lab l USING (doc_id)
         |LEFT JOIN sc s USING (doc_id)
         |ORDER BY b.doc_id""".stripMargin
    },
    // q191: live = survives batch-1 (evens), the %10=4 takedown of its
    // admitted canonicals, and batch-2 (odds + twins of the taken-down)
    "q191_takedown_neardup" ->
      s"""WITH base AS (
         |  $plantedSql),
         |all_docs AS (
         |  SELECT doc_id, text FROM base
         |  UNION ALL
         |  SELECT doc_id + 200001 AS doc_id, text FROM base
         |  WHERE doc_id % 10 = 4),
         |keyed AS (
         |  SELECT doc_id,
         |    md5(array_to_string(list_sort($shingles3Sql), chr(30))) AS set_key
         |  FROM all_docs),
         |g AS (
         |  SELECT set_key,
         |    min(CASE WHEN doc_id % 2 = 0 THEN doc_id END) AS min_even,
         |    min(CASE WHEN doc_id % 2 = 1 THEN doc_id END) AS min_odd
         |  FROM keyed GROUP BY set_key)
         |SELECT k.doc_id,
         |  CAST(CASE WHEN k.doc_id % 2 = 0 THEN
         |    CASE WHEN k.doc_id = g.min_even AND g.min_even % 10 <> 4
         |         THEN 1 ELSE 0 END
         |  ELSE
         |    CASE WHEN k.doc_id = g.min_odd
         |           AND (g.min_even IS NULL OR g.min_even % 10 = 4)
         |         THEN 1 ELSE 0 END
         |  END AS BIGINT) AS live
         |FROM keyed k JOIN g USING (set_key)
         |ORDER BY k.doc_id""".stripMargin,
    "q77_incremental_neardup" ->
      s"""WITH all_docs AS (
         |  $plantedSql),
         |keyed AS (
         |  SELECT doc_id,
         |    md5(array_to_string(list_sort($shingles3Sql), chr(30))) AS set_key
         |  FROM all_docs)
         |SELECT doc_id,
         |  CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY set_key)
         |       THEN 1 ELSE 0 END AS BIGINT) AS admitted
         |FROM keyed
         |ORDER BY doc_id""".stripMargin,
    "q74_bpe_pairs" ->
      """WITH w AS (SELECT unnest(TOKS) AS word FROM documents),
        |wf AS (SELECT word, count(*) AS freq FROM w
        |       WHERE length(word) >= 2 GROUP BY word),
        |p AS (SELECT unnest(list_transform(range(1, length(word)),
        |        i -> substr(word, CAST(i AS INTEGER), 2))) AS pair, freq
        |      FROM wf)
        |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
        |FROM p GROUP BY pair
        |ORDER BY cnt DESC, pair LIMIT 50""".stripMargin
        .replace("TOKS", "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"),
    "q73_repeated_spans" -> {
      val gram8 = (1 to 8).map(j => s"TOKS[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
      s"""WITH gl AS (
         |  SELECT doc_id,
         |    CASE WHEN len(TOKS) < 8 THEN [NORM]
         |         ELSE list_transform(range(0, len(TOKS) - 7), i -> $gram8)
         |    END AS grams
         |  FROM documents),
         |gx AS (SELECT doc_id, unnest(grams) AS g,
         |         unnest(range(0, len(grams))) AS pos FROM gl),
         |rep AS (SELECT g FROM (
         |  SELECT g, count(DISTINCT doc_id) AS d FROM gx GROUP BY g) WHERE d >= 2),
         |isl AS (SELECT doc_id, pos,
         |          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS island
         |        FROM gx WHERE g IN (SELECT g FROM rep))
         |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
         |  CAST(max(pos) + 8 AS BIGINT) AS span_end, count(*) AS n_windows
         |FROM isl GROUP BY doc_id, island
         |ORDER BY doc_id, span_start""".stripMargin
        .replace("NORM", "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")
        .replace("TOKS", "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')")
    },
    "q70_repetition" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(
        |    CASE WHEN len(TOKS) < 2 THEN [NORM]
        |         ELSE list_transform(range(0, len(TOKS) - 1),
        |                i -> concat_ws(' ', TOKS[i+1], TOKS[i+2]))
        |    END) AS g
        |  FROM documents),
        |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS total_grams,
        |  count(*) AS distinct_grams, CAST(max(c) AS BIGINT) AS top_gram_count
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin
        .replace("NORM", "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")
        .replace("TOKS", "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"),
    "q127_budget_mix" ->
      """WITH tot AS (
        |  SELECT source, CAST(sum(n_chars) AS DOUBLE) AS t_d
        |  FROM documents GROUP BY source),
        |rates AS (
        |  SELECT source, least(1.0, CAST(b.budget AS DOUBLE) / t_d)
        |    AS keep_rate
        |  FROM tot
        |  JOIN (VALUES ('src0', 4000), ('src1', 1000000),
        |        ('src2', 2000), ('src3', 6000)) AS b(source, budget)
        |    USING (source)
        |  WHERE t_d > 0)
        |SELECT d.doc_id, d.source, d.n_chars
        |FROM documents d JOIN rates r USING (source)
        |WHERE r.keep_rate >= 1.0
        |   OR substr(md5('q127:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
        |      < lpad(lower(hex(CAST(floor(r.keep_rate * 4294967296.0) AS BIGINT))), 8, '0')
        |ORDER BY doc_id""".stripMargin,
    "q71_temperature_sample" ->
      """WITH hist AS (
        |  SELECT source, count(*) AS n_d FROM documents GROUP BY source),
        |tot AS (
        |  SELECT CAST(sum(n_d) AS DOUBLE) AS n_total,
        |         sum(sqrt(CAST(n_d AS DOUBLE))) AS w_total FROM hist),
        |rates AS (
        |  SELECT source,
        |    least(1.0, 0.5 * n_total * sqrt(CAST(n_d AS DOUBLE))
        |      / (w_total * CAST(n_d AS DOUBLE))) AS keep_rate
        |  FROM hist, tot)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN rates r USING (source)
        |WHERE r.keep_rate >= 1.0
        |   OR substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
        |      < lpad(lower(hex(CAST(floor(r.keep_rate * 4294967296.0) AS BIGINT))), 8, '0')
        |ORDER BY doc_id""".stripMargin,
    "q72_epoch_shuffle" ->
      """SELECT doc_id, md5('7:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        |FROM documents
        |ORDER BY shuffle_key""".stripMargin,
    "q27_minhash_lsh" ->
      s"""WITH all_docs AS (
         |  $plantedSql),
         |sets AS (
         |  SELECT doc_id, $shingles3Sql AS sh FROM all_docs),
         |keyed AS (
         |  SELECT doc_id,
         |    md5(array_to_string(list_sort(sh), chr(30))) AS set_key
         |  FROM sets)
         |SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(1.0 AS DOUBLE) AS jaccard
         |FROM keyed a JOIN keyed b
         |  ON a.set_key = b.set_key AND a.doc_id < b.doc_id
         |ORDER BY id1, id2""".stripMargin,
    "q28_simhash" ->
      s"""WITH all_docs AS (
         |  $plantedSql),
         |tok AS (
         |  SELECT doc_id, unnest($toksSql) AS t FROM all_docs),
         |hashed AS (
         |  SELECT doc_id, md5(t) AS h FROM tok),
         |bits AS (
         |  SELECT doc_id,
         |    $simhashBitSumsSql
         |  FROM hashed GROUP BY doc_id),
         |sig AS (
         |  SELECT doc_id, $simhashFromBitsSql AS simhash FROM bits)
         |SELECT a.doc_id AS id1, b.doc_id AS id2,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY id1, id2""".stripMargin,
    "q30_ann_lsh" -> {
      val planes = planeSqlLits(bits = 4, dim = 64, seed = 42L)
      s"""WITH b AS (
         |  SELECT vec_id, embedding,
         |    ${bucketSql("embedding", planes)} AS bucket
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS q_vec, bucket
         |  FROM b WHERE vec_id < 8),
         |scored AS (
         |  SELECT q.q_id, e.vec_id,
         |    round(${cosSql("e.embedding", "q.q_vec")}, 4) AS cos
         |  FROM b e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT q_id, vec_id, cos, rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin
    },
    "q121_ann_multiprobe" -> {
      val planes = planeSqlLits(bits = 8, dim = 64, seed = 42L)
      val marginTerms = planes.zipWithIndex.map { case (p, j) =>
        s"SELECT q_id, $j AS j, abs(${dotSql("q_vec", p)}) AS m FROM q"
      }.mkString("\n  UNION ALL ")
      s"""WITH b AS (
         |  SELECT vec_id, embedding,
         |    ${bucketSql("embedding", planes)} AS bucket
         |  FROM embeddings),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS q_vec, bucket
         |  FROM b WHERE vec_id < 8),
         |mar AS (
         |  $marginTerms),
         |flips AS (
         |  SELECT q_id, j FROM (
         |    SELECT q_id, j,
         |      row_number() OVER (PARTITION BY q_id ORDER BY m, j) AS rn
         |    FROM mar) WHERE rn <= 4),
         |probed AS (
         |  SELECT q_id, bucket FROM q
         |  UNION
         |  SELECT f.q_id, xor(q.bucket, (CAST(1 AS BIGINT) << f.j))
         |  FROM flips f JOIN q ON f.q_id = q.q_id),
         |cand AS (
         |  SELECT DISTINCT p.q_id, e.vec_id
         |  FROM probed p JOIN b e ON e.bucket = p.bucket
         |  WHERE e.vec_id <> p.q_id),
         |scored AS (
         |  SELECT c.q_id, c.vec_id,
         |    round(${cosSql("e.embedding", "q.q_vec")}, 4) AS cos
         |  FROM cand c
         |    JOIN b e ON c.vec_id = e.vec_id
         |    JOIN q ON c.q_id = q.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT q_id, vec_id, cos, rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin
    },
    "q53_ann_ivf" -> ivfOracleSql,
    // identical pipeline contract: the persisted index must reproduce the
    // recompute-everything IVF result exactly
    "q64_ann_ivf_indexed" -> ivfOracleSql,
    // q192: the q64 oracle over the NET corpus — takedowns (%5=1)
    // removed, re-embeds (%7=3) applied — against the ORIGINAL-corpus
    // centroid seeds (frozen by contract)
    "q192_signed_ivf_ann" ->
      s"""WITH cent AS (
         |  SELECT CAST((rn - 1) / 7 AS INT) AS cid, embedding AS c
         |  FROM (SELECT vec_id, embedding,
         |          row_number() OVER (ORDER BY vec_id) AS rn
         |        FROM embeddings ORDER BY vec_id LIMIT 112)
         |  WHERE (rn - 1) % 7 = 0),
         |net AS (
         |  SELECT vec_id,
         |    CASE WHEN vec_id % 7 = 3 THEN list_reverse(embedding)
         |         ELSE embedding END AS embedding
         |  FROM embeddings WHERE vec_id % 5 <> 1),
         |assigned AS (
         |  SELECT vec_id, embedding, cell FROM (
         |    SELECT e.vec_id, e.embedding, c.cid AS cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.c")} DESC, c.cid DESC) AS rn
         |    FROM net e CROSS JOIN cent c) WHERE rn = 1),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS q_vec
         |  FROM embeddings WHERE vec_id < 8),
         |probes AS (
         |  SELECT q_id, q_vec, cell FROM (
         |    SELECT q.q_id, q.q_vec, c.cid AS cell,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY ${cosSql("q.q_vec", "c.c")} DESC, c.cid DESC) AS rn
         |    FROM q CROSS JOIN cent c) WHERE rn <= 4),
         |scored AS (
         |  SELECT p.q_id, a.vec_id,
         |    round(${cosSql("a.embedding", "p.q_vec")}, 4) AS cos
         |  FROM assigned a JOIN probes p ON a.cell = p.cell
         |  WHERE a.vec_id <> p.q_id),
         |ranked AS (
         |  SELECT q_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY cos DESC, vec_id) AS rank
         |  FROM scored)
         |SELECT q_id, vec_id, cos, rank
         |FROM ranked WHERE rank <= 5
         |ORDER BY q_id, rank""".stripMargin,
    "q119_banded_neardup" ->
      """WITH all_vecs AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
        |  WHERE vec_id < 50),
        |p AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    round(
        |      list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
        |      (sqrt(list_sum(list_transform(a.embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |       sqrt(list_sum(list_transform(b.embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos
        |  FROM all_vecs a JOIN all_vecs b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, cos FROM p
        |WHERE cos >= 0.9
        |ORDER BY id1, id2""".stripMargin,
    "q52_cosine_neardups" ->
      """WITH p AS (
        |  SELECT a.vec_id AS id1, b.vec_id AS id2,
        |    round(
        |      list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
        |      (sqrt(list_sum(list_transform(a.embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |       sqrt(list_sum(list_transform(b.embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
        |SELECT id1, id2, cos FROM p
        |WHERE cos >= 0.4
        |ORDER BY id1, id2""".stripMargin,
    "q44_asof_join" ->
      """SELECT e.user_id, e.event_id,
        | epoch_us(CAST(e.ts AS TIMESTAMP)) AS ts_us,
        | p.value AS asof_value
        |FROM events e
        | ASOF LEFT JOIN (
        |   SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS p_ts_us, value
        |   FROM events WHERE event_type = 'purchase') p
        | ON e.user_id = p.user_id
        |  AND epoch_us(CAST(e.ts AS TIMESTAMP)) >= p.p_ts_us
        |ORDER BY e.user_id, e.event_id""".stripMargin,
    "q45_range_join" ->
      """SELECT c.user_id AS user_id, c.event_id AS click_id,
        | s.event_id AS signup_id,
        | c.value AS click_value, s.value AS lo, s.value + 50.0 AS hi
        |FROM events c JOIN events s
        |  ON c.user_id = s.user_id
        | AND c.event_type = 'click' AND s.event_type = 'signup'
        | AND c.value >= s.value AND c.value <= s.value + 50.0
        |ORDER BY 1, 2, 3""".stripMargin,
    "q46_heavy_hitters" ->
      s"""SELECT g AS token, count(*) AS n
         |FROM (SELECT unnest($toksSql) AS g FROM documents)
         |GROUP BY g
         |ORDER BY n DESC, token
         |LIMIT 20""".stripMargin,
    "q34_chunking" ->
      s"""WITH t AS (
         |  SELECT doc_id, $toksSql AS toks, $nTokSql AS n FROM documents),
         |c AS (
         |  SELECT doc_id,
         |    CASE WHEN n <= 32 THEN 1
         |         ELSE CAST(ceil(CAST(n - 32 AS DOUBLE) / 24) AS INT) + 1 END AS nc,
         |    toks
         |  FROM t)
         |SELECT doc_id,
         |  unnest(range(0, nc)) AS chunk_idx,
         |  unnest(list_transform(range(0, nc),
         |    i -> array_to_string(toks[i*24+1 : i*24+32], ' '))) AS chunk,
         |  unnest(list_transform(range(0, nc),
         |    i -> len(toks[i*24+1 : i*24+32]))) AS chunk_tokens
         |FROM c
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "q35_redact" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    concat(text, ' contact user', doc_id, '@example.com or http://ex.com/',
        |           doc_id, ' tel 555-123-4567 ip 10.0.0.1') AS dirty
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(dirty, 'https?://[^\s]+', '[URL]', 'g'),
        |        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g'),
        |    '\b[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}\b|\b[0-9]{3}[-.][0-9]{4}\b',
        |    '[PHONE]', 'g') AS clean
        |FROM d
        |ORDER BY doc_id""".stripMargin,
    "q36_percentiles" ->
      """SELECT lang,
        | CAST(floor(quantile_cont(n_chars, 0.5) * 10000.0 + 0.5) AS BIGINT) AS p50_e4,
        | CAST(floor(quantile_cont(n_chars, 0.9) * 10000.0 + 0.5) AS BIGINT) AS p90_e4,
        | count(*) AS n
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    "q37_stratified_sample" ->
      """SELECT lang, count(*) AS n_sampled
        |FROM documents
        |WHERE doc_id % 97 < (CASE WHEN lang = 'en' THEN 10 ELSE 29 END)
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
    "q38_fuzzy_match" ->
      """SELECT a.n_name AS name1, b.n_name AS name2,
        | CAST(levenshtein(a.n_name, b.n_name) AS BIGINT) AS dist
        |FROM nation a, nation b
        |WHERE a.n_name < b.n_name AND levenshtein(a.n_name, b.n_name) <= 5
        |ORDER BY name1, name2""".stripMargin,
    "q22_token_count" ->
      s"""SELECT doc_id,
         | CAST($nTokSql AS BIGINT) AS n_tokens,
         | CAST($nTokSql + len(regexp_extract_all(text,
         |   '[a-z][A-Z]|[A-Za-z][0-9]|[0-9][A-Za-z]|[[:punct:]]')) AS BIGINT)
         |   AS n_subwords,
         | CAST(length(text) AS BIGINT) AS n_chars_raw
         |FROM documents
         |ORDER BY doc_id""".stripMargin,
    "q23_text_quality" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST($nTokSql AS BIGINT) AS n_tokens,
         |    CAST(len(regexp_extract_all(text, '[[:punct:]]')) AS BIGINT) AS punct_cnt,
         |    CAST(len(list_filter($toksSql, t -> t IN ($stopListSql))) AS BIGINT) AS stop_cnt,
         |    CASE WHEN $nTokSql = 0 THEN 0.0
         |         ELSE CAST(length(replace($normSql, ' ', '')) AS DOUBLE) / $nTokSql
         |    END AS atl,
         |    length(text) AS n_chars
         |  FROM documents)
         |SELECT doc_id, n_tokens, punct_cnt, stop_cnt,
         | CAST(floor(atl * 10000.0 + 0.5) AS BIGINT) AS avg_token_len_e4,
         | CAST(floor((
         |   least(CAST(n_tokens AS DOUBLE) / 50.0, 1.0) * 0.3 +
         |   least((CASE WHEN n_tokens = 0 THEN 0.0
         |          ELSE CAST(stop_cnt AS DOUBLE) / n_tokens END) * 5.0, 1.0) * 0.3 +
         |   greatest(1.0 - (CASE WHEN n_chars = 0 THEN 0.0
         |          ELSE CAST(punct_cnt AS DOUBLE) / n_chars END) * 10.0, 0.0) * 0.2 +
         |   (CASE WHEN atl BETWEEN 2.5 AND 9.0 THEN 1.0 ELSE 0.4 END) * 0.2
         | ) * 10000.0 + 0.5) AS BIGINT) AS quality_e4
         |FROM m
         |ORDER BY doc_id""".stripMargin,
    "q24_lang_id" -> {
      val scoreSql = TextOps.langMarkers.map { case (lang, markers) =>
        val list = markers.map(w => s"'$w'").mkString(", ")
        s"len(list_filter($toksSql, t -> t IN ($list))) AS s_$lang"
      }.mkString(",\n    ")
      val langs = TextOps.langMarkers.map(_._1)
      val bestSql = langs.map(l => s"s_$l").reduce((a, b) => s"greatest($a, $b)")
      val caseSql = langs.map(l =>
        s"WHEN s_$l = best AND best > 0 THEN '$l'").mkString(" ")
      s"""WITH s AS (
         |  SELECT doc_id, lang,
         |    len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk,
         |    $scoreSql
         |  FROM documents),
         |b AS (SELECT *, $bestSql AS best FROM s),
         |p AS (
         |  SELECT doc_id, lang,
         |    CASE WHEN cjk > 0 THEN 'zh' $caseSql ELSE 'unknown' END AS lang_pred
         |  FROM b)
         |SELECT lang, lang_pred, count(*) AS n
         |FROM p GROUP BY lang, lang_pred
         |ORDER BY lang, lang_pred""".stripMargin
    },
    "q25_exact_dedup" ->
      s"""WITH f AS (
         |  SELECT doc_id, md5($normSql) AS fingerprint FROM documents),
         |g AS (
         |  SELECT doc_id, fingerprint,
         |    count(*) OVER (PARTITION BY fingerprint) AS dup_count,
         |    row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
         |  FROM f)
         |SELECT doc_id, fingerprint, dup_count
         |FROM g WHERE rn = 1
         |ORDER BY doc_id""".stripMargin,
    "q175_jaccard_join" ->
      s"""WITH sets AS (
         |  SELECT doc_id,
         |    CASE WHEN len($toksSql) < 2 THEN [$normSql]
         |         ELSE list_distinct(list_transform(
         |           range(0, len($toksSql) - 1),
         |           i -> concat_ws(' ', $toksSql[i+1], $toksSql[i+2])))
         |    END AS sh
         |  FROM documents),
         |sizes AS (SELECT doc_id, len(sh) AS n FROM sets),
         |inv AS (SELECT doc_id, unnest(sh) AS g FROM sets),
         |inter AS (
         |  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS inter
         |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id1, id2, inter,
         |  s1.n + s2.n - inter AS un,
         |  (inter * 1000000) // (s1.n + s2.n - inter) AS jac_e6
         |FROM inter
         | JOIN sizes s1 ON s1.doc_id = id1
         | JOIN sizes s2 ON s2.doc_id = id2
         |WHERE (inter * 1000000) // (s1.n + s2.n - inter) >= 500000
         |ORDER BY id1, id2""".stripMargin,
    "q183_containment_join" ->
      s"""WITH sets AS (
         |  SELECT doc_id,
         |    CASE WHEN len($toksSql) < 2 THEN [$normSql]
         |         ELSE list_distinct(list_transform(
         |           range(0, len($toksSql) - 1),
         |           i -> concat_ws(' ', $toksSql[i+1], $toksSql[i+2])))
         |    END AS sh
         |  FROM documents),
         |sizes AS (SELECT doc_id, len(sh) AS n FROM sets),
         |inv AS (SELECT doc_id, unnest(sh) AS g FROM sets),
         |inter AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id <> b.doc_id
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT id_a, id_b, inter, s1.n AS s_a,
         |  (inter * 1000000) // s1.n AS cont_e6
         |FROM inter JOIN sizes s1 ON s1.doc_id = id_a
         |WHERE (inter * 1000000) // s1.n >= 800000
         |ORDER BY id_a, id_b""".stripMargin,
    "q26_ngram_jaccard" ->
      s"""WITH $jaccard2gramCtes
         |SELECT id1, id2,
         |  round(CAST(inter AS DOUBLE) / (s1.n + s2.n - inter), 4) AS jaccard
         |FROM inter
         | JOIN sizes s1 ON s1.doc_id = id1
         | JOIN sizes s2 ON s2.doc_id = id2
         |WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.03
         |ORDER BY id1, id2""".stripMargin,
    "q65_range_frame" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS ts_s,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_cents
        |  FROM events)
        |SELECT user_id, event_id, ts_s, v_cents,
        |  CAST(sum(v_cents) OVER (PARTITION BY user_id ORDER BY ts_s
        |    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS rolling_10m_cents
        |FROM e
        |ORDER BY user_id, event_id""".stripMargin,
    "q66_pack" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST($nTokSql AS BIGINT) AS n_tokens,
         |    doc_id % 8 AS shard
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, shard,
         |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id)
         |         AS BIGINT) AS end_off,
         |    n_tokens
         |  FROM d)
         |SELECT doc_id, shard,
         |  end_off - n_tokens AS start_off,
         |  CAST(floor((end_off - n_tokens) / 512.0) AS BIGINT) AS bin,
         |  CAST(CASE WHEN n_tokens > 0 AND
         |    floor((end_off - 1) / 512.0) > floor((end_off - n_tokens) / 512.0)
         |    THEN 1 ELSE 0 END AS BIGINT) AS straddles
         |FROM p
         |ORDER BY doc_id""".stripMargin,
    "q63_bm25" -> {
      val terms = Seq("spark", "query", "fast")
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(t, x -> x = '$t')) AS DOUBLE) AS tf$i"
      }.mkString(",\n    ")
      val dfCols = terms.indices.map(i =>
        s"sum(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i")
        .mkString(",\n    ")
      val scoreSql = terms.indices.map { i =>
        s"""ln((n - df$i + 0.5) / (df$i + 0.5) + 1.0)
           | * (tf$i * 2.2) / (tf$i + 1.2 * (0.25 + 0.75 * dl / avgdl))"""
          .stripMargin.replace("\n", "")
      }.mkString("\n    + ")
      s"""WITH toks AS (
         |  SELECT doc_id, $toksSql AS t,
         |    CAST($nTokSql AS DOUBLE) AS dl
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, dl,
         |    $tfCols
         |  FROM toks),
         |stats AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl,
         |    $dfCols
         |  FROM tf)
         |SELECT doc_id, CAST(dl AS BIGINT) AS doc_len,
         |  CAST(floor(($scoreSql) * 10000.0 + 0.5) AS BIGINT) AS score_e4
         |FROM tf, stats
         |ORDER BY doc_id""".stripMargin
    },
    // q190: the q63 ranking over the NET corpus of the maintained index's
    // CDC scenario — takedowns (%7=1) removed, edits (%11=3) applied.
    // avgdl as exact Σdl/N (integer sum in double — both engines exact),
    // matching the serve side's sum/count.
    "q190_inc_text_index" -> bm25NetOracle(topK = None),
    // q193: the q190 ranking's top 25 on the (score_e4, doc_id) total order
    "q193_text_topk" -> bm25NetOracle(topK = Some(25)),
    // q194: same net corpus, reached at stream cadence
    "q194_cdc_text_index" -> bm25NetOracle(topK = None),
    "q60_decontaminate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $toksSql AS t, $normSql AS norm FROM documents),
         |grams AS (
         |  SELECT doc_id, unnest(
         |    CASE WHEN len(t) < 5 THEN [norm]
         |         ELSE list_distinct(list_transform(range(0, len(t) - 4),
         |           i -> concat_ws(' ', t[i+1], t[i+2], t[i+3], t[i+4], t[i+5])))
         |    END) AS g
         |  FROM toks),
         |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 7),
         |hits AS (
         |  SELECT DISTINCT doc_id FROM grams
         |  WHERE doc_id % 50 <> 7 AND g IN (SELECT g FROM bench))
         |SELECT doc_id,
         |  CAST(CASE WHEN doc_id IN (SELECT doc_id FROM hits)
         |       THEN 1 ELSE 0 END AS BIGINT) AS is_contaminated
         |FROM documents WHERE doc_id % 50 <> 7
         |ORDER BY doc_id""".stripMargin,
    "q153_cc_alternating" ->
      s"""WITH RECURSIVE $jaccard2gramCtes,
         |pairs AS (
         |  SELECT id1, id2 FROM inter
         |   JOIN sizes s1 ON s1.doc_id = id1
         |   JOIN sizes s2 ON s2.doc_id = id2
         |  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.03),
         |sym AS (
         |  SELECT id1 AS src, id2 AS dst FROM pairs
         |  UNION ALL
         |  SELECT id2 AS src, id1 AS dst FROM pairs),
         |walk(node, reach) AS (
         |  SELECT src, src FROM sym
         |  UNION
         |  SELECT w.node, s.dst FROM walk w JOIN sym s ON w.reach = s.src),
         |cc AS (SELECT node, min(reach) AS cluster_id FROM walk GROUP BY node)
         |SELECT node AS doc_id, cluster_id FROM cc
         |ORDER BY doc_id""".stripMargin,
    "q59_dup_clusters" ->
      s"""WITH RECURSIVE $jaccard2gramCtes,
         |pairs AS (
         |  SELECT id1, id2 FROM inter
         |   JOIN sizes s1 ON s1.doc_id = id1
         |   JOIN sizes s2 ON s2.doc_id = id2
         |  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.03),
         |sym AS (
         |  SELECT id1 AS src, id2 AS dst FROM pairs
         |  UNION ALL
         |  SELECT id2 AS src, id1 AS dst FROM pairs),
         |walk(node, reach) AS (
         |  SELECT src, src FROM sym
         |  UNION
         |  SELECT w.node, s.dst FROM walk w JOIN sym s ON w.reach = s.src),
         |cc AS (SELECT node, min(reach) AS cluster_id FROM walk GROUP BY node)
         |SELECT node AS doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |  CAST(CASE WHEN node = cluster_id THEN 1 ELSE 0 END AS BIGINT)
         |    AS is_canonical
         |FROM cc
         |ORDER BY doc_id""".stripMargin,
    "q128_canonical_retention" ->
      s"""WITH RECURSIVE $jaccard2gramCtes,
         |pairs AS (
         |  SELECT id1, id2 FROM inter
         |   JOIN sizes s1 ON s1.doc_id = id1
         |   JOIN sizes s2 ON s2.doc_id = id2
         |  WHERE CAST(inter AS DOUBLE) / (s1.n + s2.n - inter) >= 0.1),
         |sym AS (
         |  SELECT id1 AS src, id2 AS dst FROM pairs
         |  UNION ALL
         |  SELECT id2 AS src, id1 AS dst FROM pairs),
         |walk(node, reach) AS (
         |  SELECT src, src FROM sym
         |  UNION
         |  SELECT w.node, s.dst FROM walk w JOIN sym s ON w.reach = s.src),
         |cc AS (SELECT node, min(reach) AS cluster_id FROM walk GROUP BY node),
         |clusters AS (
         |  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
         |         d.n_chars
         |  FROM documents d LEFT JOIN cc ON cc.node = d.doc_id),
         |ranked AS (
         |  SELECT doc_id, cluster_id, n_chars,
         |    row_number() OVER (PARTITION BY cluster_id
         |                       ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM clusters)
         |SELECT doc_id, cluster_id, n_chars FROM ranked WHERE rn = 1
         |ORDER BY doc_id""".stripMargin,
    "q129_filter_funnel" ->
      s"""WITH attributed AS (
         |  SELECT CASE
         |    WHEN NOT (lang = 'en') THEN '1_lang_en'
         |    WHEN NOT (n_chars >= 100) THEN '2_min_chars'
         |    WHEN NOT (($nTokSql) >= 20) THEN '3_min_tokens'
         |    WHEN NOT (len(list_distinct($toksSql)) * 1000000 >=
         |              500000 * len($toksSql)) THEN '4_repetition'
         |    ELSE 'kept' END AS stage
         |  FROM documents),
         |counts AS (SELECT stage, count(*) AS n_rows FROM attributed
         |           GROUP BY stage),
         |stages AS (SELECT unnest(['1_lang_en','2_min_chars','3_min_tokens',
         |                          '4_repetition','kept']) AS stage)
         |SELECT s.stage, CAST(coalesce(c.n_rows, 0) AS BIGINT) AS n_rows
         |FROM stages s LEFT JOIN counts c ON c.stage = s.stage
         |ORDER BY s.stage""".stripMargin,
    "q131_stable_ids" ->
      """SELECT doc_id, source,
        |  row_number() OVER (ORDER BY doc_id) - 1 AS stable_id
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q130_source_overlap" ->
      s"""WITH tok0 AS (
         |  SELECT source AS g, unnest($toksSql) AS tok FROM documents),
         |toks AS (SELECT DISTINCT g, tok FROM tok0 WHERE tok <> ''),
         |sizes AS (SELECT g, count(*) AS n FROM toks GROUP BY g),
         |inter AS (
         |  SELECT a.g AS g1, b.g AS g2, count(*) AS overlap
         |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.g < b.g
         |  GROUP BY a.g, b.g)
         |SELECT g1, g2, s1.n AS n1, s2.n AS n2, overlap,
         |  s1.n + s2.n - overlap AS union_n,
         |  overlap * 1000000 // (s1.n + s2.n - overlap) AS jaccard_e6
         |FROM inter JOIN sizes s1 ON s1.g = g1 JOIN sizes s2 ON s2.g = g2
         |ORDER BY g1, g2""".stripMargin,
    "q29_cosine_topk" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 3),
        |scored AS (
        |  SELECT q.q_id, e.vec_id,
        |    round(
        |      list_sum(list_transform(list_zip(e.embedding, q.q_vec),
        |        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
        |      (sqrt(list_sum(list_transform(e.embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |       sqrt(list_sum(list_transform(q.q_vec,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4) AS cos
        |  FROM embeddings e, q
        |  WHERE e.vec_id <> q.q_id),
        |ranked AS (
        |  SELECT q_id, vec_id, cos,
        |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT q_id, vec_id, cos, rank
        |FROM ranked WHERE rank <= 10
        |ORDER BY q_id, rank""".stripMargin,
    "q31_multimodal" ->
      """SELECT doc_id AS media_id,
        | CASE WHEN doc_id % 5 <= 2 THEN 'image'
        |      WHEN doc_id % 5 = 3 THEN 'audio' ELSE 'video' END AS kind,
        | CAST(CASE WHEN doc_id % 5 <= 2 THEN 8 + doc_id % 24 ELSE 0 END AS INT) AS width,
        | CAST(CASE WHEN doc_id % 5 <= 2 THEN 8 + (doc_id * 7) % 24 ELSE 0 END AS INT) AS height,
        | CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
        |      WHEN 3 THEN 'wav' ELSE 'unknown' END AS format,
        | CAST(CASE WHEN doc_id % 5 = 4
        |      THEN greatest(1, (octet_length(encode(text)) // 1024) % 512)
        |      ELSE 1 END AS BIGINT) AS n_frames
        |FROM documents
        |ORDER BY media_id""".stripMargin
  )
}
