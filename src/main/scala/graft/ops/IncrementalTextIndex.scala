package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Lineage.LineageSyntax
import graft.sinks.AppendOnlyStore

/** Incrementally-maintained INVERTED INDEX over a document stream, with
  * BM25 serving — the search-index analog of the IVM family: the corpus
  * is never re-scanned, yet lexical ranking over the CURRENT corpus
  * (inserts, takedowns, edits all applied) is always available.
  *
  * State = two maintained aggregates (both [[IncrementalAgg]] stores,
  * so signed deltas, crash-replay idempotence, and per-prefix
  * incremental compaction are inherited wholesale):
  *
  *  - `postings` — key `(term, doc)`, maintained `tf` sum: the classic
  *    postings list. Keyed at (term, doc) granularity BECAUSE that is
  *    what makes document-frequency retractable: a takedown re-presents
  *    the doc's text with multiplicity −1, its per-term rows net to
  *    zero, and df (= count of live postings per term) follows — df is
  *    NOT linear at term granularity alone, but it is at (term, doc).
  *    The store's partition prefix derives from `md5(term)`
  *    (`__term_key`), so a serve-time probe for a handful of
  *    query terms prunes to a handful of prefix DIRECTORIES — the probe
  *    reads df-bounded bytes, not the index.
  *  - `docs` — key `(doc)`, maintained `dl` (token count) sum: the
  *    per-doc length BM25's normalization reads per candidate.
  *  - `stats` — a CONSTANT key, maintained `(N, Σdl)`: the two global
  *    scalars idf and length normalization need, kept as a 1-row
  *    aggregate (one partial per batch) so a serve never pays a
  *    doc-length-state aggregate scan for them. avgdl is served as
  *    Σdl/N (exact: integer sums in double stay exact below 2^53),
  *    never a float running mean — what keeps scores engine-portable.
  *
  * Ingestion contract: one logical batch = a set of doc VERSIONS with a
  * signed multiplicity — insert (+1), takedown (−1, re-presenting the
  * removed version's text), edit (−old +new under one batch id). Batch
  * cost: tokenize once, one token-sized shuffle per store append —
  * proportional to the batch, never the corpus, the invariant the whole
  * IVM family holds. Replays of a batch id are no-ops via the partial
  * rows' (key, batch_id) dedup.
  *
  * Serving cost at 100 TB: corpus-linear over the doc-length STATE (one
  * row per live doc — scoring every doc is inherently that) plus a
  * directory-pruned df-bounded postings probe; zero raw-text IO. The
  * same maintained state would serve top-k with a rank-limit on top.
  *
  * The reference's pipelines re-run ranking queries over re-ingested
  * corpora from scratch (dbt full-refresh posture); this module is the
  * beyond-reference capability that keeps those queries warm under CDC.
  */
object IncrementalTextIndex {

  /** Index state under one root: `<root>/postings` + `<root>/docs` +
    * `<root>/stats` (the 1-row maintained (N, Σdl) aggregate BM25's idf
    * and length normalization read — without it every serve would pay a
    * full doc-length-state aggregate scan just for two scalars). */
  final case class Stores(postings: AppendOnlyStore, docs: AppendOnlyStore,
                          stats: AppendOnlyStore, idCol: String)

  private val TermKeyCol = "__term_key"

  private def postSpec(idCol: String) =
    IncrementalAgg.Spec(Seq(TermKeyCol, "term", idCol), Seq("tf"))
  private def docsSpec(idCol: String) =
    IncrementalAgg.Spec(Seq(idCol), Seq("dl"))
  // constant key → one maintained row: n_rows = net N, sum_dl = net Σdl
  private val statsSpec = IncrementalAgg.Spec(Seq("__tag"), Seq("dl"))

  def stores(spark: SparkSession, root: String, idCol: String): Stores =
    Stores(
      new AppendOnlyStore(spark, s"$root/postings",
        prefixCol = TermKeyCol, prefixChars = 2),
      new AppendOnlyStore(spark, s"$root/docs",
        prefixCol = "__agg_key", prefixChars = 1),
      new AppendOnlyStore(spark, s"$root/stats",
        prefixCol = "__agg_key", prefixChars = 1),
      idCol)

  /** md5 hex of a query-term literal, prefixed with a letter so the
    * store's prefix DIRECTORY value can never be all-digits (partition
    * type inference would read such a directory back as an integer and
    * the serve-time prefix filter would silently miss it). The stored
    * `__term_key` ([[appendDelta]]) is built the same way. */
  private def termKey(t: String): String =
    "t" + java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Maintain the index with one signed batch of doc versions.
    * `deltaCol` (±1 per row) defaults to +1 for every row when absent.
    * Same-id re-appends are the REPLAY contract (no-op); presenting a
    * new version of a live doc without retracting the old one is a
    * caller error that surfaces as doubled postings, by design. */
  def appendDelta(st: Stores, batch: DataFrame, textCol: String,
                  batchId: Long, deltaCol: Option[String] = None): Unit = {
    val id = col(st.idCol)
    val d = deltaCol.map(c => col(c).cast("long")).getOrElse(lit(1L))
    // tokenize ONCE; both store appends re-read the frame
    val toked = batch
      .select(id, d.as("__delta"), TextOps.tokens(col(textCol)).as("__toks"))
      .cutLineage()
    // blank text tokenizes to [""] — token count 0, no postings
    val dl = when(size(col("__toks")) === 1 &&
        element_at(col("__toks"), 1) === "", 0L)
      .otherwise(size(col("__toks")).cast("long"))
    IncrementalAgg.appendDelta(st.docs,
      toked.select(id, dl.as("dl"), col("__delta")),
      docsSpec(st.idCol), batchId, "__delta")
    // the same signed (dl, δ) rows, folded under a CONSTANT key: the
    // per-batch partial is one row; serving (N, Σdl) reads this store
    // only, never a doc-state aggregate
    IncrementalAgg.appendDelta(st.stats,
      toked.select(lit("s").as("__tag"), dl.as("dl"), col("__delta")),
      statsSpec, batchId, "__delta")
    val postings = toked
      .select(id, col("__delta"), explode(col("__toks")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(id, col("term"), col("__delta"))
      .agg(count(lit(1)).as("tf"))
      .withColumn(TermKeyCol, concat(lit("t"), md5(col("term"))))
    IncrementalAgg.appendDelta(st.postings, postings,
      postSpec(st.idCol), batchId, "__delta")
  }

  /** Live postings: (term, doc, tf) for every CURRENT doc version. */
  def currentPostings(st: Stores): DataFrame =
    IncrementalAgg.current(st.postings, postSpec(st.idCol))
      .select(col("term"), col(st.idCol), col("sum_tf").as("tf"))

  /** Live docs: (doc, doc_len). */
  def currentDocs(st: Stores): DataFrame =
    IncrementalAgg.current(st.docs, docsSpec(st.idCol))
      .select(col(st.idCol), col("sum_dl").as("doc_len"))

  /** Okapi BM25 of every LIVE doc against `terms`, served entirely from
    * the maintained state — (id, doc_len, score), same contract as
    * [[TextOps.bm25]] over the net corpus (score 0.0 when nothing
    * matches; fixed-order per-term fold so float results are
    * engine-portable). The postings probe filters on the term-key
    * PREFIX partition column first — directory pruning — then exact
    * terms; (N, Σdl→avgdl) reads the maintained 1-row stats store and
    * per-term df folds from the pruned probe — each one broadcast row. */
  def bm25(st: Stores, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoredDocs(st, terms, k1, b, candidatesOnly = false)

  /** The shared serve core. `candidatesOnly = false` scores every live
    * doc (full-ranking contract, zero score when nothing matches);
    * `true` inner-joins the doc lengths TO the candidate tf rows, so
    * scoring work is df-bounded — unmatched docs never enter the plan. */
  private def scoredDocs(st: Stores, terms: Seq[String],
                         k1: Double, b: Double,
                         candidatesOnly: Boolean): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one term")
    val id = col(st.idCol)
    val prefixes = terms.map(termKey(_).take(2)).distinct
    // referenced by the pivot AND the df fold → evaluates twice; kept
    // UN-cut deliberately: the probe is directory-pruned and df-bounded,
    // so two scans cost less than a materialization barrier, and the
    // partition filter stays visible in the serve plan (spec-gated)
    val post = IncrementalAgg.current(st.postings, postSpec(st.idCol),
        col("prefix").isin(prefixes: _*) && col("term").isin(terms: _*))
      .select(col("term"), id, col("sum_tf").as("tf"))
      .filter(col("tf") > 0)
    val tfAggs = terms.zipWithIndex.map { case (t, i) =>
      max(when(col("term") === t, col("tf"))).as(s"__tf$i")
    }
    val tfWide = post.groupBy(id).agg(tfAggs.head, tfAggs.tail: _*)
    val docsCur = currentDocs(st)
      .select(id, col("doc_len").cast("double").as("doc_len"))
    val withTf = (if (candidatesOnly)
        tfWide.join(docsCur, Seq(st.idCol))
      else docsCur.join(tfWide, Seq(st.idCol), "left"))
      .select(id +: col("doc_len") +: terms.indices.map(i =>
        coalesce(col(s"__tf$i").cast("double"), lit(0.0)).as(s"__tf$i")): _*)
    // global stats: served from the MAINTAINED 1-row stats store (one
    // partial per batch, folded) — never an aggregate scan over the
    // doc-length state; avgdl as exact Σdl/N (integer sums in double
    // stay exact below 2^53)
    val nStats = IncrementalAgg.current(st.stats, statsSpec)
      .select(col("n_rows").cast("double").as("__n"),
        (col("sum_dl").cast("double") / col("n_rows")).as("__avgdl"))
    val dfAggs = terms.indices.map(i =>
      sum(when(col("term") === terms(i), 1.0).otherwise(0.0)).as(s"__df$i"))
    val dfStats = post.agg(dfAggs.head, dfAggs.drop(1): _*)
    val score = terms.indices.map { i =>
      // a term with no live posting at all: its global-agg sum is null
      val dfi = coalesce(col(s"__df$i"), lit(0.0))
      val idf = log((col("__n") - dfi + 0.5) / (dfi + 0.5) + 1.0)
      val denom = col(s"__tf$i") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("doc_len") / col("__avgdl"))
      idf * (col(s"__tf$i") * (k1 + 1.0)) / denom
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(nStats)).crossJoin(broadcast(dfStats))
      .select(id, col("doc_len").cast("long").as("doc_len"),
        score.as("score"))
  }

  /** Top-`kTop` BM25 — the serve-cost story [[bm25]] can't tell at
    * 100 TB: scoring is restricted to docs holding AT LEAST ONE query
    * term's posting. Sound because Okapi idf here is
    * `ln((N−df+0.5)/(df+0.5)+1) > 0` always and tf-less terms
    * contribute 0, so every unmatched doc scores exactly 0.0 — strictly
    * below every matched doc. Serve cost: a directory-pruned df-bounded
    * postings probe + a key-join for the candidates' doc lengths + one
    * aggregate-only pass for (N, Σdl) — never a per-doc corpus scoring
    * pass. When fewer than `kTop` docs match, the remainder pads from
    * the zero-score tier in doc-id order (the same total order the full
    * ranking would produce). Scores are served quantized (`score_e4`,
    * floor(score·10⁴+0.5)) and ranked on (score_e4 DESC, id ASC) — a
    * total integer order, so the cut is engine-portable. */
  def bm25TopK(st: Stores, terms: Seq[String], kTop: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(kTop > 0, "bm25TopK needs kTop > 0")
    val id = col(st.idCol)
    val matched = scoredDocs(st, terms, k1, b, candidatesOnly = true)
      .withColumn("score_e4", floor(col("score") * 10000.0 + 0.5))
      .drop("score")
    // zero-score pad: only consulted when matches run out; the kTop
    // smallest-id unmatched docs suffice for any cut (an aggregate-free
    // ordered limit over the doc-length state, no scoring)
    val pad = currentDocs(st)
      .join(matched.select(id), Seq(st.idCol), "left_anti")
      .orderBy(id).limit(kTop)
      .withColumn("score_e4", lit(0L))
    // the cut compiles to TakeOrderedAndProject — a distributed heap,
    // never a global sort; the rank window then orders ≤ kTop rows
    val cut = matched.unionByName(pad)
      .orderBy(col("score_e4").desc, id.asc).limit(kTop)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score_e4").desc, id.asc)
    cut.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Compact both stores (quiescence, single-writer — the standard
    * store-compaction contract). Result-invariant. */
  def compact(st: Stores): Unit = {
    IncrementalAgg.compact(st.postings, postSpec(st.idCol))
    IncrementalAgg.compact(st.docs, docsSpec(st.idCol))
    IncrementalAgg.compact(st.stats, statsSpec)
  }
}
