package graft.ops

import graft.ops.Lineage.LineageSyntax
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: token counting,
  * quality scoring, language identification, fingerprinting.
  *
  * All pure `org.apache.spark.sql.functions` compositions — codegen'd,
  * whole-stage-compiled, no UDFs — so every op runs at parquet-scan speed
  * and scales linearly with executors. Each returns a `Column` so callers
  * compose them into one projection (one pass over 100 TB, not five).
  */
object TextOps {

  /** Canonical text form for hashing/dedup: lowercase, collapse runs of
    * whitespace, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Unicode NFC canonical composition ([[graft.functions.NfcNormalize]]):
    * decomposed accent sequences ("e"+U+0301) collapse to their composed
    * form ("é"), so canonically-equivalent text fingerprints identically.
    * Fast-path no-op (zero allocation) for ASCII / already-composed rows. */
  def nfc(text: Column): Column =
    ExpressionUtils.column(
      graft.functions.NfcNormalize(ExpressionUtils.expression(text)))

  /** Strips C0/C1 control characters (except tab, LF, CR) — the bytes that
    * break downstream tokenizers and TSV/JSONL exports. Pure
    * `regexp_replace`, codegen'd. */
  def stripControl(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]", "")

  /** Ingest-side text canonicalization: NFC composition then control-char
    * strip. Run before fingerprinting/dedup so canonical equivalence and
    * junk bytes never split a duplicate class. One projection, one pass. */
  def cleanText(text: Column): Column = stripControl(nfc(text))

  /** HTML → text extraction: drops script/style blocks, strips all tags,
    * decodes the common named entities, collapses the whitespace the
    * removed markup leaves behind. Regex-only (no parser — crawl HTML is
    * malformed anyway and a DOM parse of 100 TB is not a plan), fully
    * codegen'd, and every pattern is RE2-compatible (no backreferences)
    * so a SQL oracle can replay it verbatim. `&amp;` decodes LAST so
    * double-escaped text ("&amp;lt;") yields the literal "&lt;" it
    * means, not a spurious "<". */
  def stripHtml(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(text, "(?is)<script[^>]*>.*?</script>", " "),
      "(?is)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]+>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&"
    ).foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Lowercased authority of a URL with the scheme's default port
    * (`:80`/`:443`) and a leading `www.` stripped; a non-default port is
    * kept (it names a different origin). Scheme and path casing are
    * handled by [[canonicalizeUrl]]; this is the host key used for
    * per-site grouping. */
  def urlHost(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noPort = when(scheme === "http", regexp_replace(auth, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth, ":443$", ""))
      .otherwise(auth)
    regexp_replace(noPort, "^www\\.", "")
  }

  /** Canonical URL form for web-corpus dedup and per-site statistics:
    * lowercase scheme + host, default port and `www.` stripped, fragment
    * dropped, trailing path slashes trimmed (bare authority → `/`),
    * tracking parameters (`utm_*`, `gclid`, `fbclid`, `ref`) removed and
    * the surviving query parameters sorted. Page-identical variants
    * (`HTTP://WWW.X.COM/a/?utm_source=f#top` vs `http://x.com/a`) then
    * hash identically, which is what URL-level dedup needs; path CASE is
    * preserved (paths are case-sensitive).
    *
    * Pure `functions._` composition (regex splits + one `filter`/
    * `array_sort` over the handful of query params) — codegen'd, scales
    * as a scan projection with zero shuffles. */
  def canonicalizeUrl(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val path0 = regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val q0 = regexp_extract(u, "\\?([^#]*)", 1)
    val trimmedPath = regexp_replace(path0, "/+$", "")
    val path = when(length(trimmedPath) === 0, lit("/")).otherwise(trimmedPath)
    val kept = array_sort(filter(split(q0, "&"),
      p => p =!= lit("") && !p.rlike("^(utm_[^=]*|gclid|fbclid|ref)=")))
    val qs = array_join(kept, "&")
    concat(scheme, lit("://"), urlHost(url), path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Registered (pay-level) domain of a hostname — the aggregation key
    * for per-site quotas and blocklists, where subdomains of one owner
    * must collapse (`cdn.news.example.co.uk` → `example.co.uk`). Uses the
    * common-second-level heuristic (last two labels, or three when the
    * penultimate label is a shared registry label like `co`/`com`/`ac`)
    * rather than the full public-suffix list — the standard tradeoff when
    * shipping no lookup table; swap in a broadcast PSL set for exactness.
    * Expects a bare hostname (strip any `:port` first). */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    when(size(labels) <= 2, host)
      .when(element_at(labels, -2)
          .isin("co", "com", "net", "org", "gov", "ac", "edu"),
        concat_ws(".", slice(labels, -3, 3)))
      .otherwise(concat_ws(".", slice(labels, -2, 2)))
  }

  /** Total blocklist-phrase occurrences
    * ([[graft.functions.MultiSubstringCount]]): one Aho-Corasick scan per
    * row regardless of blocklist size — the C4-style bad-word/boilerplate
    * filter primitive. Byte-level: normalize/lowercase the text first if
    * the blocklist is normalized. */
  def blocklistCount(text: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(graft.functions.MultiSubstringCount(
      ExpressionUtils.expression(text), patterns))

  /** True when any blocklist phrase occurs (same single scan). */
  def blocklistHit(text: Column, patterns: Seq[String]): Column =
    blocklistCount(text, patterns) > 0

  /** zlib-compressibility ratio ([[graft.functions.DeflateRatio]]):
    * low values flag repetitive/boilerplate text; prose sits ~0.6-0.8.
    * The third quality axis beside the Gopher rules and the LM score. */
  def compressionRatio(text: Column): Column =
    ExpressionUtils.column(
      graft.functions.DeflateRatio(ExpressionUtils.expression(text)))

  /** Occurrences of common UTF-8-decoded-as-Latin-1 artifacts ("Ã", "Â",
    * "â€", "ï¿½") and the replacement character U+FFFD — the standard
    * mojibake tells. High counts flag documents whose upstream decode was
    * wrong (re-decode or drop; repair is out of scope engine-side). */
  def mojibakeCount(text: Column): Column =
    regexp_count(text, lit("Ã|Â|â€|ï¿½|�")).cast("long")

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Token count (whitespace tokenization; 0 for empty/blank). */
  def tokenCount(text: Column): Column =
    when(length(normalize(text)) === 0, lit(0L))
      .otherwise(size(tokens(text)).cast("long"))

  /** Pairwise vocabulary-overlap matrix between corpus groups (the
    * source-contamination / domain-similarity report): distinct
    * (group, token) collapse first, then an inverted-index join on the
    * token — never a row-level self-join — then per-pair intersection
    * counts and integer-DIV-e6 Jaccard from the exact set sizes.
    *
    * Shape at 100 TB: the distinct collapse bounds everything downstream
    * by |groups|·|vocab| (millions of rows, not corpus rows); each token
    * fans out to at most |groups| sides of the join, so the pair
    * aggregate is |vocab|·|groups|² worst case with map-side partial
    * aggregation — the corpus itself is scanned once and never
    * shuffled. */
  def vocabOverlap(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(groupCol).as("g"), explode(tokens(col(textCol))).as("tok"))
      .where(col("tok") =!= "").distinct()
    val sizes = toks.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val inter = toks.as("a")
      .join(toks.as("b"), col("a.tok") === col("b.tok") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
      .agg(count(lit(1)).as("overlap"))
    inter
      .join(sizes.select(col("g").as("g1"), col("n").as("n1")), Seq("g1"))
      .join(sizes.select(col("g").as("g2"), col("n").as("n2")), Seq("g2"))
      .withColumn("union_n", col("n1") + col("n2") - col("overlap"))
      .withColumn("jaccard_e6", expr("overlap * 1000000 DIV union_n"))
      .select(col("g1"), col("g2"), col("n1"), col("n2"),
        col("overlap"), col("union_n"), col("jaccard_e6"))
  }

  /** BPE-ish subword count estimate: words + intra-word transitions that
    * typically split (case flips, letter↔digit, punctuation). A cheap,
    * deterministic proxy for tokenizer budget at corpus scale. */
  def subwordCountEstimate(text: Column): Column =
    tokenCount(text) +
      size(regexp_extract_all(text, lit("[a-z][A-Z]|[A-Za-z][0-9]|[0-9][A-Za-z]|[\\p{Punct}]"), lit(0))).cast("long")

  /** Punctuation chars / total chars (0 for empty). */
  def punctRatio(text: Column): Column = {
    val n = length(text)
    when(n === 0, lit(0.0)).otherwise(
      size(regexp_extract_all(text, lit("[\\p{Punct}]"), lit(0))).cast("double") / n)
  }

  /** English-ish stopword token ratio — one marker-class regex pass. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "at", "by", "it", "be", "this", "that")

  def stopwordRatio(text: Column): Column = {
    val n = tokenCount(text)
    val hits = size(filter(tokens(text), t => t.isin(stopwords: _*))).cast("double")
    when(n === 0, lit(0.0)).otherwise(hits / n)
  }

  def avgTokenLen(text: Column): Column = {
    val n = tokenCount(text)
    when(n === 0, lit(0.0))
      .otherwise(length(regexp_replace(normalize(text), " ", "")).cast("double") / n)
  }

  /** Composite quality score in [0,1] (C4/Gopher-style cheap filters):
    * rewards moderate length, some stopwords, low punctuation density,
    * word-like average token length. Deterministic, tunable weights. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio(text) * 10.0, lit(0.0))
    val wordScore = when(avgTokenLen(text).between(2.5, 9.0), lit(1.0)).otherwise(lit(0.4))
    lenScore * 0.3 + stopScore * 0.3 + punctScore * 0.2 + wordScore * 0.2
  }

  /** Language-ID marker classes: per-language high-frequency function words
    * plus a CJK script test. Matched as whole tokens. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to", "in", "that", "with"),
    "es" -> Seq("el", "la", "los", "las", "que", "de", "y", "en", "un", "una", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "pour", "que", "vous"))

  /** N-gram-heuristic language ID: score = marker-token hits per language;
    * CJK script presence short-circuits to zh; argmax with fixed tie order
    * (en > es > de > fr > unknown). Pure column expression — no UDF. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, t => t.isin(markers: _*)))
    }
    val cjk = size(regexp_extract_all(text, lit("[\\u4e00-\\u9fff]"), lit(0)))
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val argmax = scores.foldRight(lit("unknown")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    // NB foldRight + `when` chain means earlier entries win ties
    when(cjk > 0, lit("zh")).otherwise(argmax)
  }

  /** Content fingerprint: md5 of normalized text — engine-portable (md5 is
    * bit-identical everywhere), the exact-dedup key. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Word k-grams ("shingles") of the normalized text, distinct. The unit
    * set for Jaccard/MinHash similarity. Backed by the native
    * [[graft.functions.Shingles]] expression — the declarative HOF chain
    * it replaces evaluates interpreted per element and dominated every
    * dedup query's runtime (see [[shinglesHof]], kept as the parity
    * twin). */
  def shingles(text: Column, k: Int): Column =
    ExpressionUtils.column(
      graft.functions.Shingles(ExpressionUtils.expression(text), k))

  /** Hash per shingle, mod 2^31-1 — the numeric universe for MinHash
    * permutations. xxhash64 of the k-gram string; strictly positive.
    * Native [[graft.functions.ShingleHashes]], one fused loop per row. */
  def shingleHashes(text: Column, k: Int): Column =
    ExpressionUtils.column(graft.functions.ShingleHashes(
      ExpressionUtils.expression(text), k, mod = 2147483647L))

  /** Full-64-bit shingle hashes (no modulus): decontamination gram keys,
    * where 2^31 birthday collisions would false-flag at corpus scale. */
  def shingleHashesRaw(text: Column, k: Int): Column =
    ExpressionUtils.column(graft.functions.ShingleHashes(
      ExpressionUtils.expression(text), k, mod = 0L))

  /** NON-distinct word k-grams (every occurrence, document order): the
    * multiset the repetition metrics count duplicates over. */
  def shinglesAll(text: Column, k: Int): Column =
    ExpressionUtils.column(graft.functions.Shingles(
      ExpressionUtils.expression(text), k, distinct = false))

  /** NON-distinct full-64-bit gram hashes in document order: position j
    * of the array is the window starting at token j (posexplode pairs
    * each window hash with its token offset — the repeated-span index). */
  def shingleHashesRawAll(text: Column, k: Int): Column =
    ExpressionUtils.column(graft.functions.ShingleHashes(
      ExpressionUtils.expression(text), k, mod = 0L, distinct = false))

  /** The declarative formulation [[shingles]] replaced — semantically
    * identical, ~20× slower (interpreted nested lambdas). Kept ONLY as
    * the oracle twin for the native-vs-declarative parity spec. */
  private[graft] def shinglesHof(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = size(toks)
    when(n < k, array(normalize(text))).otherwise(
      array_distinct(transform(
        sequence(lit(0), n - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k))))))
  }

  /** One-pass text metrics: materialize the normalized text and token
    * array ONCE as columns, then derive every metric from them.
    *
    * Spark's subexpression elimination does NOT dedupe the repeated
    * `regexp_replace`+`split` chains the standalone column functions above
    * expand to — measured 9× slower when each metric re-tokenizes. Alias
    * boundaries survive optimization (CollapseProject refuses to inline
    * non-cheap expressions referenced more than once), so this form is one
    * pass over the text at any scale. Adds: n_tokens, punct_cnt, stop_cnt,
    * avg_token_len, quality (raw double), and lang_pred when requested. */
  def withMetrics(df: DataFrame, textCol: String,
                  includeLang: Boolean = false): DataFrame = {
    val text = col(textCol)
    val base = df
      .withColumn("__norm", normalize(text))
      .withColumn("__toks", split(col("__norm"), " "))
      .withColumn("n_tokens",
        when(length(col("__norm")) === 0, lit(0L))
          .otherwise(size(col("__toks")).cast("long")))
      .withColumn("punct_cnt",
        size(regexp_extract_all(text, lit("[\\p{Punct}]"), lit(0))).cast("long"))
      .withColumn("stop_cnt",
        size(filter(col("__toks"), t => t.isin(stopwords: _*))).cast("long"))
      .withColumn("avg_token_len",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(length(regexp_replace(col("__norm"), " ", "")).cast("double")
            / col("n_tokens")))
    val withQuality = base.withColumn("quality", {
      val lenScore = least(col("n_tokens").cast("double") / 50.0, lit(1.0))
      val stopScore = least(
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("stop_cnt").cast("double") / col("n_tokens")) * 5.0, lit(1.0))
      val punctScore = greatest(lit(1.0) -
        when(length(text) === 0, lit(0.0))
          .otherwise(col("punct_cnt").cast("double") / length(text)) * 10.0, lit(0.0))
      val wordScore = when(col("avg_token_len").between(2.5, 9.0), lit(1.0)).otherwise(lit(0.4))
      lenScore * 0.3 + stopScore * 0.3 + punctScore * 0.2 + wordScore * 0.2
    })
    val out = if (!includeLang) withQuality else {
      val scores = langMarkers.map { case (lang, markers) =>
        lang -> size(filter(col("__toks"), t => t.isin(markers: _*)))
      }
      val cjk = size(regexp_extract_all(text, lit("[\\u4e00-\\u9fff]"), lit(0)))
      val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
      val argmax = scores.foldRight(lit("unknown")) { case ((lang, s), acc) =>
        when(s === best && best > 0, lit(lang)).otherwise(acc)
      }
      withQuality.withColumn("lang_pred", when(cjk > 0, lit("zh")).otherwise(argmax))
    }
    out.drop("__norm", "__toks")
  }

  /** Token-bounded chunking with overlap — the context-window splitter for
    * training-data prep. Chunk i covers tokens [i*(size-overlap),
    * i*(size-overlap)+size); the last chunk is short rather than dropped.
    * Returns array<string>; explode + posexplode downstream. Pure column
    * algebra, so chunking 100 TB is a projection, not a shuffle. */
  def chunk(text: Column, chunkTokens: Int, overlap: Int): Column = {
    require(overlap < chunkTokens, "overlap must be < chunkTokens")
    val step = chunkTokens - overlap
    val toks = tokens(text)
    val n = size(toks)
    val numChunks = when(n <= chunkTokens, lit(1))
      .otherwise(ceil((n - lit(chunkTokens)).cast("double") / step).cast("int") + 1)
    transform(sequence(lit(0), numChunks - 1),
      i => concat_ws(" ", slice(toks, i * step + 1, lit(chunkTokens))))
  }

  /** Gopher quality rules (Rae et al. 2021, §A1.1) — the published
    * rule-set for pretraining-corpus document filtering, as per-rule
    * boolean columns plus the conjunction, so `CurationOps.filterFunnel`
    * can attribute drops per rule. Every test is INTEGER arithmetic
    * (cross-multiplied ratios — `10·symbols < words`, never a float
    * division), making the flags bit-portable to any engine. One
    * projection pass; no shuffle, no UDFs.
    *
    * Rules implemented (the text-only subset; line-shape rules live in
    * [[dedupFrequentLines]]'s domain):
    *  - `r_word_count`: words ∈ [minWords, maxWords]
    *  - `r_mean_word_len`: mean word length ∈ [3, 10] chars
    *  - `r_symbol_ratio`: (# + …) symbol-to-word ratio < 0.1
    *  - `r_alpha_ratio`: ≥80 % of words contain an alphabetic char
    *  - `r_stopwords`: ≥2 DISTINCT stop words present
    */
  /** The paper's own stop-word list (Rae et al. 2021, §A1.1). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  def gopherQualityFlags(df: DataFrame, textCol: String,
                         minWords: Long = 50L,
                         maxWords: Long = 100000L,
                         stops: Seq[String] = gopherStopwords): DataFrame = {
    val t = col(textCol)
    // materialize the token array ONCE behind an alias boundary: the
    // higher-order functions below are CodegenFallback, so without it
    // each rule column re-runs the regex split per row (measured ~2×
    // end-to-end); multi-referenced non-cheap aliases survive
    // CollapseProject (same pattern as simhashPortable's md5 aliases)
    val withToks = df.withColumn("__toks", tokens(t))
      .withColumn("__nw", tokenCount(t))
    val toks = col("__toks")
    val nw = col("__nw")
    // single-space normalization makes Σ|word| pure arithmetic:
    // length(norm) − (nw − 1) separators — no higher-order fold needed
    val sumChars = when(nw === 0L, lit(0L))
      .otherwise(length(normalize(t)).cast("long") - nw + 1L)
    val nHash = (length(t) - length(regexp_replace(t, "#", ""))).cast("long")
    val nEll = ((length(t) -
      length(regexp_replace(t, "\\.\\.\\.", ""))) / 3).cast("long")
    val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(array_intersect(toks,
      array(stops.map(lit): _*))).cast("long")
    withToks
      .withColumn("r_word_count", nw >= minWords && nw <= maxWords)
      .withColumn("r_mean_word_len",
        nw > 0L && sumChars >= lit(3L) * nw && sumChars <= lit(10L) * nw)
      .withColumn("r_symbol_ratio", lit(10L) * (nHash + nEll) < nw)
      .withColumn("r_alpha_ratio", lit(5L) * nAlpha >= lit(4L) * nw)
      .withColumn("r_stopwords", nStop >= 2L)
      .withColumn("gopher_pass",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_symbol_ratio") && col("r_alpha_ratio") &&
          col("r_stopwords"))
      .drop("__toks", "__nw")
  }

  /** Line-level boilerplate removal — the C4/RefinedWeb corpus-dedup
    * step: any line occurring in ≥ `minDocFreq` DISTINCT documents is
    * navigation/footer/licence boilerplate and is dropped from every
    * document; surviving lines rejoin in original order. Returns
    * `(idCol, textCol, n_lines_kept, n_lines_removed)` — a doc whose
    * every line is boilerplate keeps an empty string (drop with the
    * length filters downstream).
    *
    * Plan shape at 100 TB: posexplode → line-frequency aggregate
    * (partial-agg'd shuffle keyed on the line string — lines are short,
    * and keeping the RAW string is what makes the op exact and
    * cross-engine checkable; pre-hash to 8 bytes if line text dominates
    * the shuffle) → one left join back (AQE broadcasts the frequent set
    * when small) → per-document rebuild via array_sort(collect_list) —
    * state bounded by ONE document's lines, the unit that fits by
    * definition. No windows, no driver state. */
  def dedupFrequentLines(df: DataFrame, textCol: String, idCol: String,
                         minDocFreq: Long,
                         delim: String = "\n"): DataFrame = {
    val lit_delim = java.util.regex.Pattern.quote(delim)
    // coalesce BEFORE split: a null text becomes [""] so the doc
    // survives the explode — no recovery join needed afterwards
    val lines = df.select(col(idCol),
      posexplode(split(coalesce(col(textCol), lit("")), lit_delim))
        .as(Seq("pos", "line")))
    val freq = lines.groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .where(col("__df") >= minDocFreq)
      .select(col("line"), lit(true).as("__rm"))
    val flagged = lines.join(freq, Seq("line"), "left")
      .select(col(idCol), col("pos"), col("line"),
        coalesce(col("__rm"), lit(false)).as("__rm"))
    flagged.groupBy(col(idCol)).agg(
      array_join(
        transform(
          filter(array_sort(collect_list(struct(col("pos"), col("line"),
            col("__rm")))), x => !x.getField("__rm")),
          x => x.getField("line")),
        delim).as(textCol),
      sum(when(col("__rm"), 0L).otherwise(1L)).as("n_lines_kept"),
      sum(when(col("__rm"), 1L).otherwise(0L)).as("n_lines_removed"))
  }

  /** PII redaction: emails, URLs, IPv4s, US-style phone numbers → typed
    * placeholder tags. Patterns are RE2-compatible (no lookaround) so the
    * same regexes run in any engine. One chained projection — single pass. */
  def redactPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val url = "https?://[^\\s]+"
    val ip = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
    val phone = "\\b[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}\\b|\\b[0-9]{3}[-.][0-9]{4}\\b"
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, url, "[URL]"),
          email, "[EMAIL]"),
        ip, "[IP]"),
      phone, "[PHONE]")
  }

  /** Token-stream packing for training batches: concatenate each shard's
    * documents (ordered by id) into one token stream and cut it at
    * `capacity`-token boundaries — the standard GPT-style pretraining
    * packing (documents straddle window boundaries; `straddles` flags
    * them). Adds shard, start_off, bin, straddles.
    *
    * Packing is inherently a prefix-sum; a single global cumsum would
    * serialize on one partition. Real pipelines pack PER OUTPUT SHARD, so
    * the window partitions by an arithmetic shard of the id (deterministic
    * across engines — no hash functions) and each shard's prefix sum runs
    * in parallel. Pure integer math end to end. */
  def packStream(docs: DataFrame, idCol: String, lenCol: String,
                 capacity: Int, shards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    docs.withColumn("shard", pmod(col(idCol), lit(shards)))
      .withColumn("__end", sum(col(lenCol)).over(w))
      .withColumn("start_off", (col("__end") - col(lenCol)).cast("long"))
      .withColumn("bin", floor(col("start_off") / capacity))
      .withColumn("straddles",
        col(lenCol) > 0 && floor((col("__end") - 1) / capacity) > col("bin"))
      .drop("__end")
  }

  /** BM25 relevance of every document against a fixed term list (Okapi
    * BM25, the standard k1/b parameterization) — the lexical-ranking
    * primitive for corpus search / quality-by-query filtering.
    *
    * Returns (idCol, doc_len, score) for ALL docs (score 0.0 when no term
    * matches). Shape at 100 TB: ONE pass over the text — per-term tf via
    * fused conditional counts on the token array (`size(filter(...))`,
    * codegen'd, no explode/shuffle), corpus stats (N, avgdl, per-term df)
    * in ONE tiny aggregate broadcast back as a 1-row join. The per-doc
    * score is a FIXED-ORDER sum over the term list — deterministic
    * (engine-portable) where a grouped float sum would not be. */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one term")
    // tokenize ONCE behind an alias boundary (CollapseProject won't inline
    // a non-cheap expr referenced K+1 times — see withMetrics note)
    val toked = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
    def tf(t: String): Column =
      size(filter(col("__toks"), tok => tok === lit(t))).cast("double")
    // blank text tokenizes to [""]: doc_len 0, matching tokenCount
    val docLen = when(size(col("__toks")) === 1 &&
      element_at(col("__toks"), 1) === "", 0.0)
      .otherwise(size(col("__toks")).cast("double"))
    val withTf = toked.select(
      (col(idCol) +: docLen.as("doc_len") +:
        terms.zipWithIndex.map { case (t, i) => tf(t).as(s"__tf$i") }): _*)
    val statAggs = count(lit(1)).cast("double").as("__n") +:
      avg(col("doc_len")).as("__avgdl") +:
      terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1.0).otherwise(0.0)).as(s"__df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    // fixed-order fold over terms: idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    val score = terms.indices.map { i =>
      val idf = log(
        (col("__n") - col(s"__df$i") + 0.5) / (col(s"__df$i") + 0.5) + 1.0)
      val denom = col(s"__tf$i") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("doc_len") / col("__avgdl"))
      idf * (col(s"__tf$i") * (k1 + 1.0)) / denom
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats)) // 1-row stats: scalar broadcast join
      .select(col(idCol), col("doc_len").cast("long").as("doc_len"),
        score.as("score"))
  }

  /** Corpus quality scoring with a self-trained bigram language model —
    * the distributed analog of CCNet's "perplexity under a reference LM"
    * filter, with the corpus itself as the reference: documents whose
    * token transitions are atypical for the corpus (boilerplate, garbled
    * text, wrong language) score low and can be gated on `avg_logp`.
    *
    * Model: add-one-smoothed bigram MLE over the corpus token stream,
    * p(w₂|w₁) = (c₂(w₁,w₂)+1)/(c₁(w₁)+V), restricted to documents with
    * ≥ 2 tokens (the scoring population). Per-doc score = mean ln p over
    * the doc's bigrams.
    *
    * Scale shape: two count aggregations (bigram, unigram — each one
    * shuffle with map-side combine), a 1-row vocab scalar (broadcast), and
    * instance→count joins keyed on the bigram/unigram — everything linear
    * in corpus size, counts never collected. The per-doc sum folds the
    * pos-sorted term list SEQUENTIALLY (not a float `sum()`), so the
    * result is independent of partitioning and row order — what makes the
    * op oracle-checkable at 4 decimals. */
  def bigramLmScores(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    // Tokenize ONCE: the unigram pass, the bigram pass, and the term join
    // all read the materialized token arrays (≈ corpus-sized, one
    // sequential write) — un-cut, the tokenizer ran 4× because the plan
    // references `toks` from four subtrees and no exchange lines up.
    val toks = df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .cutLineage()
    val stream = toks.select(explode(col("toks")).as("w"))
    val uni = stream.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    // |vocab| = the unigram table's row count — no second corpus pass
    val vocab = uni.agg(count(lit(1)).as("v"))
    val bg = toks.select(col(idCol), posexplode(expr(
        """zip_with(slice(toks, 1, size(toks) - 1),
          |         slice(toks, 2, size(toks) - 1),
          |         (a, b) -> struct(a AS w1, b AS w2))""".stripMargin))
        .as(Seq("pos", "p")))
      .select(col(idCol), col("pos"), col("p.w1").as("w1"),
        // unit-separator-joined key: unambiguous ("ab"+"c" vs "a"+"bc")
        concat_ws("\u001f", col("p.w1"), col("p.w2")).as("bigram"))
    val c2 = bg.groupBy(col("bigram")).agg(count(lit(1)).as("c2"))
    val terms = bg.join(c2, Seq("bigram"))
      .join(uni, col("w1") === col("w"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol), col("pos"),
        log((col("c2").cast("double") + 1.0) /
            (col("c1").cast("double") + col("v").cast("double"))).as("term"))
    terms.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(aggregate(
            transform(array_sort(collect_list(struct(col("pos"), col("term")))),
              e => e.getField("term")),
            lit(0.0), (acc, x) => acc + x) / count(lit(1)), 4).as("avg_logp"))
  }

  /** PMI-style collocation mining: the top-K adjacent word pairs ranked
    * by lift — how much more often the pair occurs than its words'
    * frequencies predict. The classic phrase-mining pass ("new york",
    * "machine learning") run before tokenizer training or n-gram
    * blocklist construction.
    *
    * Ranking key is the INTEGER `lift_e6 = c12·10⁶ div (c1·c2)`: true
    * PMI is `log(N · c12 / (c1·c2))` and N (total tokens) is constant
    * across the corpus, so dropping `log` and `N` preserves the exact
    * order while keeping the pipeline free of transcendentals (portable
    * across engines bit-for-bit) and inside Long range (`c12·10⁶` ≤
    * 9·10¹⁸ up to 9 trillion pair occurrences). Raw `c12/c1/c2` counts
    * ride along so consumers can compute calibrated PMI/NPMI.
    *
    * Shape at 100 TB: one shuffle for bigram counts, one for unigram
    * counts (both map-side combined, keyed by word — no skew beyond
    * natural Zipf, which AQE splits), then two joins of the BIGRAM-
    * VOCABULARY-sized table (≪ corpus) against the unigram table;
    * Catalyst broadcasts the unigram side when small, sort-merges
    * otherwise. The corpus itself is never joined. Final top-K is a
    * TakeOrderedAndProject — heap, no global sort. */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5L,
                   topK: Int = 20): DataFrame = {
    val toks = df.select(split(normalize(col(textCol)), " ").as("t"))
      .where(size(col("t")) > 0)
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pairs = toks.where(size(col("t")) > 1)
      .select(explode(expr(
        """zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),
          |         (a, b) -> struct(a AS w1, b AS w2))""".stripMargin)).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .where(col("c12") >= minCount)
    pairs
      .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), Seq("w1"))
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), Seq("w2"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        expr("c12 * 1000000L DIV (c1 * c2)").as("lift_e6"))
      .orderBy(col("lift_e6").desc, col("c12").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** TF-IDF keyword extraction: the `topK` most characteristic terms per
    * document, scored `tf · ln(N/df)` and rounded to 4 decimals — the
    * classic per-document summary signal (search snippets, topic
    * labeling, near-dup explanation).
    *
    * Shape at 100 TB: one (doc,term) count aggregate (map-side
    * combined), a VOCABULARY-sized doc-frequency aggregate derived from
    * it (never a second corpus pass), a 1-row corpus count broadcast,
    * one term-keyed join of the doc-term table against the vocabulary
    * (AQE broadcasts the vocab side when it fits), and a doc-partitioned
    * row_number window — no global sort, nothing driver-side.
    *
    * Determinism contract: the window ranks by the ROUNDED score (then
    * term) so engines that differ in `ln`'s last ulp still rank
    * identically — same convention as [[bigramLmScores]]. */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    topK: Int = 3): DataFrame = {
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(countDistinct(col(idCol)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score4").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score4",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("rank"), col("term"), col("score4"))
  }
}
