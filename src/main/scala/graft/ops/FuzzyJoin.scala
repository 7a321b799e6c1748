package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Lineage.LineageSyntax

/** Edit-distance similarity self-join without a cartesian product
  * (PassJoin's segment-filter candidate generation — Li, Deng, Feng,
  * VLDB 2011 — re-expressed as two explodes and one equi-join).
  *
  * Problem: all id pairs whose strings are within Levenshtein distance
  * `k`. The naive plan is a cross join with a `levenshtein()` residual —
  * a nested loop Catalyst cannot save, quadratic at any scale. The
  * pigeonhole escape: partition a string into `k+1` contiguous segments;
  * any `t` with `ed(s, t) ≤ k` must contain at least ONE of `s`'s
  * segments as an exact substring (k edits can touch at most k
  * segments), and that substring's position in `t` can drift at most
  * `k` characters from its position in `s` (fewer than `|pos_t − pos_s|`
  * edits cannot shift a block that far). So:
  *
  *  - index side: each string emits its `k+1` segments, keyed by
  *    (string-length, segment-index, segment-text);
  *  - probe side: each string emits, for every indexed length `l` within
  *    `±k` of its own, every substring that could equal segment `i` of a
  *    length-`l` string (positions `start_i(l) ± k`) — a constant
  *    `O((2k+1)²(k+1))` fan-out per row, independent of corpus size;
  *  - one equi-join on the 4-part key yields candidates, distinct'd and
  *    then verified with the codegen'd `levenshtein(..., threshold)`
  *    (Spark prunes the DP band at `k`, so verification is O(k·|s|) per
  *    pair, not O(|s|²)).
  *
  * Every stage is an explode, an equi-shuffle, or a projection: the
  * plan scales out on the join key like any hash join and AQE can split
  * a hot block. Worst case is data-driven, not plan-driven: a corpus
  * sharing a long common prefix (e.g. `Customer#0000…`) concentrates
  * candidates in the shared-segment blocks and degrades toward
  * verify-all-pairs WITHIN those blocks — the length and position
  * constraints are what keep that block bounded, and the verify step
  * still caps per-pair cost at O(k·|s|).
  *
  * Output: one row per unordered pair, `id1 < id2`, with both strings
  * and the exact distance — deterministic, engine-portable (the DuckDB
  * oracle is the brute-force quadratic form; q160 gates equality).
  *
  * Unicode note: Spark's `length`/`substring`/`levenshtein` count
  * UTF-16 code units, so a supplementary-plane character (outside the
  * BMP) counts as 2 toward length and edit distance. The operator is
  * internally consistent under that convention; engines that count
  * code points (DuckDB) agree only on BMP text.
  */
object FuzzyJoin {

  /** All unordered id pairs with `levenshtein(str1, str2) ≤ k`.
    *
    * @param df     input with an id column (orderable, unique) and a
    *               non-null string column
    * @param idCol  id column name
    * @param strCol string column name
    * @param k      maximum edit distance (≥ 1; 0 is plain dedup — use
    *               [[DedupOps]])
    * @return (id1, id2, str1, str2, dist) with id1 < id2, dist ≤ k
    */
  def selfEditDistanceJoin(df: DataFrame, idCol: String, strCol: String,
                           k: Int): DataFrame = {
    require(k >= 1, s"k must be ≥ 1 (got $k); exact duplicates are DedupOps")
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"))
      .where(col("__s").isNotNull)
    // ---- index side: the k+1 segments of each string ------------------
    // Segment plan for a string of length L: the first (k+1 − L mod (k+1))
    // segments have length L div (k+1), the rest one more — fully
    // determined by L, so the probe side can reconstruct it from the
    // length alone. seg_start/seg_len computed in one sequence explode.
    val nseg = k + 1
    val segs = base
      .withColumn("__len", length(col("__s")))
      .where(col("__len") >= nseg) // shorter strings: every segment ≥ 1 char
      .select(col("__id"), col("__s"), col("__len"),
        explode(expr(s"sequence(0, $k)")).as("__i"))
      .withColumn("__base", expr(s"__len div $nseg"))
      .withColumn("__rem", expr(s"__len % $nseg"))
      // segment i starts after (i) bases plus the extra chars handed to
      // the earlier long segments: long segments are the LAST `rem` ones
      .withColumn("__seglen",
        expr(s"__base + if(__i >= $nseg - __rem, 1, 0)"))
      .withColumn("__segstart",
        expr(s"__i * __base + greatest(0, __i - ($nseg - __rem))"))
      .select(col("__id").as("__rid"), col("__s").as("__rs"),
        col("__len").as("__rlen"), col("__i"),
        expr("substring(__s, __segstart + 1, __seglen)").as("__seg"))
    // ---- probe side: candidate substrings against each nearby length --
    val probes = base
      .withColumn("__len", length(col("__s")))
      .select(col("__id"), col("__s"), col("__len"),
        explode(expr(s"sequence(__len - $k, __len + $k)")).as("__l"))
      .where(col("__l") >= nseg)
      .select(col("__id"), col("__s"), col("__len"), col("__l"),
        explode(expr(s"sequence(0, $k)")).as("__i"))
      .withColumn("__base", expr(s"__l div $nseg"))
      .withColumn("__rem", expr(s"__l % $nseg"))
      .withColumn("__seglen",
        expr(s"__base + if(__i >= $nseg - __rem, 1, 0)"))
      .withColumn("__segstart",
        expr(s"__i * __base + greatest(0, __i - ($nseg - __rem))"))
      // position drift window ±k, clamped to the probe string's bounds
      // (empty windows filtered BEFORE the explode: Spark's sequence()
      // walks DESCENDING when start > stop instead of returning empty)
      .withColumn("__plo", expr(s"greatest(0, __segstart - $k)"))
      .withColumn("__phi", expr(s"least(__len - __seglen, __segstart + $k)"))
      .where(col("__phi") >= col("__plo"))
      .select(col("__id"), col("__s"), col("__l"), col("__i"),
        col("__seglen"),
        explode(expr("sequence(__plo, __phi)")).as("__p"))
      .select(col("__id").as("__pid"), col("__s").as("__ps"),
        col("__l").as("__rlen"), col("__i"),
        expr("substring(__s, __p + 1, __seglen)").as("__seg"))
    // ---- candidates: 4-part equi-join ---------------------------------
    // Pair order canonicalized AFTER the join: a short string (< k+1
    // chars) is never indexed, so its pairs arise in only one direction
    // and an `indexed-id < probe-id` filter would drop half of them.
    val candsLong = segs.join(probes, Seq("__rlen", "__i", "__seg"))
      .where(col("__rid") =!= col("__pid"))
      .select(
        least(col("__rid"), col("__pid")).as("id1"),
        greatest(col("__rid"), col("__pid")).as("id2"),
        when(col("__rid") < col("__pid"), col("__rs")).otherwise(col("__ps"))
          .as("str1"),
        when(col("__rid") < col("__pid"), col("__ps")).otherwise(col("__rs"))
          .as("str2"))
    // ---- short×short pool: both ends under k+1 chars ------------------
    // Neither end can be indexed (segments would be empty), so pigeonhole
    // never fires; but ed ≥ |len diff| bounds partners to length ≤ 2k+1.
    // Equi-join on the exploded partner length — blocks are length-of-
    // tiny-string groups (vocabulary-bounded), never a nested loop.
    val shorts = base.withColumn("__len", length(col("__s")))
      .where(col("__len") < nseg)
    val candsShort = shorts
      .select(col("__id").as("__aid"), col("__s").as("__as"),
        explode(expr(s"sequence(greatest(0, __len - $k), __len + $k)"))
          .as("__blen"))
      .join(shorts.select(col("__id").as("__bid"), col("__s").as("__bs"),
        length(col("__s")).as("__blen")), Seq("__blen"))
      .where(col("__aid") < col("__bid"))
      .select(col("__aid").as("id1"), col("__bid").as("id2"),
        col("__as").as("str1"), col("__bs").as("str2"))
    // ---- verify: distinct candidates through the k-banded DP ----------
    candsLong.unionByName(candsShort)
      .distinct()
      .withColumn("dist", levenshtein(col("str1"), col("str2"), k))
      // threshold form returns -1 beyond the band
      .where(col("dist") >= 0 && col("dist") <= k)
      .select(col("id1"), col("id2"), col("str1"), col("str2"), col("dist"))
  }

  /** EXACT Jaccard set-similarity self-join via prefix filtering
    * (AllPairs/PPJoin — Bayardo et al. WWW'07, Xiao et al. WWW'08 — as
    * explodes + equi-joins). Unlike the MinHash/LSH path
    * ([[DedupOps]]), which trades recall for cost, this is COMPLETE:
    * every unordered pair with `jaccard ≥ minJaccardE6/10⁶` is returned,
    * with the similarity as an exact integer micro-unit.
    *
    * Pigeonhole: order every set's tokens by global rarity (frequency
    * asc, token asc — rarest first). `jaccard(A,B) ≥ t` forces
    * `|A∩B| ≥ ⌈t·|A|⌉`, and a set sharing ≥ o tokens with A must share
    * at least one of A's first `|A| − o + 1` tokens. So only the PREFIX
    * tokens generate candidates — and because prefixes are drawn from
    * the rare end of the vocabulary, prefix blocks are small where a
    * raw token inverted index would put every stop-word pair in one
    * block. `o` is computed in integer arithmetic
    * (`⌈tE6·s / 10⁶⌉` via long ceil-division) — a float `ceil(0.6·s)`
    * rounds up at exact multiples (0.6·5 → 3.0000000000000004) and
    * silently SHORTENS the prefix below the completeness bound.
    *
    * Plan shape: token explode → vocabulary-frequency count → global
    * token-id assignment (distributed sort + `zipWithIndex`) → per-set
    * rank window (set-sized partitions) → prefix equi-self-join →
    * pair aggregation with the witness-count positional bound →
    * intersection count via two id-keyed joins over sorted-int arrays.
    * Every join is an equi-join; no stage is quadratic in the corpus.
    *
    * Everything downstream of the token-id join is NUMERIC: candidates
    * shuffle as fixed-width ints, and verification is a zero-allocation
    * two-pointer merge ([[graft.functions.SortedIntersectCount]]) over
    * sorted token-id arrays. The r7 string-array formulation
    * (`array_intersect` over `array<string>`) allocated gigabytes of
    * per-batch garbage on a saturated corpus — the GC-storm trigger
    * behind its bimodal in-sweep cost ([302 s, 11 s, 310 s] on
    * byte-identical reps; r7 verdict). Cost is now heap-state-invariant.
    *
    * @param sets         (id, token array) — tokens deduplicated here
    * @param minJaccardE6 inclusive threshold in micro-units (600000 = 0.6)
    * @return (id1, id2, inter, un, jac_e6), id1 < id2, exact integers
    */
  /** The shared front half of the set-similarity self-joins: explode to
    * distinct (id, token), then materialize the GLOBAL rarest-first
    * total order (frequency asc, token asc) as a dense LONG token id —
    * a distributed range-partitioned sort + zipWithIndex over the
    * VOCABULARY (distinct tokens, not the corpus), never a
    * single-partition window. Per-set rank order under `__tid` is
    * identical to rank order under (__tf, token), so every downstream
    * join, filter, and aggregation runs on fixed-width longs instead of
    * shingle strings.
    *
    * Returns `(id, __tid, __rn, __s)` — token id, the token's rank
    * within its set, the set size — lineage-cut (the frame feeds three
    * consumers; without the cut each re-tokenizes the corpus, measured
    * 4-5× the whole query's staged cost on the saturated sf0.1 corpus). */
  private def rankedByRarity(sets: DataFrame, idCol: String,
                             tokCol: String): DataFrame = {
    val spark = sets.sparkSession
    val id = col(idCol)
    val toks = sets
      .select(id, explode(array_distinct(col(tokCol))).as("token"))
      .where(col("token").isNotNull && col("token") =!= "")
    val freq = toks.groupBy(col("token")).agg(count(lit(1)).as("__tf"))
    val ord = freq.orderBy(col("__tf"), col("token"))
    val tids = spark.createDataFrame(
      ord.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(r.getString(0), i) },
      new org.apache.spark.sql.types.StructType()
        .add("token", org.apache.spark.sql.types.StringType)
        .add("__tid", org.apache.spark.sql.types.LongType))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(id).orderBy(col("__tid"))
    toks.join(tids, "token")
      .select(id, col("__tid"))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__s", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(id)))
      .cutLineage()
  }

  def jaccardSelfJoin(sets: DataFrame, idCol: String, tokCol: String,
                      minJaccardE6: Long): DataFrame = {
    require(minJaccardE6 >= 1 && minJaccardE6 <= 1000000,
      s"minJaccardE6 must be in [1, 1000000]: $minJaccardE6")
    val spark = sets.sparkSession
    graft.functions.SortedIntersectCount.register(spark)
    val id = col(idCol)
    val ranked = rankedByRarity(sets, idCol, tokCol)
    // o = ceil(tE6 * s / 1e6) in longs (the Column `/` is double
    // division — `div` keeps it integral); probe prefix = first
    // (s - o + 1). The INDEX prefix is shorter: processing pairs in
    // (size, id) order, the smaller side's partner is at least as large,
    // so overlap ≥ α ≥ ⌈2·t·s/(1+t)⌉ in the smaller side's OWN size —
    // its first shared token sits within the first
    // s − ⌈2·tE6·s/(10⁶+tE6)⌉ + 1 tokens (Bayardo WWW'07 / Xiao WWW'08
    // index-prefix asymmetry; at t=0.5 that is s/3 vs s/2 — a ~⅓ cut in
    // join fan-out on saturated vocabularies, and completeness holds by
    // the bound above)
    val prefix = ranked.where(col("__rn") <= expr(
      s"__s - ((__s * ${minJaccardE6}L + 999999L) div 1000000L) + 1L"))
    val indexPrefix = ranked.where(col("__rn") <= expr(
      s"__s - ((__s * ${2L * minJaccardE6}L + ${1000000L + minJaccardE6 - 1}L)" +
        s" div ${1000000L + minJaccardE6}L) + 1L"))
    // length filter (lossless): jaccard >= t forces
    // inter <= min(s1,s2), union >= max(s1,s2) => t <= min/max, so any
    // pair whose sizes differ by more than the threshold factor is
    // provably below t and never reaches verification
    //
    // positional filter (PPJoin, lossless, applied in its WITNESS-COUNT
    // form): the pair aggregation counts every shared prefix token
    // (witness) and keeps the LAST witness's positions. Because the
    // per-set rank order is the restriction of one GLOBAL total order,
    // any shared token that is NOT a witness must rank globally AFTER
    // the last witness (if it ranked before, both its ranks would be
    // inside the prefixes and it would be a witness itself), so the true
    // overlap is bounded by c + min(s1−maxrn1, s2−maxrn2). jaccard ≥ t
    // forces overlap ≥ α = ⌈tE6·(s1+s2)/(10⁶+tE6)⌉ (from
    // i ≥ t·(s1+s2−i)); pairs whose bound misses α are provably below
    // threshold. This bound DOMINATES the r7 first-witness form: the
    // c−1 later witnesses occupy ranks between the first and the last,
    // so 1 + min(s1−minrn1, s2−minrn2) ≥ c + min(s1−maxrn1, s2−maxrn2)
    // — and it needs no per-witness pre-filter, whose row cut the count
    // bound more than repays at the aggregation.
    // pair orientation is (size, id) lexicographic — side 1 (smaller)
    // contributes only its short INDEX prefix, side 2 its probe prefix;
    // ids are re-normalized to id1 < id2 at the end.
    val alphaSql =
      s"((${minJaccardE6}L * (__s1 + __s2) + ${1000000L + minJaccardE6 - 1}L)" +
        s" div ${1000000L + minJaccardE6}L)"
    val candAll = indexPrefix.select(col("__tid"), id.as("id1"),
        col("__s").as("__s1"), col("__rn").as("__rn1"))
      .join(prefix.select(col("__tid"), id.as("id2"),
        col("__s").as("__s2"), col("__rn").as("__rn2")), "__tid")
      .where((col("__s1") < col("__s2")) ||
        (col("__s1") === col("__s2") && col("id1") < col("id2")))
      .where(col("__s2") * minJaccardE6 <= col("__s1") * 1000000L)
    // one pair-keyed shuffle, partial-aggregable (map-side combine folds
    // each pair's witnesses before the exchange; no Window, no second
    // pass); every column is a fixed-width long
    val cand = candAll
      .groupBy(col("id1"), col("id2"), col("__s1"), col("__s2"))
      .agg(count(lit(1)).as("__c"),
        max(col("__rn1")).as("__m1"), max(col("__rn2")).as("__m2"))
      .where(
        col("__c") + least(col("__s1") - col("__m1"),
          col("__s2") - col("__m2")) >= expr(alphaSql))
      .select(col("id1"), col("id2"), col("__s1"), col("__s2"))
    // verification: two id-keyed joins fetch each side's SORTED token-id
    // array once; the exact intersection size is a zero-allocation
    // two-pointer merge over primitive long buffers (native codegen'd
    // [[graft.functions.SortedIntersectCount]]) — candidate-count ×
    // set-size compute with no per-row garbage, where the r7
    // array_intersect-over-strings build hashed ~100 shingle strings
    // per pair and let heap state set the query's cost
    // arrays re-fold from the CUT ranked frame, not from a re-explode;
    // sort_array gives ascending __tid — the merge precondition
    val arrs = ranked.groupBy(id)
      .agg(sort_array(collect_list(col("__tid"))).as("__arr"))
    cand
      .join(arrs.select(id.as("id1"), col("__arr").as("__a1")), "id1")
      .join(arrs.select(id.as("id2"), col("__arr").as("__a2")), "id2")
      .withColumn("inter",
        graft.functions.SortedIntersectCount(col("__a1"), col("__a2")))
      .withColumn("un", col("__s1") + col("__s2") - col("inter"))
      .withColumn("jac_e6", expr("(inter * 1000000) div un"))
      .where(col("jac_e6") >= minJaccardE6)
      // pairs were oriented by (size, id) — normalize to id1 < id2
      .select(least(col("id1"), col("id2")).as("id1"),
        greatest(col("id1"), col("id2")).as("id2"),
        col("inter"), col("un"), col("jac_e6"))
  }

  /** EXACT Jaccard CONTAINMENT self-join: every ORDERED pair (a, b),
    * a ≠ b, with `|A∩B| / |A| ≥ minContainE6/10⁶` — the asymmetric
    * near-dup relation [[jaccardSelfJoin]] cannot express. Containment
    * is what catches excerpts, quotes, and subset documents: a 50-token
    * quote inside a 5,000-token article has Jaccard ≈ 0.01 but
    * containment 1.0 — a training-data dedup that only checks Jaccard
    * ships the duplicate.
    *
    * Same numeric machinery as [[jaccardSelfJoin]] ([[rankedByRarity]]
    * token ids, witness-count positional bound, zero-allocation sorted
    * intersection), with containment's own bounds:
    *
    *  - probe prefix (the contained side A): `o ≥ ⌈t·|A|⌉` shared
    *    tokens forces one inside A's first `|A| − ⌈t·|A|⌉ + 1`
    *    (pigeonhole, integer ceil);
    *  - index side B contributes ALL its tokens — containment places NO
    *    lower bound tied to |B|'s own size (a b-side prefix shortened by
    *    `⌈t·min|A|⌉ − 1` is valid but worthless when the smallest probe
    *    set has a handful of tokens, and it would cost a driver-side
    *    min; completeness first);
    *  - size filter (lossless): `inter ≤ |B|` forces `t·|A| ≤ |B|`;
    *  - witness-count bound (lossless, same global-order argument as
    *    the Jaccard form — any shared non-witness token ranks globally
    *    after the last witness): `c + min(|A|−maxrnA, |B|−maxrnB) ≥
    *    α = ⌈tE6·|A|/10⁶⌉`.
    *
    * @param sets          (id, token array) — tokens deduplicated here
    * @param minContainE6  inclusive threshold in micro-units
    * @return (id_a, id_b, inter, s_a, cont_e6): A = id_a's set is the
    *         contained side; exact integers, ordered pairs
    */
  def containmentSelfJoin(sets: DataFrame, idCol: String, tokCol: String,
                          minContainE6: Long): DataFrame = {
    require(minContainE6 >= 1 && minContainE6 <= 1000000,
      s"minContainE6 must be in [1, 1000000]: $minContainE6")
    graft.functions.SortedIntersectCount.register(sets.sparkSession)
    val id = col(idCol)
    val ranked = rankedByRarity(sets, idCol, tokCol)
    val probe = ranked.where(col("__rn") <= expr(
      s"__s - ((__s * ${minContainE6}L + 999999L) div 1000000L) + 1L"))
    val alphaSql = s"((__sa * ${minContainE6}L + 999999L) div 1000000L)"
    val cand = probe.select(col("__tid"), id.as("id_a"),
        col("__s").as("__sa"), col("__rn").as("__rna"))
      .join(ranked.select(col("__tid"), id.as("id_b"),
        col("__s").as("__sb"), col("__rn").as("__rnb")), "__tid")
      .where(col("id_a") =!= col("id_b"))
      .where(col("__sa") * minContainE6 <= col("__sb") * 1000000L)
      .groupBy(col("id_a"), col("id_b"), col("__sa"), col("__sb"))
      .agg(count(lit(1)).as("__c"),
        max(col("__rna")).as("__ma"), max(col("__rnb")).as("__mb"))
      .where(
        col("__c") + least(col("__sa") - col("__ma"),
          col("__sb") - col("__mb")) >= expr(alphaSql))
      .select(col("id_a"), col("id_b"), col("__sa"))
    val arrs = ranked.groupBy(id)
      .agg(sort_array(collect_list(col("__tid"))).as("__arr"))
    cand
      .join(arrs.select(id.as("id_a"), col("__arr").as("__aa")), "id_a")
      .join(arrs.select(id.as("id_b"), col("__arr").as("__ab")), "id_b")
      .withColumn("inter",
        graft.functions.SortedIntersectCount(col("__aa"), col("__ab")))
      .withColumn("cont_e6", expr("(inter * 1000000) div __sa"))
      .where(col("cont_e6") >= minContainE6)
      .select(col("id_a"), col("id_b"), col("inter"),
        col("__sa").as("s_a"), col("cont_e6"))
  }
}
