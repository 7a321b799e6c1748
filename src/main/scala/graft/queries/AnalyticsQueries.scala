package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Lineage.LineageSyntax
import graft.sources.Tables

/** Sequence / interval / distribution analytics over the `events` stream
  * table and the TPC-H-ish dimensions — the event-analytics breadth a
  * warehouse user expects beyond plain aggregation (reference scope:
  * SURVEY §2.5/§2.6; these are absent-but-free additions in the same
  * spirit as q83/q84).
  *
  * Every query here keeps the 100 TB shape rules the rest of the repo
  * follows: windows are always partitioned by a high-cardinality key
  * (never a global ORDER BY over the full relation), distribution
  * summaries reduce to driver-scale scalars/arrays before any join-back
  * (broadcast), and doubles are stabilized (cents / round(4)) so the
  * DuckDB oracle hash-matches bit-for-bit.
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Event-type transition matrix (Markov bigrams): lead() within each
    * user's time-ordered stream, then a global (from,to) count. One
    * user-keyed exchange for the window + one partial-agg'd shuffle of
    * |types|² rows — the canonical path-analysis plan. Ordering matches
    * q32's proven (ts_us, event_id) total order. */
  def q94Transitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    t(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type".as("from_type"),
        unix_micros($"ts").as("ts_us"))
      .withColumn("to_type", lead($"from_type", 1).over(w))
      .where($"to_type".isNotNull)
      .groupBy($"from_type", $"to_type")
      .agg(count(lit(1)).as("n_transitions"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"from_type", $"to_type")
  }

  /** Longest consecutive-day activity streak per user — gaps-and-islands
    * via (day_number − row_number): consecutive days share an island id.
    * Both windows and both aggregations are keyed by user_id, so the
    * whole query is ONE exchange of the distinct (user, day) pairs. */
  def q95Streaks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"d")
    val days = t(s, dir, "events")
      .select($"user_id", to_date($"ts").as("d")).distinct()
      .withColumn("day_num",
        datediff($"d", lit("1995-01-01").cast("date")).cast("long"))
      .withColumn("island", $"day_num" - row_number().over(w))
    days.groupBy($"user_id", $"island").agg(count(lit(1)).as("len"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_streaks"), max($"len").as("max_streak"),
        sum($"len").as("n_active_days"))
      .orderBy($"user_id")
  }

  /** Merged-interval coverage per user: each event spans
    * [ts, ts + f(value)]; overlapping spans are coalesced with the
    * running-max-end island technique (start > max(end) over preceding
    * rows ⇒ new island), then summed. The only exchange is the
    * user-keyed window sort; island reduction is a partial-agg'd
    * groupBy on (user, island). The classic alternative — a self
    * range-join — is O(n²) per user; this is O(n log n) and
    * partition-parallel. */
  def q96IntervalCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val spans = t(s, dir, "events")
      .select($"user_id", $"event_id", unix_micros($"ts").as("start_us"),
        (unix_micros($"ts") +
          (floor(abs($"value") * 60000000.0 + 0.5) + 1.0).cast("long"))
          .as("end_us"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"start_us", $"end_us", $"event_id")
    val prevMax = max($"end_us")
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val islands = spans
      .withColumn("new_island",
        when(prevMax.isNull.or($"start_us" > prevMax), 1L).otherwise(0L))
      .withColumn("island",
        sum($"new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"island")
      .agg(count(lit(1)).as("n_spans"), min($"start_us").as("s0"),
        max($"end_us").as("e1"))
    islands.groupBy($"user_id")
      .agg(sum($"n_spans").as("n_intervals"), count(lit(1)).as("n_islands"),
        sum($"e1" - $"s0").as("covered_us"))
      .orderBy($"user_id")
  }

  /** Schema-evolution union: two generations of the orders extract with
    * different column sets, combined with unionByName(allowMissing) —
    * missing columns null-fill exactly like DuckDB's UNION ALL BY NAME.
    * This is the multi-source ingestion shape (old + new feed versions)
    * and is a pure scan-side concat: no shuffle at all until the
    * consumer asks for one. */
  def q97SchemaUnion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = t(s, dir, "orders")
    val v1 = o.where($"o_orderstatus" === "F")
      .select($"o_orderkey", $"o_custkey",
        floor($"o_totalprice" * 100.0 + 0.5).cast("long").as("total_cents"),
        lit("v1").as("src"))
    val v2 = o.where($"o_orderstatus" === "O")
      .select($"o_orderkey", $"o_orderpriority", lit("v2").as("src"))
    v1.unionByName(v2, allowMissingColumns = true)
      .orderBy($"o_orderkey", $"src")
  }

  /** Deterministic mode per group (most frequent brand per part type):
    * count first (partial-agg'd — the base table never reaches a
    * window), then row_number ONLY over the aggregated |types|×|brands|
    * relation with an explicit (count desc, brand) tie-break. The window
    * input is dimension-bounded, not data-bounded — the 100 TB-safe way
    * to compute grouped modes. */
  def q98ModePerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = t(s, dir, "part")
      .groupBy($"p_type", $"p_brand").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"p_type").orderBy($"n".desc, $"p_brand")
    counts.withColumn("rn", row_number().over(w)).where($"rn" === 1)
      .select($"p_type", $"p_brand".as("mode_brand"), $"n".as("n_parts"))
      .orderBy($"p_type")
  }

  /** Equi-depth (decile) histogram WITHOUT a global sort: the 9 exact
    * interior percentile boundaries come from
    * [[graft.ops.ExactQuantiles]]'s distributed selection (range-
    * partitioned value summary — never Catalyst `Percentile`'s
    * single-reducer count-map merge, which measured 4–6 s alone at
    * sf0.1), then a fully parallel scan buckets each row against the 9
    * literal boundaries and shuffles only 10 partial-agg rows. The naive
    * ntile(10) OVER (ORDER BY …) formulation funnels the entire table
    * through ONE partition. Interpolation is bit-identical to DuckDB
    * quantile_cont (same h=(n−1)p, same lerp — proven by q36 +
    * ExactQuantilesSpec). */
  def q99EquidepthHist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cents = t(s, dir, "lineitem")
      .select(floor($"l_extendedprice" * 100.0 + 0.5).cast("long").as("c"))
    val bs = graft.ops.ExactQuantiles.quantiles(cents, "c",
      (1 to 9).map(_ / 10.0), partitions = 32)
    val below = bs.map(b => when($"c".cast("double") > lit(b), 1).otherwise(0))
      .reduce(_ + _)
    cents.withColumn("bucket", (lit(1) + below).cast("long"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"), min($"c").as("min_cents"),
        max($"c").as("max_cents"))
      .orderBy($"bucket")
  }

  /** Date-spine gap fill + carry-forward: per-user daily totals joined
    * against a generated per-user date spine (sequence/explode — spine
    * rows are created distributed, sized by each user's own span), then
    * last-non-null carry-forward in a user-keyed window. The spine join
    * is keyed (user, day) so it co-partitions with the daily aggregate.
    * Restricted to user_id < 50 to bound oracle output, not for engine
    * reasons. */
  def q100GapFill(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = t(s, dir, "events").where($"user_id" < 50)
      .groupBy($"user_id", to_date($"ts").as("d"))
      // per-row cents quantization BEFORE the sum: float-sum order
      // differs across engines/partitionings and flips round() edges
      .agg(sum(floor($"value" * 100.0 + 0.5)).cast("long").as("day_cents"))
    val spine = daily.groupBy($"user_id")
      .agg(min($"d").as("d0"), max($"d").as("d1"))
      .select($"user_id",
        explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
    val w = Window.partitionBy($"user_id").orderBy($"d")
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(daily, Seq("user_id", "d"), "left")
      .withColumn("carried", last($"day_cents", ignoreNulls = true).over(w))
      .withColumn("is_active", $"day_cents".isNotNull)
      .orderBy($"user_id", $"d")
      // ISO string day: parquet date32 vs oracle timestamp dtypes would
      // otherwise diverge at the compare layer even with equal values
      .withColumn("d", date_format($"d", "yyyy-MM-dd"))
  }

  /** Deterministic per-key reservoir sample (k=3 events per user) —
    * uniform-without-replacement via the md5 order trick: ranking by a
    * seeded content hash is a random permutation, and taking the k
    * smallest is a reservoir sample that is REPRODUCIBLE across engines,
    * runs, and partitionings (no rand() in the plan). Ranking uses
    * [[graft.ops.RankOps.topKPerKey]]'s bounded heap: the shuffle
    * carries ≤k rows per user, never the user's full history — the
    * sampling plan that survives 100 TB. */
  def q101ReservoirSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashed = t(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type",
        md5(concat_ws(":", $"user_id", $"event_id")).as("h"))
    graft.ops.RankOps.topKPerKey(hashed, Seq("user_id"),
        Seq($"h", $"event_id"), k = 3, largest = false,
        payload = Seq("event_type"))
      .select($"user_id", $"rank", $"event_id", $"event_type")
      .orderBy($"user_id", $"rank")
  }

  /** Distributed OLS regression (price on quantity per return flag) from
    * EXACT integer moments: one partial-agg'd pass accumulates n, Σx,
    * Σy, Σxy, Σx² as BIGINTs (order-independent — the float-sum
    * nondeterminism that plagues naive regr_slope is gone), then slope/
    * intercept come from one fixed double formula per group. This is the
    * map-reduce regression shape: no window, no second pass, 5 longs per
    * group shuffled. */
  def q102Regression(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val moments = t(s, dir, "lineitem")
      .select($"l_returnflag",
        floor($"l_quantity" + 0.5).cast("long").as("x"),
        floor($"l_extendedprice" * 100.0 + 0.5).cast("long").as("y"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
    // identical double-arithmetic order on both engines: exact BIGINT
    // moments → one deterministic expression
    val nd = $"n".cast("double")
    val slope = (nd * $"sxy".cast("double") -
      $"sx".cast("double") * $"sy".cast("double")) /
      (nd * $"sxx".cast("double") -
        $"sx".cast("double") * $"sx".cast("double"))
    val intercept = ($"sy".cast("double") - slope * $"sx".cast("double")) / nd
    moments.select($"l_returnflag", $"n",
        floor(slope * 1000000.0 + 0.5).cast("long").as("slope_e6"),
        floor(intercept * 1000000.0 + 0.5).cast("long").as("intercept_e6"))
      .orderBy($"l_returnflag")
  }

  /** Language-distribution entropy per source: counts → per-category
    * −p·ln(p) terms quantized to e6 BEFORE the final sum (integer sum =
    * order-independent; a float term sum would be partitioning-
    * dependent). The window computing each source's total runs over the
    * |sources|×|langs| aggregate, never the base table. */
  def q103Entropy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = t(s, dir, "documents")
      .groupBy($"source", $"lang").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"source")
    counts
      .withColumn("total", sum($"cnt").over(w))
      .withColumn("p", $"cnt".cast("double") / $"total".cast("double"))
      .withColumn("term_e6",
        floor(-$"p" * log($"p") * 1000000.0 + 0.5).cast("long"))
      .groupBy($"source")
      .agg(max($"total").as("n_docs"), count(lit(1)).as("n_langs"),
        sum($"term_e6").as("entropy_e6"))
      .orderBy($"source")
  }

  /** k-anonymity audit over quasi-identifiers (mktsegment, nationkey,
    * binned account balance): emit every equivalence class smaller than
    * k=5 — the rows a privacy reviewer must generalize or suppress
    * before release. The binned numeric QI makes the gate non-vacuous at
    * test scale (578 small classes at sf0.01; the coarse 2-QI version
    * returned zero rows everywhere, never exercising the HAVING). One
    * partial-agg'd groupBy; the audit output is bounded by the class
    * count, not the data. The bucket is floor(x/2000) on the shared
    * parquet doubles — identical IEEE ops both engines, no boundary
    * drift. */
  def q104KAnonymity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "customer")
      .groupBy($"c_mktsegment", $"c_nationkey",
        floor($"c_acctbal" / 2000.0).cast("long").as("bal_bucket"))
      .agg(count(lit(1)).as("class_size"))
      .where($"class_size" < 5)
      .orderBy($"c_mktsegment", $"c_nationkey", $"bal_bucket")
  }

  /** Debounce: drop consecutive same-type repeats per user (keep the
    * first event of each run) — the standard stream-cleaning step before
    * transition/funnel analysis. One user-keyed window exchange, output
    * summarized per user so the result scales with users, not events. */
  def q105Debounce(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    t(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type",
        unix_micros($"ts").as("ts_us"))
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .where($"prev_type".isNull || $"prev_type" =!= $"event_type")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_kept"), min($"event_id").as("first_event"),
        max($"event_id").as("last_event"))
      .orderBy($"user_id")
  }

  /** Bloom-index point lookups: the documents table is laid out hash-
    * partitioned (no min/max layout can serve doc_id), a per-file bloom
    * index is built in one pass, and each probe reads ONLY the admitted
    * files — 1–2 of 8 here, 1–2 of 10k at warehouse scale. The absent
    * probe (doc_id 999999) exercises the reject path: zero or fp-only
    * file reads, zero rows. Exact predicate kills false positives, so
    * the result equals the plain WHERE — which is the oracle. */
  def q106BloomLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dataDir = java.nio.file.Files.createTempDirectory("q106data").toString
    val idxDir = java.nio.file.Files.createTempDirectory("q106idx").toString
    t(s, dir, "documents").repartition(8, $"doc_id")
      .write.mode("overwrite").parquet(dataDir)
    graft.sinks.FileBloomIndex.build(s, dataDir, "doc_id", idxDir,
      expectedPerFile = 10000L)
    val probes = Seq(1L, 7L, 23L, 42L, 999999L)
    probes.map(id =>
        graft.sinks.FileBloomIndex.lookup(s, dataDir, idxDir, "doc_id", id)
          .select($"doc_id", $"lang", $"source", $"n_chars"))
      .reduce(_ unionByName _)
      .orderBy($"doc_id")
  }

  /** Winsorized robust statistics: global p01/p99 bounds from
    * [[graft.ops.ExactQuantiles]] (distributed selection — no
    * single-reducer percentile), quantized to integer cents so the
    * clamped sum stays an exact BIGINT. Clamping outliers to the
    * boundary is the standard robust-mean step before per-group
    * comparisons; the whole query is the quantile pass + ONE partial-
    * agg'd groupBy. */
  def q107Winsorize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select($"l_returnflag",
        floor($"l_extendedprice" * 100.0 + 0.5).cast("long").as("c"))
    val bounds = graft.ops.ExactQuantiles.quantiles(li, "c",
      Seq(0.01, 0.99), partitions = 32)
    val loC = math.ceil(bounds(0)).toLong
    val hiC = math.floor(bounds(1)).toLong
    li.withColumn("w", least(greatest($"c", lit(loC)), lit(hiC)))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when($"c" < loC, 1L).otherwise(0L)).as("n_clamped_low"),
        sum(when($"c" > hiC, 1L).otherwise(0L)).as("n_clamped_high"),
        sum($"w").as("sum_w_cents"),
        min($"w").as("min_w_cents"), max($"w").as("max_w_cents"))
      .orderBy($"l_returnflag")
  }

  /** Median absolute deviation per group — the robust dispersion
    * statistic, composed from TWO grouped exact-quantile passes
    * ([[graft.ops.ExactQuantiles.quantilesByGroupHistogram]]): per-group
    * medians, then medians of |deviation|. Doubling keeps everything
    * integral (a median of integers is k or k+½, so 2·median and
    * |2c − 2·median| are exact longs) — no float sums anywhere. Driver
    * traffic is O(groups·buckets) scalars; each selection round is one
    * map-side-combined aggregate pass, never a summary shuffle. */
  def q109Mad(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem")
      .select($"l_returnflag",
        floor($"l_extendedprice" * 100.0 + 0.5).cast("long").as("c"))
    // one extents pass feeds the count report, the median selection's
    // hull, AND (analytically: |2c − m2| ∈ [0, max |2·extreme − m2|])
    // the deviation selection's hull — 1 + 2·rounds lean passes total
    val ext = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), min($"c").as("mn"), max($"c").as("mx"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val med2 = graft.ops.ExactQuantiles
      .quantilesByGroupHistogramHull(li, "l_returnflag", "c", Seq(0.5), ext)
      .map { case (g, qs) => g -> math.round(qs(0) * 2) }
    val medDf = med2.toSeq.toDF("l_returnflag", "m2")
    val dev = li.join(broadcast(medDf), "l_returnflag")
      .withColumn("d2", abs(lit(2L) * $"c" - $"m2"))
    val devExt = ext.map { case (g, (n, mn, mx)) =>
      val m2 = med2(g)
      g -> (n, 0L, math.max(math.abs(2 * mn - m2), math.abs(2 * mx - m2)))
    }
    val mad2 = graft.ops.ExactQuantiles
      .quantilesByGroupHistogramHull(dev, "l_returnflag", "d2", Seq(0.5),
        devExt)
    val counts = ext.map { case (g, (n, _, _)) => g -> n }
    med2.toSeq.map { case (g, m2) =>
      (g, counts(g), math.floor(m2.toDouble / 2 * 10 + 0.5).toLong,
        math.floor(mad2(g)(0) * 5 + 0.5).toLong)
    }.toDF("l_returnflag", "n", "median_e1", "mad_e1")
      .orderBy($"l_returnflag")
  }

  /** Vocabulary coverage: build the corpus's top-100 token vocabulary
    * (count desc + lexicographic tie-break = total order, deterministic
    * cut) and report each source's out-of-vocabulary token rate — the
    * standard tokenizer-fit / domain-shift signal before training. The
    * vocab is aggregated first (token-cardinality relation, partial-
    * agg'd) and broadcast back; the rate is integer DIV e6 so no float
    * division order can flip a digit. */
  def q110VocabCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = t(s, dir, "documents")
      .select($"source",
        explode(graft.ops.TextOps.tokens($"text")).as("tok"))
      .where($"tok" =!= "")
    val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"tok").limit(100)
      .select($"tok", lit(1).as("__v"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"__v".isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_e6", expr("n_oov * 1000000 DIV n_tokens"))
      .orderBy($"source")
  }

  /** Inter-event-time distribution per event type: per-user lag deltas
    * (one user-keyed window exchange) bucketed into power-of-4 μs bands
    * — log-scale latency histograms without floats (band = width of the
    * gap's bit length ÷ 2, pure integer math both engines). The classic
    * telemetry shape: |types|×|bands| output rows from any event
    * volume. */
  def q111InterEventTimes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    t(s, dir, "events")
      .select($"user_id", $"event_id", $"event_type",
        unix_micros($"ts").as("ts_us"))
      .withColumn("gap_us", $"ts_us" - lag($"ts_us", 1).over(w))
      .where($"gap_us".isNotNull)
      // band k holds gaps in [4^k, 4^(k+1)): 4^k has bit length 2k+1, so
      // k = (bitlen-1) div 2 — pure integer math (a float log4 would
      // mis-band exact powers on rounding), gap 0 lands in band 0
      .withColumn("band", expr("(length(bin(gap_us)) - 1) DIV 2"))
      .groupBy($"event_type", $"band")
      .agg(count(lit(1)).as("n"), min($"gap_us").as("min_gap_us"),
        max($"gap_us").as("max_gap_us"))
      .orderBy($"event_type", $"band")
  }

  /** Event-type co-occurrence (basket analysis): which type pairs the
    * same user performs. Distinct (user, type) first — the base stream
    * collapses to ≤|users|·|types| rows — then pairs come from a
    * per-user sorted-array self-product bounded by |types|², never a
    * row-level self-join. Support = users doing both. */
  def q112Cooccurrence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "events").select($"user_id", $"event_type").distinct()
      .groupBy($"user_id")
      .agg(sort_array(collect_set($"event_type")).as("types"))
      .select($"user_id", explode($"types").as("a"),
        col("types"))
      .select($"user_id", $"a", explode($"types").as("b"))
      .where($"a" < $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("n_users"))
      .orderBy($"a", $"b")
  }

  /** Contribution analysis: each nation's share of total revenue, as
    * integer-DIV e6 of exact cents sums (float division of partial sums
    * is partitioning-dependent; integer cents are not). The share window
    * runs over the |nations|-row aggregate, never the fact table. */
  def q114PercentOfTotal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rev = t(s, dir, "lineitem")
      .join(t(s, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(t(s, dir, "nation")), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum(floor($"l_extendedprice" * 100.0 + 0.5)).cast("long")
        .as("rev_cents"))
    val w = Window.orderBy($"rev_cents".desc, $"n_name")
    rev
      .withColumn("total_cents", sum($"rev_cents").over(
        Window.partitionBy()))
      .withColumn("share_e6", expr("rev_cents * 1000000 DIV total_cents"))
      .withColumn("rnk", row_number().over(w))
      .select($"n_name", $"rev_cents", $"share_e6", $"rnk")
      .orderBy($"rnk")
  }

  /** Year-over-year revenue: lag window over the |years|-row aggregate;
    * growth as integer-DIV e4 of exact cents (NULL for the first year,
    * exactly as the SQL lag does). The canonical warehouse trend query
    * with the window on the summary, not the 100 TB facts. */
  def q115YearOverYear(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val yearly = t(s, dir, "orders")
      .groupBy(year($"o_orderdate").cast("long").as("y"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor($"o_totalprice" * 100.0 + 0.5)).cast("long")
          .as("rev_cents"))
    val w = Window.orderBy($"y")
    yearly
      .withColumn("prev_cents", lag($"rev_cents", 1).over(w))
      .withColumn("delta_cents", $"rev_cents" - $"prev_cents")
      .withColumn("growth_e4",
        expr("(rev_cents - prev_cents) * 10000 DIV prev_cents"))
      .select($"y", $"n_orders", $"rev_cents", $"delta_cents", $"growth_e4")
      .orderBy($"y")
  }

  /** Zone-map range scan: orders laid out range-clustered on date (the
    * natural shape of time-ordered ingest), per-file min/max lifted into
    * a [[graft.sinks.FileZoneMap]], and a one-month range query reads
    * ONLY the files whose interval overlaps — 1–2 of 8 here, O(matching)
    * of 10k at warehouse scale, with no parquet footer round-trips. The
    * exact predicate on top makes the result equal the plain BETWEEN,
    * which is the oracle. */
  def q116ZoneRange(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dataDir = java.nio.file.Files.createTempDirectory("q116data").toString
    val idxDir = java.nio.file.Files.createTempDirectory("q116idx").toString
    t(s, dir, "orders")
      .withColumn("o_orderdate", $"o_orderdate".cast("date"))
      .repartitionByRange(8, $"o_orderdate")
      .write.mode("overwrite").parquet(dataDir)
    graft.sinks.FileZoneMap.build(s, dataDir, Seq("o_orderdate"), idxDir)
    graft.sinks.FileZoneMap.rangeLookup(s, dataDir, idxDir, "o_orderdate",
        java.sql.Date.valueOf("1996-03-01"), java.sql.Date.valueOf("1996-03-31"))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"),
        sum(floor($"o_totalprice" * 100.0 + 0.5)).cast("long")
          .as("total_cents"))
      .orderBy($"o_orderstatus")
  }

  /** Materialized-view hit, live in the driver gate: the lineitem
    * projection is written as a registered source table, its per-flag
    * count/sum is maintained across three batches in an
    * [[graft.ops.IncrementalAgg]] store, and the query is the ORDINARY
    * `groupBy().agg()` over the raw path — the injected
    * [[graft.plans.MaterializedAggRewrite]] answers it from the store
    * (scan of per-key partials, never the fact rows). The oracle is the
    * plain GROUP BY, which is exactly the rewrite's correctness
    * contract. Quantities are integral doubles, so the refold sum is
    * float-exact. */
  def q117MvHit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("q117src").toString
    t(s, dir, "lineitem")
      .select($"l_returnflag", $"l_quantity", $"l_orderkey")
      .write.mode("overwrite").parquet(srcDir)
    val spec = graft.ops.IncrementalAgg.Spec(Seq("l_returnflag"),
      Seq("l_quantity"))
    val store = new graft.sinks.AppendOnlyStore(s,
      java.nio.file.Files.createTempDirectory("q117store").toString,
      prefixCol = "__agg_key", prefixChars = 1)
    val src = s.read.parquet(srcDir)
    (0L to 2L).foreach(b => graft.ops.IncrementalAgg.appendBatch(store,
      src.filter($"l_orderkey" % 3 === b), spec, b))
    graft.plans.MaterializedAggRewrite.register(srcDir,
      graft.plans.MaterializedAggRewrite.MvDef(spec.keyCols, spec.sumCols,
        () => graft.ops.IncrementalAgg.current(store, spec)))
    // left registered: the rewrite fires when the driver materializes
    // this plan (unique temp path — no effect on any other query).
    // avg answers from the store's sum/cnt partials (round-3 extension);
    // quantities are integral doubles so sum, count and the division are
    // all float-exact — the e4 quantization cannot straddle a boundary
    s.read.parquet(srcDir).groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_rows"), sum($"l_quantity").as("qty_d"),
        avg($"l_quantity").as("avg_d"))
      .select($"l_returnflag", $"n_rows",
        floor($"qty_d" + 0.5).cast("long").as("sum_qty"),
        floor($"avg_d" * 10000.0 + 0.5).cast("long").as("avg_qty_e4"))
      .orderBy($"l_returnflag")
  }

  /** Aggregate-over-join MV hit, live in the driver gate (q123): the
    * lineitem projection is a registered source with a per-flag
    * IncrementalAgg store, and the query joins the raw path with an
    * inline status DIMENSION, grouping by the dim attribute — the shape
    * [[graft.plans.MaterializedAggRewrite.rewriteJoin]] answers by
    * joining the store re-fold with the dim and re-aggregating partials
    * (fact scan never runs). The oracle is the plain join+GROUP BY over
    * lineitem with the same inline dim. Quantities are integral doubles:
    * sums, counts and the avg division are float-exact. */
  def q123MvJoinHit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val srcDir = java.nio.file.Files.createTempDirectory("q123src").toString
    t(s, dir, "lineitem")
      .select($"l_returnflag", $"l_quantity", $"l_orderkey")
      .write.mode("overwrite").parquet(srcDir)
    val spec = graft.ops.IncrementalAgg.Spec(Seq("l_returnflag"),
      Seq("l_quantity"))
    val store = new graft.sinks.AppendOnlyStore(s,
      java.nio.file.Files.createTempDirectory("q123store").toString,
      prefixCol = "__agg_key", prefixChars = 1)
    val src = s.read.parquet(srcDir)
    (0L to 2L).foreach(b => graft.ops.IncrementalAgg.appendBatch(store,
      src.filter($"l_orderkey" % 3 === b), spec, b))
    graft.plans.MaterializedAggRewrite.register(srcDir,
      graft.plans.MaterializedAggRewrite.MvDef(spec.keyCols, spec.sumCols,
        () => graft.ops.IncrementalAgg.current(store, spec)))
    val dim = Seq(("A", "archived"), ("N", "open"), ("R", "returned"))
      .toDF("l_returnflag", "status")
    s.read.parquet(srcDir).join(dim, Seq("l_returnflag"))
      .groupBy($"status")
      .agg(count(lit(1)).as("n_rows"), sum($"l_quantity").as("qty_d"),
        avg($"l_quantity").as("avg_d"))
      .select($"status", $"n_rows",
        floor($"qty_d" + 0.5).cast("long").as("sum_qty"),
        floor($"avg_d" * 10000.0 + 0.5).cast("long").as("avg_qty_e4"))
      .orderBy($"status")
  }

  /** Rolling 7-day active users per day (WAU): each distinct (user, day)
    * pair CONTRIBUTES to the 7 days it covers (explode of a 7-element
    * date sequence — bounded fan-out of the deduplicated pairs, not the
    * event stream), then one distinct-count per day. The naive range
    * join `spine.d BETWEEN a.d-6 AND a.d` plans a nested-loop at any
    * scale; the contribution form is an equi-join against the ~|days|
    * spine and stays partial-agg'd. */
  def q118RollingWau(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val days = t(s, dir, "events")
      .select($"user_id", to_date($"ts").as("d")).distinct()
    val spine = days.select($"d".as("day")).distinct()
    val contrib = days.select($"user_id",
      explode(expr("sequence(d, date_add(d, 6), interval 1 day)"))
        .as("day"))
    contrib.join(broadcast(spine), Seq("day"))
      .groupBy($"day")
      .agg(countDistinct($"user_id").as("wau"))
      .withColumn("day", date_format($"day", "yyyy-MM-dd"))
      .orderBy($"day")
  }

  /** Row-level quarantine (dbt store_failures / WAP-quarantine analog):
    * [[graft.checks.Checks.split]] annotates each violating document
    * with EVERY row-level check it fails — pure projections fused into
    * the scan, no shuffle — and the quarantined partition is returned.
    * The oracle rebuilds the same reason list with CASE + concat_ws,
    * gating both the split predicate and the reason attribution. */
  def q126Quarantine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.checks.Checks
    val docs = t(s, dir, "documents")
    val (_, bad) = Checks.split(docs, Seq(
      Checks.NotNull("text"),
      Checks.AcceptedValues("lang", Seq("en", "zh", "es")),
      Checks.Expression("min_len", $"n_chars" >= 100)))
    bad.select($"doc_id", $"lang", $"n_chars",
        concat_ws(";", $"__violations").as("violations"))
      .orderBy($"doc_id")
  }

  /** Z-order layout key (q155): customers projected onto a 16-bit
    * (custkey, acctbal-cents) grid by their actual min/max bounds, then
    * Morton-interleaved into one clustering key — the sort key
    * [[graft.ops.LayoutOps.writeZOrdered]] lays files out by so scans
    * filtering on EITHER column prune by footer stats. All exact integer
    * bit arithmetic (magic-number spread), so DuckDB reproduces every
    * z-value bit-for-bit; first 200 cells returned. */
  def q155ZOrderKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = t(s, dir, "customer").select($"c_custkey",
      floor($"c_acctbal" * 100.0 + 0.5).cast("long").as("cents"))
    val b = c.agg(min($"c_custkey").as("a0"), max($"c_custkey").as("a1"),
      min($"cents").as("b0"), max($"cents").as("b1"))
    c.crossJoin(broadcast(b))
      .select($"c_custkey",
        graft.ops.LayoutOps.zValue2(
          graft.ops.LayoutOps.scaleToGrid($"c_custkey", $"a0", $"a1"),
          graft.ops.LayoutOps.scaleToGrid($"cents", $"b0", $"b1")).as("zval"))
      .orderBy($"zval", $"c_custkey").limit(200)
  }

  /** Cohort retention matrix (q158): users bucketed by first-activity
    * week (Monday-aligned weeks since 1970-01-05), counted once per
    * (cohort, weeks-since-first) cell they were active in. Two shuffles
    * total at any scale — the per-user first-activity aggregate and the
    * cell distinct+count (the user⋈first join shuffles on the SAME
    * user_id key, so it reuses the first aggregate's partitioning). */
  def q158CohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events").select($"user_id", to_date($"ts").as("d"))
    val first = ev.groupBy($"user_id").agg(min($"d").as("d0"))
    ev.join(first, Seq("user_id"))
      .select($"user_id",
        floor(datediff($"d0", lit("1970-01-05")) / 7).as("cohort_week"),
        floor(datediff($"d", $"d0") / 7).as("week_offset"))
      .distinct()
      .groupBy($"cohort_week", $"week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_week", $"week_offset")
  }

  /** Exact triangle count (q159) over the part co-purchase graph (parts
    * sharing a high-quantity order line). The self-join that builds the
    * co-occurrence pairs is equi-keyed on the order — per-order fan-out
    * is bounded by order width, never corpus size — and the counting
    * itself is [[graft.ops.GraphOps.triangleCount]]'s degree-oriented
    * wedge join (O(m^1.5) work bound). The oracle counts by the
    * u<v<w enumeration instead — two independent algorithms, one exact
    * integer. */
  def q159Triangles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem").where($"l_quantity" >= 45)
      .select($"l_orderkey", $"l_partkey")
    val pairs = li
      .join(li.select($"l_orderkey", $"l_partkey".as("p2")), Seq("l_orderkey"))
      .where($"l_partkey" =!= $"p2")
      .select($"l_partkey".as("src"), $"p2".as("dst"))
    graft.ops.GraphOps.triangleCount(pairs)
  }

  /** Maintained triangle count under signed edge waves (q195): the q159
    * co-occurrence graph kept counted through two insert waves, a delete
    * wave, a replayed delete straddling a compaction, and a partial
    * re-insert — served from the count store's partials (never a
    * re-enumeration; the Δ-rule's δAA/δδA/δδδ terms are the only graph
    * work per batch). Oracle = the q159 triangle join over the net edge
    * set. */
  def q195IncTriangles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.IncrementalTriangles
    val li = t(s, dir, "lineitem").where($"l_quantity" >= 45)
      .select($"l_orderkey", $"l_partkey")
    val e = li
      .join(li.select($"l_orderkey", $"l_partkey".as("p2")), Seq("l_orderkey"))
      .where($"l_partkey" =!= $"p2")
      .select(least($"l_partkey", $"p2").as("src"),
        greatest($"l_partkey", $"p2").as("dst"))
      .distinct()
    val st = IncrementalTriangles.stores(s,
      java.nio.file.Files.createTempDirectory("q195tri").toString)
    def signed(df: org.apache.spark.sql.DataFrame, d: Long) =
      df.withColumn("__delta", lit(d))
    IncrementalTriangles.appendDelta(st,
      signed(e.filter(($"src" + $"dst") % 2 === 0), 1L), 0L)
    IncrementalTriangles.appendDelta(st,
      signed(e.filter(($"src" + $"dst") % 2 === 1), 1L), 1L)
    val takedown = signed(e.filter($"src" % 5 === 0), -1L)
    IncrementalTriangles.appendDelta(st, takedown, 2L)
    IncrementalTriangles.compact(st)
    IncrementalTriangles.appendDelta(st, takedown, 2L) // replay: no-op
    IncrementalTriangles.appendDelta(st,
      signed(e.filter($"src" % 5 === 0 && $"dst" % 3 === 0), 1L), 3L)
    IncrementalTriangles.current(st)
      .crossJoin(broadcast(IncrementalTriangles.currentEdges(st)
        .agg(count(lit(1)).as("n_edges"))))
      .select($"n_edges", $"n_triangles")
  }

  /** Maintained connected components, insert-only (q198): dup-cluster
    * labels kept current as co-occurrence edges stream in over three
    * waves (with a compaction-straddling replay) — each batch re-solves
    * only the components its endpoints touch (members join as star
    * edges), so merge cost tracks the touched components, never the
    * graph. Oracle = recursive-CTE min-reach labels over the full edge
    * set. */
  def q198IncCc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.IncrementalCc
    val li = t(s, dir, "lineitem").where($"l_quantity" >= 48)
      .select($"l_orderkey", $"l_partkey")
    val e = li
      .join(li.select($"l_orderkey", $"l_partkey".as("p2")), Seq("l_orderkey"))
      .where($"l_partkey" =!= $"p2")
      .select(least($"l_partkey", $"p2").as("src"),
        greatest($"l_partkey", $"p2").as("dst"))
      .distinct()
    val st = IncrementalCc.stores(s,
      java.nio.file.Files.createTempDirectory("q198cc").toString)
    IncrementalCc.appendEdges(st, e.filter(($"src" + $"dst") % 3 === 0), 0L)
    val w1 = e.filter(($"src" + $"dst") % 3 === 1)
    IncrementalCc.appendEdges(st, w1, 1L)
    IncrementalCc.compact(st)
    IncrementalCc.appendEdges(st, w1, 1L) // replay: manifest no-op
    IncrementalCc.appendEdges(st, e.filter(($"src" + $"dst") % 3 === 2), 2L)
    IncrementalCc.currentLabels(st)
      .select($"node", $"label")
      .orderBy($"node")
  }

  /** SIGNED connected components (q200): the q198 dup-cluster graph
    * with edge DELETES flowing through — the right-to-be-forgotten
    * closure at the CLUSTER layer. Two insert waves build the graph,
    * then a takedown wave retracts every edge whose canonical `src` is
    * ≡0 (mod 5) — removed docs leave the served labels entirely and
    * split components relabel from their surviving edges; a
    * compaction-straddling replay of the takedown is a no-op. Oracle =
    * recursive-CTE min-reach labels over the NET edge set. */
  def q200SignedCc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.IncrementalCc
    val li = t(s, dir, "lineitem").where($"l_quantity" >= 48)
      .select($"l_orderkey", $"l_partkey")
    val e = li
      .join(li.select($"l_orderkey", $"l_partkey".as("p2")), Seq("l_orderkey"))
      .where($"l_partkey" =!= $"p2")
      .select(least($"l_partkey", $"p2").as("src"),
        greatest($"l_partkey", $"p2").as("dst"))
      .distinct()
    val st = IncrementalCc.signedStores(s,
      java.nio.file.Files.createTempDirectory("q200cc").toString)
    def signed(df: org.apache.spark.sql.DataFrame, d: Long) =
      df.withColumn("__delta", lit(d))
    IncrementalCc.appendDelta(st,
      signed(e.filter(($"src" + $"dst") % 2 === 0), 1L), 0L)
    IncrementalCc.appendDelta(st,
      signed(e.filter(($"src" + $"dst") % 2 === 1), 1L), 1L)
    val takedown = signed(e.filter($"src" % 5 === 0), -1L)
    IncrementalCc.appendDelta(st, takedown, 2L)
    IncrementalCc.compact(st)
    IncrementalCc.appendDelta(st, takedown, 2L) // replay: emit-identical
    IncrementalCc.currentLabels(st)
      .select($"node", $"label")
      .orderBy($"node")
  }

  /** Maintained PageRank (q201): q89's quantized 3-iteration PageRank
    * kept current under SIGNED edge waves — two insert waves build the
    * trade graph, a takedown retracts every edge whose supplier node is
    * ≡1 (mod 7) (removed suppliers leave the served ranks entirely), a
    * compaction-straddling replay is a no-op, and a partial re-insert
    * wave restores a slice. Each wave re-solves only the k-hop
    * out-closure of its touched endpoints against stored boundary
    * vectors; the quantized integer arithmetic makes the merged result
    * BIT-identical to the oracle's from-scratch unrolled power
    * iteration over the net edge set. Top-100 hubs served. */
  def q201IncPageRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.IncrementalPageRank
    val e = t(s, dir, "orders")
      .join(t(s, dir, "lineitem").where($"l_quantity" >= 48),
        $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
      .cutLineage()
    def bi(w: org.apache.spark.sql.DataFrame, d: Long) =
      w.unionByName(w.select($"dst".as("src"), $"src".as("dst")))
        .withColumn("__delta", lit(d))
    val st = IncrementalPageRank.stores(s,
      java.nio.file.Files.createTempDirectory("q201pr").toString)
    IncrementalPageRank.appendDelta(st, bi(e.filter($"src" % 3 =!= 0), 1L), 0L)
    IncrementalPageRank.appendDelta(st, bi(e.filter($"src" % 3 === 0), 1L), 1L)
    val takedown = bi(e.filter($"dst" % 7 === 1), -1L)
    IncrementalPageRank.appendDelta(st, takedown, 2L)
    IncrementalPageRank.compact(st)
    IncrementalPageRank.appendDelta(st, takedown, 2L) // replay: no-op
    IncrementalPageRank.appendDelta(st,
      bi(e.filter($"dst" % 7 === 1 && $"src" % 4 === 0), 1L), 3L)
    IncrementalPageRank.currentRanks(st)
      .select($"node", $"r3".as("r"))
      .orderBy($"r".desc, $"node")
      .limit(100)
  }

  /** Maintained k-core (q203): q167's 3-core of the co-purchase graph
    * kept current under SIGNED edge waves — one bulk build (the
    * insertion region's seeds are the whole batch, so discovery ends in
    * one round and the cost is the anchored peel), then the DELTA
    * lifecycle the op exists for: a takedown of src ≡0 (mod 10) edges
    * (cascade peel, cost ∝ nodes that actually leave + frontier), a
    * compaction-straddling replay, and a partial re-insert whose
    * born-reachable region re-admits unraveled members. The result must
    * equal the oracle's full unrolled peel over the net edge set,
    * membership AND in-core degree. */
  def q203IncKCore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.IncrementalKCore
    val li = t(s, dir, "lineitem").where($"l_quantity" >= 45)
      .select($"l_orderkey", $"l_partkey")
    val e = li
      .join(li.select($"l_orderkey", $"l_partkey".as("p2")), Seq("l_orderkey"))
      .where($"l_partkey" =!= $"p2")
      .select(least($"l_partkey", $"p2").as("src"),
        greatest($"l_partkey", $"p2").as("dst"))
      .distinct()
      .cutLineage()
    val st = IncrementalKCore.stores(s,
      java.nio.file.Files.createTempDirectory("q203kc").toString,
      IncrementalKCore.Config(k = 3))
    def signed(df: org.apache.spark.sql.DataFrame, d: Long) =
      df.withColumn("__delta", lit(d))
    // phase-timed like q189: the waves' costs are loop-round-shaped
    // (cascade depth, region diameter), so the bench artifact carries
    // the per-wave breakdown
    def ph[T](p: String)(f: => T): T =
      graft.PhaseTimer.time("q203_inc_kcore", p)(f)
    ph("insert_all")(IncrementalKCore.appendDelta(st, signed(e, 1L), 0L))
    val takedown = signed(e.filter($"src" % 10 === 0), -1L)
    ph("takedown")(IncrementalKCore.appendDelta(st, takedown, 1L))
    ph("compact")(IncrementalKCore.compact(st))
    ph("replay_noop")(IncrementalKCore.appendDelta(st, takedown, 1L))
    ph("reinsert")(IncrementalKCore.appendDelta(st,
      signed(e.filter($"src" % 10 === 0 && $"dst" % 3 === 0), 1L), 2L))
    IncrementalKCore.currentCore(st)
      .orderBy($"node")
  }

  /** Maintained nearest-seed assignment (q204): q168's multi-source
    * labeled BFS (five supplier hubs, min-hop label with ties to the
    * minimum seed id) kept current under SIGNED edge waves — the
    * lexicographic (dist, seed) lift of the SSSP IVM, so a takedown
    * flips contested nodes to the surviving region and severed nodes
    * leave the served labels. Oracle = the full recursive walk
    * enumeration over the net edge set. */
  def q204IncNearestSeeds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.IncrementalNearestSeeds
    val e = t(s, dir, "orders")
      .join(t(s, dir, "lineitem").where($"l_quantity" >= 45),
        $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
      .cutLineage()
    def bi(w: org.apache.spark.sql.DataFrame, d: Long) =
      w.unionByName(w.select($"dst".as("src"), $"src".as("dst")))
        .withColumn("__delta", lit(d))
    val st = IncrementalNearestSeeds.stores(s,
      java.nio.file.Files.createTempDirectory("q204ns").toString,
      IncrementalNearestSeeds.Config(
        seeds = (1L to 5L).map(sd => (sd * 2 + 1, sd)), maxHops = 3))
    IncrementalNearestSeeds.appendDelta(st,
      bi(e.filter($"src" % 3 =!= 0), 1L), 0L)
    IncrementalNearestSeeds.appendDelta(st,
      bi(e.filter($"src" % 3 === 0), 1L), 1L)
    val takedown = bi(e.filter($"dst" % 9 === 5), -1L)
    IncrementalNearestSeeds.appendDelta(st, takedown, 2L)
    IncrementalNearestSeeds.compact(st)
    IncrementalNearestSeeds.appendDelta(st, takedown, 2L) // replay: no-op
    IncrementalNearestSeeds.appendDelta(st,
      bi(e.filter($"dst" % 9 === 5 && $"src" % 6 === 0), 1L), 3L)
    IncrementalNearestSeeds.currentLabels(st)
      .orderBy($"node")
  }

  /** Maintained hop-bounded SSSP (q202): q170's weighted trade-graph
    * shortest paths kept current under SIGNED edge waves — two insert
    * waves, a supplier takedown (severed subtrees leave the served
    * distances), a compaction-straddling replay, then a weight-update
    * wave (−old +new) that re-prices downstream nodes. Min-plus over
    * integers is tolerance-free: the oracle's full recursive walk
    * enumeration over the net weighted edge set must match row-for-row. */
  def q202IncSssp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.IncrementalSssp
    val e = t(s, dir, "orders")
      .join(t(s, dir, "lineitem").where($"l_quantity" >= 40),
        $"o_orderkey" === $"l_orderkey")
      .groupBy(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .agg(min($"l_quantity").cast("long").as("w"))
      .cutLineage()
    def bi(w: org.apache.spark.sql.DataFrame, d: Long) =
      w.unionByName(w.select($"dst".as("src"), $"src".as("dst"), $"w"))
        .withColumn("__delta", lit(d))
    val st = IncrementalSssp.stores(s,
      java.nio.file.Files.createTempDirectory("q202sp").toString,
      IncrementalSssp.Config(source = 2L, maxHops = 3))
    IncrementalSssp.appendDelta(st, bi(e.filter($"src" % 3 =!= 0), 1L), 0L)
    IncrementalSssp.appendDelta(st, bi(e.filter($"src" % 3 === 0), 1L), 1L)
    val takedown = bi(e.filter($"dst" % 5 === 3), -1L)
    IncrementalSssp.appendDelta(st, takedown, 2L)
    IncrementalSssp.compact(st)
    IncrementalSssp.appendDelta(st, takedown, 2L) // replay: no-op
    val repriced = e.filter($"src" % 8 === 2 && $"dst" % 5 =!= 3)
    IncrementalSssp.appendDelta(st,
      bi(repriced, -1L).unionByName(
        bi(repriced.withColumn("w", $"w" + 7L), 1L)), 3L)
    IncrementalSssp.currentDists(st)
      .orderBy($"node")
  }

  /** Maintained per-node clustering coefficients (q196): the q195
    * signed-wave scenario served from the per-node store — degree and
    * triangle-corner deltas accumulate under the same batch boundary as
    * the global count, so `(node, deg, n_tri, cc_e6)` is current after
    * every wave with zero re-enumeration. Fully-deleted nodes vanish.
    * Oracle = the q164 coefficient SQL over the net edge set. */
  def q196IncClusteringCoeff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.ops.IncrementalTriangles
    val li = t(s, dir, "lineitem").where($"l_quantity" >= 45)
      .select($"l_orderkey", $"l_partkey")
    val e = li
      .join(li.select($"l_orderkey", $"l_partkey".as("p2")), Seq("l_orderkey"))
      .where($"l_partkey" =!= $"p2")
      .select(least($"l_partkey", $"p2").as("src"),
        greatest($"l_partkey", $"p2").as("dst"))
      .distinct()
    val st = IncrementalTriangles.stores(s,
      java.nio.file.Files.createTempDirectory("q196tri").toString)
    def signed(df: org.apache.spark.sql.DataFrame, d: Long) =
      df.withColumn("__delta", lit(d))
    IncrementalTriangles.appendDelta(st,
      signed(e.filter(($"src" + $"dst") % 2 === 0), 1L), 0L)
    IncrementalTriangles.appendDelta(st,
      signed(e.filter(($"src" + $"dst") % 2 === 1), 1L), 1L)
    val takedown = signed(e.filter($"src" % 5 === 0), -1L)
    IncrementalTriangles.appendDelta(st, takedown, 2L)
    IncrementalTriangles.compact(st)
    IncrementalTriangles.appendDelta(st, takedown, 2L) // replay: no-op
    IncrementalTriangles.appendDelta(st,
      signed(e.filter($"src" % 5 === 0 && $"dst" % 3 === 0), 1L), 3L)
    IncrementalTriangles.currentPerNode(st)
      .select($"node", $"deg", $"n_tri", $"cc_e6")
      .orderBy($"node")
  }

  /** Edit-distance similarity self-join (q160): all customer-name pairs
    * within Levenshtein distance 2, via [[graft.ops.FuzzyJoin]]'s
    * PassJoin segment blocking — explode + equi-join + banded verify,
    * no cartesian. The oracle is the brute-force quadratic form with
    * DuckDB's levenshtein(), so the blocking's COMPLETENESS (not just
    * precision) is what the hash gate checks. */
  def q160FuzzyJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val names = t(s, dir, "customer")
      .where($"c_custkey" % 40 === 0)
      .select($"c_custkey".as("id"), $"c_name".as("name"))
    graft.ops.FuzzyJoin.selfEditDistanceJoin(names, "id", "name", k = 2)
      .orderBy($"id1", $"id2")
  }

  /** Rolling-window anomaly detection (q161): daily event-type volumes
    * flagged when they sit over 2σ from the trailing-7-observation mean.
    * The z-test is cleared of division and square roots by multiplying
    * through — `(w·n − s)² > 4·(w·ss − s²)` over integer count/sum/
    * sum-of-squares window aggregates — so the flag is EXACT integer
    * arithmetic, bit-portable across engines, and the whole query is one
    * date-grain aggregation plus one keyed window (no self-join against
    * the trailing days). The multiplied-through products wrap Int64 once
    * daily counts pass ~3·10⁹ (and DuckDB would raise instead — a silent
    * cross-engine divergence), so both sides compute them in 128-bit
    * exact types: DECIMAL(38,0) here, HUGEINT in the oracle — exact for
    * daily counts up to ~10¹⁷ (beyond the square of any real event
    * volume; (7·10¹⁷)² ≈ 5·10³⁵ < 10³⁸). */
  def q161RollingAnomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = t(s, dir, "events")
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("n"))
    val win = Window.partitionBy($"event_type").orderBy($"d")
      .rowsBetween(-7, -1)
    val dec = "decimal(38,0)"
    daily.select($"event_type", $"d", $"n",
        count(lit(1)).over(win).as("w"),
        sum($"n".cast(dec)).over(win).as("s"),
        sum($"n".cast(dec) * $"n").over(win).as("ss"))
      .where($"w" >= 4 && {
        val diff = $"w".cast(dec) * $"n" - $"s"
        diff * diff > lit(4) * ($"w".cast(dec) * $"ss" - $"s" * $"s")
      })
      .select($"event_type", date_format($"d", "yyyy-MM-dd").as("day"),
        $"n", $"w".as("n_window"), $"s".cast("long").as("win_sum"))
      .orderBy($"event_type", $"day")
  }

  /** Single-source BFS (q162): hop distances from one customer node over
    * the symmetrized customer↔supplier trade graph, via
    * [[graft.ops.GraphOps.bfsDistances]]'s frontier iteration. The
    * oracle is DuckDB's recursive CTE over the same edges — the
    * accumulate-and-dedup evaluation strategy the scaladoc contrasts
    * with — so the two shapes must agree node-for-node. */
  /** Trigram-index substring search (q176): documents re-laid into a
    * 16-file table, a [[graft.sinks.FileTrigramIndex]] built over it,
    * and a `%needle%` search answered through the index path — the
    * result must equal the oracle's plain LIKE over the full table.
    * NOTE on this corpus: the synthetic ~30-word vocabulary saturates
    * every file with every trigram of any vocab phrase (only the
    * CONTIGUITY is rare), so here the index admits all files and the
    * gate is pure index-path/residual correctness; the file-PRUNING
    * behavior is gated in FileTrigramIndexSpec on planted rare terms. */
  def q176TrigramSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val data = java.nio.file.Files.createTempDirectory("q176data").toString
    val idx = java.nio.file.Files.createTempDirectory("q176idx").toString
    docs.repartition(16, $"doc_id").write.mode("overwrite").parquet(data)
    val nFiles = graft.sinks.FileTrigramIndex.build(s, data, "text", idx)
    require(nFiles == 16, s"expected the 16-file layout, got $nFiles")
    graft.sinks.FileTrigramIndex.containsLookup(
        s, data, idx, "text", "column agg join")
      .select($"doc_id", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Trigram-index pruning, live in the driver gate (q181): q176 proves
    * index-path result equality but its vocab-saturated corpus admits
    * every file; THIS leg plants a rare marker (`zqxhatchv`) into the
    * contiguous doc_id < 100 block and lays the corpus out by doc_id
    * RANGE, so the marker's trigrams exist only in the file(s) holding
    * that block. The search must (a) admit few files — asserted
    * in-query, loudly — and (b) return exactly the planted rows, which
    * the oracle derives from the planting rule alone. A pruning bug
    * that drops an admitted file loses rows and breaks the hash; a bug
    * that stops pruning trips the file-count require. */
  def q181TrigramPruned(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val data = java.nio.file.Files.createTempDirectory("q181data").toString
    val idx = java.nio.file.Files.createTempDirectory("q181idx").toString
    docs.select($"doc_id", $"n_chars",
        when($"doc_id" < 100,
          concat($"text", lit(" zqxhatchv marker"))).otherwise($"text")
          .as("text"))
      .repartitionByRange(16, $"doc_id")
      .write.mode("overwrite").parquet(data)
    graft.sinks.FileTrigramIndex.build(s, data, "text", idx)
    val admitted = graft.sinks.FileTrigramIndex.candidateFiles(
      s, idx, "zqxhatchv")
    require(admitted.nonEmpty && admitted.size <= 6,
      s"q181: expected the planted block to prune to ≤6 of 16 files, " +
        s"got ${admitted.size}")
    graft.sinks.FileTrigramIndex.containsLookup(
        s, data, idx, "text", "zqxhatchv")
      .select($"doc_id", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Interval-overlap join (q174): click intervals × purchase intervals
    * per user (each event padded to a 30-minute window), via
    * [[graft.ops.TemporalJoins.intervalOverlapJoin]]'s bucketized
    * equi-join — complete by construction (a pair survives exactly in
    * the bucket of max(start)), never a nested loop. The oracle is the
    * raw inequality join DuckDB runs through its specialized IEJoin —
    * two different algorithms, one exact pair multiset. */
  def q174IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val halfHourUs = 1800000000L
    def side(tpe: String, idAs: String, sAs: String, eAs: String) =
      t(s, dir, "events").filter($"event_type" === tpe)
        .select($"user_id", $"event_id".as(idAs),
          unix_micros($"ts").as(sAs),
          (unix_micros($"ts") + halfHourUs).as(eAs))
    val pairs = graft.ops.TemporalJoins.intervalOverlapJoin(
      side("click", "a_id", "s1", "e1"),
      "s1", "e1",
      side("purchase", "b_id", "s2", "e2"),
      "s2", "e2",
      keys = Seq("user_id"), bucketWidth = halfHourUs.toDouble)
    pairs.groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"b_id" - $"a_id").as("id_gap"))
      .orderBy($"user_id")
  }

  def q162Bfs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    val bi = e.unionByName(e.select($"dst".as("src"), $"src".as("dst")))
    graft.ops.GraphOps.bfsDistances(bi, source = 2L, maxHops = 3)
      .orderBy($"node")
  }

  /** Per-node clustering coefficient (q164) on the q159 co-purchase
    * graph: triangles per corner over the degree pair count, in exact
    * micro-unit integer division ([[graft.ops.GraphOps
    * .clusteringCoefficient]]) — no float ever divides, so the DuckDB
    * twin (which enumerates triangles by a<b<c id order instead of the
    * engine's degree-rank orientation) must agree bit-for-bit. */
  def q164ClusteringCoeff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem").where($"l_quantity" >= 45)
      .select($"l_orderkey", $"l_partkey")
    val pairs = li
      .join(li.select($"l_orderkey", $"l_partkey".as("p2")), Seq("l_orderkey"))
      .where($"l_partkey" =!= $"p2")
      .select($"l_partkey".as("src"), $"p2".as("dst"))
    graft.ops.GraphOps.clusteringCoefficient(pairs)
      .orderBy($"node")
  }

  /** Window-function breadth (q166): first_value / nth_value / lag-with-
    * default / dense_rank / a RANGE value-frame sum, all in one pass over
    * a user-keyed sample. Engine-parity notes: every navigation function
    * runs under the proven (ts_us, event_id) total order; the range frame
    * orders by an INTEGER day number so both engines apply identical
    * peer-row semantics (same-day rows all join the frame regardless of
    * intra-day order); money quantized to cents before the frame sum.
    * One exchange — every window shares the user_id partitioning. */
  def q166WindowBreadth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = t(s, dir, "events")
      .where($"user_id" % 97 === 0)
      .select($"user_id", $"event_id", $"event_type",
        unix_micros($"ts").as("ts_us"),
        datediff(to_date($"ts"), lit("1995-01-01").cast("date")).as("day_num"),
        floor($"value" * 100.0 + 0.5).cast("long").as("cents"))
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val wDay = Window.partitionBy($"user_id").orderBy($"day_num")
    val wRange = Window.partitionBy($"user_id").orderBy($"day_num")
      .rangeBetween(-2, Window.currentRow)
    ev.select($"user_id", $"event_id",
        first_value($"event_type").over(w).as("first_type"),
        nth_value($"event_type", 2).over(w).as("second_type"),
        lag($"event_type", 1, "none").over(w).as("prev_type"),
        dense_rank().over(wDay).as("day_rank"),
        sum($"cents").over(wRange).as("r3_cents"))
      .orderBy($"user_id", $"event_id")
  }

  /** 3-core extraction (q167) on the q159 co-purchase graph via
    * [[graft.ops.GraphOps.kCore]]'s iterative peel (two shuffles a
    * round, one count scalar, REFUSES an unconverged result). The
    * oracle unrolls 14 peel rounds as nested CTEs — more than the
    * measured fixpoint depth (10 at sf0.1) — which is exact because
    * peeling is monotone: once stable, further rounds are no-ops, so
    * any round count ≥ the fixpoint depth yields THE k-core. */
  def q167KCore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = t(s, dir, "lineitem").where($"l_quantity" >= 45)
      .select($"l_orderkey", $"l_partkey")
    val pairs = li
      .join(li.select($"l_orderkey", $"l_partkey".as("p2")), Seq("l_orderkey"))
      .where($"l_partkey" =!= $"p2")
      .select($"l_partkey".as("src"), $"p2".as("dst"))
    graft.ops.GraphOps.kCore(pairs, k = 3, maxIter = 14)
      .orderBy($"node")
  }

  /** The q167 oracle: `rounds` peel iterations unrolled as nested CTEs
    * (DuckDB recursive CTEs cannot aggregate over the recursive
    * relation, so fixpoint-with-degrees must be unrolled). Every CTE is
    * `AS MATERIALIZED`: each round references its predecessor several
    * times, and inlining would expand the plan — and the parquet scan
    * count — exponentially in the round count. */
  private def kCoreOracleSql(k: Int, rounds: Int,
                             netWhere: String = ""): String = {
    val peels = (1 to rounds).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT node, count(*) AS deg FROM (
         |    SELECT u AS node FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1})
         |  GROUP BY node),
         |e$i AS MATERIALIZED (
         |  SELECT u, v FROM e${i - 1}
         |  WHERE u IN (SELECT node FROM d$i WHERE deg >= $k)
         |    AND v IN (SELECT node FROM d$i WHERE deg >= $k))""".stripMargin
    }.mkString(",\n")
    // an optional net filter turns the full co-purchase graph into a
    // wave scenario's NET edge set (q203) without duplicating the peel
    val e0Body =
      s"""SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
         |                  greatest(a.l_partkey, b.l_partkey) AS v
         |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
         |  WHERE a.l_partkey <> b.l_partkey""".stripMargin
    val e0 =
      if (netWhere.isEmpty) e0Body
      else s"""SELECT u, v FROM ($e0Body) WHERE $netWhere"""
    // convergence assertion: an unrolled peel is exact ONLY if the last
    // round was a fixpoint (|e_rounds| = |e_{rounds-1}|). At a larger
    // scale factor a deeper cascade would otherwise leave the oracle
    // silently under-peeled and fail the hash gate confusingly; this
    // makes it fail LOUDLY with the remedy in the message.
    s"""WITH li AS MATERIALIZED (
       |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
       |e0 AS MATERIALIZED (
       |  $e0),
       |$peels,
       |conv AS (
       |  SELECT CASE WHEN (SELECT count(*) FROM e$rounds) =
       |                   (SELECT count(*) FROM e${rounds - 1})
       |         THEN TRUE
       |         ELSE error('k-core oracle under-peeled at rounds=$rounds' ||
       |                    ' - raise rounds') END AS ok)
       |SELECT node, count(*) AS deg FROM (
       |  SELECT u AS node FROM e$rounds UNION ALL SELECT v FROM e$rounds)
       |GROUP BY node
       |HAVING (SELECT ok FROM conv)
       |ORDER BY node""".stripMargin
  }

  /** Nearest-seed assignment (q168): every node of the trade graph
    * labeled with its closest of five supplier hubs (min hop distance,
    * ties to the smallest seed id) via
    * [[graft.ops.GraphOps.nearestSeeds]]' multi-source frontier. The
    * oracle recomputes the label from DuckDB's FULL path enumeration
    * (recursive CTE → min dist per node → min seed at that dist), so
    * the frontier's local min-of-mins reduction is gated against the
    * global definition. */
  def q168NearestSeeds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    val bi = e.unionByName(e.select($"dst".as("src"), $"src".as("dst")))
    val seeds = (1L to 5L).toDF("seed")
      .select(($"seed" * 2 + 1).as("node"), $"seed")
    graft.ops.GraphOps.nearestSeeds(bi, seeds, maxHops = 3)
      .orderBy($"node")
  }

  /** Higher-order array functions (q169): transform / filter /
    * aggregate / zip_with / reverse over per-document token-length
    * arrays, all integer arithmetic. These are the codegen'd HOFs a
    * user reaches for before ever writing a UDF — the engine's
    * no-UDF-in-the-hot-path posture depends on them — and each has a
    * DuckDB list_* twin, so the whole lambda surface is hash-gated.
    * Split harmonization: regex split + drop-empties on both engines
    * (bare split disagrees on leading/consecutive whitespace). */
  def q169ArrayHofs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "documents")
      .where($"doc_id" < 200 && $"text".isNotNull)
      .select($"doc_id",
        expr("transform(filter(split(text, '\\\\s+'), w -> length(w) > 0), " +
          "w -> length(w))").as("lens"))
      .select($"doc_id",
        size($"lens").as("n_words"),
        size(expr("filter(lens, x -> x > 5)")).as("n_long"),
        expr("aggregate(filter(lens, x -> x > 5), CAST(0 AS BIGINT), " +
          "(a, x) -> a + x)").as("sum_long_chars"),
        expr("aggregate(zip_with(lens, reverse(lens), (a, b) -> a + b), " +
          "CAST(0 AS BIGINT), (a, x) -> a + x)").as("zip_sum"))
      .orderBy($"doc_id")
  }

  /** Weighted shortest paths (q170): hop-bounded Bellman-Ford over the
    * trade graph, edge weight = the pair's minimum traded quantity
    * (deterministic integer). [[graft.ops.GraphOps.ssspBounded]]'s
    * per-round relax-and-min must equal the oracle's full recursive
    * walk enumeration min'd per node — the min-plus semiring done two
    * ways. */
  def q170Sssp(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey")
      .groupBy(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .agg(min($"l_quantity").cast("long").as("w"))
    val bi = e.unionByName(e.select($"dst".as("src"), $"src".as("dst"), $"w"))
    graft.ops.GraphOps.ssspBounded(bi, source = 2L, maxHops = 3)
      .orderBy($"node")
  }

  val queries: Map[String, Q] = Map(
    "q170_sssp" -> (q170Sssp _),
    "q169_array_hofs" -> (q169ArrayHofs _),
    "q168_nearest_seeds" -> (q168NearestSeeds _),
    "q167_kcore" -> (q167KCore _),
    "q166_window_breadth" -> (q166WindowBreadth _),
    "q164_clustering_coeff" -> (q164ClusteringCoeff _),
    "q159_triangles" -> (q159Triangles _),
    "q195_inc_triangles" -> (q195IncTriangles _),
    "q196_inc_clustering" -> (q196IncClusteringCoeff _),
    "q198_inc_cc" -> (q198IncCc _),
    "q204_inc_nearest_seeds" -> (q204IncNearestSeeds _),
    "q203_inc_kcore" -> (q203IncKCore _),
    "q202_inc_sssp" -> (q202IncSssp _),
    "q201_inc_pagerank" -> (q201IncPageRank _),
    "q200_signed_cc" -> (q200SignedCc _),
    "q160_fuzzy_join" -> (q160FuzzyJoin _),
    "q161_rolling_anomaly" -> (q161RollingAnomaly _),
    "q174_interval_overlap" -> (q174IntervalOverlap _),
    "q176_trigram_search" -> (q176TrigramSearch _),
    "q181_trigram_pruned" -> (q181TrigramPruned _),
    "q162_bfs" -> (q162Bfs _),
    "q158_cohort_retention" -> (q158CohortRetention _),
    "q155_zorder" -> (q155ZOrderKey _),
    "q126_quarantine" -> (q126Quarantine _),
    "q118_rolling_wau" -> (q118RollingWau _),
    "q117_mv_hit" -> (q117MvHit _),
    "q123_mv_join_hit" -> (q123MvJoinHit _),
    "q116_zone_range" -> (q116ZoneRange _),
    "q114_percent_of_total" -> (q114PercentOfTotal _),
    "q115_year_over_year" -> (q115YearOverYear _),
    "q111_inter_event_times" -> (q111InterEventTimes _),
    "q112_cooccurrence" -> (q112Cooccurrence _),
    "q110_vocab_coverage" -> (q110VocabCoverage _),
    "q109_mad" -> (q109Mad _),
    "q106_bloom_lookup" -> (q106BloomLookup _),
    "q107_winsorize" -> (q107Winsorize _),
    "q102_regression" -> (q102Regression _),
    "q103_entropy" -> (q103Entropy _),
    "q104_k_anonymity" -> (q104KAnonymity _),
    "q105_debounce" -> (q105Debounce _),
    "q94_transitions" -> (q94Transitions _),
    "q95_streaks" -> (q95Streaks _),
    "q96_interval_coverage" -> (q96IntervalCoverage _),
    "q97_schema_union" -> (q97SchemaUnion _),
    "q98_mode_per_group" -> (q98ModePerGroup _),
    "q99_equidepth_hist" -> (q99EquidepthHist _),
    "q100_gap_fill" -> (q100GapFill _),
    "q101_reservoir_sample" -> (q101ReservoirSample _)
  )

  val oracles: Map[String, String] = Map(
    "q170_sssp" ->
      """WITH RECURSIVE e0 AS (
        |  SELECT o_custkey*2 AS src, l_suppkey*2 + 1 AS dst,
        |         CAST(min(l_quantity) AS BIGINT) AS w
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2),
        |bi AS (SELECT src, dst, w FROM e0
        |       UNION ALL SELECT dst, src, w FROM e0),
        |walk(node, cost, hops) AS (
        |  SELECT CAST(2 AS BIGINT), CAST(0 AS BIGINT), 0
        |  UNION
        |  SELECT bi.dst, w.cost + bi.w, w.hops + 1
        |  FROM walk w JOIN bi ON w.node = bi.src
        |  WHERE w.hops < 3)
        |SELECT node, min(cost) AS cost FROM walk GROUP BY node
        |ORDER BY node""".stripMargin,
    "q169_array_hofs" ->
      """WITH l AS (
        |  SELECT doc_id,
        |    list_transform(
        |      list_filter(regexp_split_to_array(text, '\s+'),
        |                  w -> length(w) > 0),
        |      w -> length(w)) AS lens
        |  FROM documents WHERE doc_id < 200 AND text IS NOT NULL)
        |SELECT doc_id,
        |  CAST(len(lens) AS INTEGER) AS n_words,
        |  CAST(len(list_filter(lens, x -> x > 5)) AS INTEGER) AS n_long,
        |  CAST(coalesce(list_sum(list_filter(lens, x -> x > 5)), 0)
        |    AS BIGINT) AS sum_long_chars,
        |  CAST(coalesce(list_sum(list_transform(
        |    list_zip(lens, list_reverse(lens)), x -> x[1] + x[2])), 0)
        |    AS BIGINT) AS zip_sum
        |FROM l ORDER BY doc_id""".stripMargin,
    "q168_nearest_seeds" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |bi AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |seeds AS (
        |  SELECT s*2 + 1 AS node, CAST(s AS BIGINT) AS seed
        |  FROM generate_series(1, 5) t(s)),
        |walk(node, seed, dist) AS (
        |  SELECT node, seed, CAST(0 AS BIGINT) FROM seeds
        |  UNION
        |  SELECT bi.dst, w.seed, w.dist + 1
        |  FROM walk w JOIN bi ON w.node = bi.src
        |  WHERE w.dist < 3),
        |best AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node)
        |SELECT w.node, min(w.seed) AS seed, b.dist
        |FROM walk w JOIN best b ON w.node = b.node AND w.dist = b.dist
        |GROUP BY w.node, b.dist
        |ORDER BY w.node""".stripMargin,
    "q167_kcore" -> kCoreOracleSql(k = 3, rounds = 14),
    "q166_window_breadth" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    datediff('day', DATE '1995-01-01', CAST(ts AS DATE)) AS day_num,
        |    CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE user_id % 97 = 0)
        |SELECT user_id, event_id,
        |  first_value(event_type) OVER w AS first_type,
        |  nth_value(event_type, 2) OVER w AS second_type,
        |  lag(event_type, 1, 'none') OVER w AS prev_type,
        |  CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY day_num)
        |    AS INTEGER) AS day_rank,
        |  CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY day_num
        |    RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS r3_cents
        |FROM ev
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
        |ORDER BY user_id, event_id""".stripMargin,
    "q164_clustering_coeff" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
        |e AS (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
        |                  greatest(a.l_partkey, b.l_partkey) AS v
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey <> b.l_partkey),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY node),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1
        |  JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        |pern AS (
        |  SELECT node, count(*) AS n_tri FROM (
        |    SELECT a AS node FROM tri UNION ALL
        |    SELECT b FROM tri UNION ALL
        |    SELECT c FROM tri)
        |  GROUP BY node)
        |SELECT d.node, d.deg,
        |  CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_tri,
        |  CASE WHEN d.deg < 2 THEN 0
        |       ELSE (2 * coalesce(p.n_tri, 0) * 1000000)
        |            // (d.deg * (d.deg - 1)) END AS cc_e6
        |FROM deg d LEFT JOIN pern p USING (node)
        |ORDER BY node""".stripMargin,
    "q159_triangles" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
        |e AS (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
        |                  greatest(a.l_partkey, b.l_partkey) AS v
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey <> b.l_partkey)
        |SELECT count(*) AS n_triangles
        |FROM e e1
        |JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        |JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v""".stripMargin,
    // q198: recursive-CTE min-reach component labels over the full
    // (insert-only) edge set
    "q198_inc_cc" ->
      """WITH RECURSIVE li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 48),
        |e AS (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
        |                  greatest(a.l_partkey, b.l_partkey) AS v
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey <> b.l_partkey),
        |sym AS (
        |  SELECT u AS src, v AS dst FROM e
        |  UNION ALL
        |  SELECT v AS src, u AS dst FROM e),
        |walk(node, reach) AS (
        |  SELECT src, src FROM sym
        |  UNION
        |  SELECT w.node, s.dst FROM walk w JOIN sym s ON w.reach = s.src),
        |cc AS (SELECT node, min(reach) AS label FROM walk GROUP BY node)
        |SELECT node, label FROM cc
        |ORDER BY node""".stripMargin,
    // q204: q168's full walk enumeration over the NET edge set
    // (supplier-node ≡5 (mod 9) takedown applied except the re-inserted
    // src ≡0 (mod 6) slice); min dist per node, min seed at that dist
    "q204_inc_nearest_seeds" ->
      """WITH RECURSIVE e0 AS (
        |  SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE l_quantity >= 45),
        |e AS (SELECT src, dst FROM e0 WHERE dst % 9 <> 5 OR src % 6 = 0),
        |bi AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |seeds AS (
        |  SELECT s*2 + 1 AS node, CAST(s AS BIGINT) AS seed
        |  FROM generate_series(1, 5) t(s)),
        |walk(node, seed, dist) AS (
        |  SELECT node, seed, CAST(0 AS BIGINT) FROM seeds
        |  UNION
        |  SELECT bi.dst, w.seed, w.dist + 1
        |  FROM walk w JOIN bi ON w.node = bi.src
        |  WHERE w.dist < 3),
        |best AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node)
        |SELECT w.node, min(w.seed) AS seed, b.dist
        |FROM walk w JOIN best b ON w.node = b.node AND w.dist = b.dist
        |GROUP BY w.node, b.dist
        |ORDER BY w.node""".stripMargin,
    // q203: q167's unrolled peel over the NET co-purchase edge set
    // (src ≡0 (mod 10) takedown applied, its (dst%3=0) slice
    // re-inserted); 14 rounds ≥ the measured sync peel depth (5 at
    // sf0.1), exact because peeling is monotone
    "q203_inc_kcore" ->
      kCoreOracleSql(k = 3, rounds = 14,
        netWhere = "u % 10 <> 0 OR v % 3 = 0"),
    // q202: q170's recursive walk enumeration over the NET weighted
    // edge set (supplier-node ≡3 (mod 5) takedown applied; src ≡2
    // (mod 8) survivors re-priced +7)
    "q202_inc_sssp" ->
      """WITH RECURSIVE e0 AS (
        |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
        |         CAST(min(l_quantity) AS BIGINT) AS w
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE l_quantity >= 40
        |  GROUP BY 1, 2),
        |e AS (
        |  SELECT src, dst,
        |         w + CASE WHEN src % 8 = 2 THEN 7 ELSE 0 END AS w
        |  FROM e0 WHERE dst % 5 <> 3),
        |bi AS (SELECT src, dst, w FROM e
        |       UNION ALL SELECT dst, src, w FROM e),
        |walk(node, cost, hops) AS (
        |  SELECT CAST(2 AS BIGINT), CAST(0 AS BIGINT), 0
        |  UNION
        |  SELECT bi.dst, w.cost + bi.w, w.hops + 1
        |  FROM walk w JOIN bi ON w.node = bi.src
        |  WHERE w.hops < 3)
        |SELECT node, min(cost) AS cost FROM walk GROUP BY node
        |ORDER BY node""".stripMargin,
    // q201: q89's unrolled quantized 3-iteration PageRank over the NET
    // edge set (takedown removed supplier-node ≡1 (mod 7) edges except
    // the re-inserted src ≡0 (mod 4) slice); bit-exact integer ranks
    "q201_inc_pagerank" ->
      """WITH li AS (
        |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE l_quantity >= 48),
        |e0 AS (SELECT DISTINCT src, dst FROM li),
        |e AS (SELECT src, dst FROM e0 WHERE dst % 7 <> 1 OR src % 4 = 0),
        |bi AS (
        |  SELECT src, dst FROM e
        |  UNION ALL
        |  SELECT dst AS src, src AS dst FROM e),
        |deg AS (SELECT src, count(*) AS deg FROM bi GROUP BY src),
        |nodes AS (
        |  SELECT DISTINCT node FROM
        |    (SELECT src AS node FROM bi UNION ALL SELECT dst FROM bi)),
        |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
        |c1 AS (
        |  SELECT b.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
        |  FROM bi b JOIN r0 r ON b.src = r.node JOIN deg d ON b.src = d.src
        |  GROUP BY b.dst),
        |r1 AS (
        |  SELECT n.node,
        |    CAST(150000000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c1 ON n.node = c1.node),
        |c2 AS (
        |  SELECT b.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
        |  FROM bi b JOIN r1 r ON b.src = r.node JOIN deg d ON b.src = d.src
        |  GROUP BY b.dst),
        |r2 AS (
        |  SELECT n.node,
        |    CAST(150000000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c2 ON n.node = c2.node),
        |c3 AS (
        |  SELECT b.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
        |  FROM bi b JOIN r2 r ON b.src = r.node JOIN deg d ON b.src = d.src
        |  GROUP BY b.dst),
        |r3 AS (
        |  SELECT n.node,
        |    CAST(150000000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS r
        |  FROM nodes n LEFT JOIN c3 ON n.node = c3.node)
        |SELECT node, r FROM r3
        |ORDER BY r DESC, node
        |LIMIT 100""".stripMargin,
    // q200: recursive-CTE min-reach labels over the NET edge set (the
    // takedown wave removed src ≡ 0 (mod 5) edges); only nodes with a
    // surviving edge appear — removed docs vanish from cluster labels
    "q200_signed_cc" ->
      """WITH RECURSIVE li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 48),
        |e0 AS (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
        |                  greatest(a.l_partkey, b.l_partkey) AS v
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey <> b.l_partkey),
        |e AS (SELECT u, v FROM e0 WHERE u % 5 <> 0),
        |sym AS (
        |  SELECT u AS src, v AS dst FROM e
        |  UNION ALL
        |  SELECT v AS src, u AS dst FROM e),
        |walk(node, reach) AS (
        |  SELECT src, src FROM sym
        |  UNION
        |  SELECT w.node, s.dst FROM walk w JOIN sym s ON w.reach = s.src),
        |cc AS (SELECT node, min(reach) AS label FROM walk GROUP BY node)
        |SELECT node, label FROM cc
        |ORDER BY node""".stripMargin,
    // q196: q164's coefficient SQL over the same NET edge set as q195;
    // only nodes with live degree appear (fully-deleted nodes vanish)
    "q196_inc_clustering" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
        |e0 AS (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
        |                  greatest(a.l_partkey, b.l_partkey) AS v
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey <> b.l_partkey),
        |e AS (
        |  SELECT u, v FROM e0 WHERE u % 5 <> 0 OR v % 3 = 0),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY node),
        |tri AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1
        |  JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
        |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
        |pern AS (
        |  SELECT node, count(*) AS n_tri FROM (
        |    SELECT a AS node FROM tri UNION ALL
        |    SELECT b FROM tri UNION ALL
        |    SELECT c FROM tri)
        |  GROUP BY node)
        |SELECT d.node, d.deg,
        |  CAST(coalesce(p.n_tri, 0) AS BIGINT) AS n_tri,
        |  CASE WHEN d.deg < 2 THEN 0
        |       ELSE (2 * coalesce(p.n_tri, 0) * 1000000)
        |            // (d.deg * (d.deg - 1)) END AS cc_e6
        |FROM deg d LEFT JOIN pern p USING (node)
        |ORDER BY node""".stripMargin,
    // q195: q159's triangle join over the NET edge set — the %src=0
    // takedown applied, its (dst%3=0) slice re-inserted
    "q195_inc_triangles" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 45),
        |e AS (
        |  SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS u,
        |                  greatest(a.l_partkey, b.l_partkey) AS v
        |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |  WHERE a.l_partkey <> b.l_partkey),
        |net AS (
        |  SELECT u, v FROM e WHERE u % 5 <> 0 OR v % 3 = 0)
        |SELECT (SELECT count(*) FROM net) AS n_edges,
        |  (SELECT count(*)
        |   FROM net e1
        |   JOIN net e2 ON e1.u = e2.u AND e1.v < e2.v
        |   JOIN net e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles""".stripMargin,
    "q160_fuzzy_join" ->
      """WITH c AS (
        |  SELECT c_custkey AS id, c_name AS s FROM customer
        |  WHERE c_custkey % 40 = 0)
        |SELECT a.id AS id1, b.id AS id2, a.s AS str1, b.s AS str2,
        |  CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
        |FROM c a JOIN c b
        |  ON a.id < b.id AND abs(length(a.s) - length(b.s)) <= 2
        |WHERE levenshtein(a.s, b.s) <= 2
        |ORDER BY id1, id2""".stripMargin,
    "q176_trigram_search" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE text LIKE '%column agg join%'
        |ORDER BY doc_id""".stripMargin,
    // the planted-marker rule IS the oracle: only doc_id < 100 rows
    // received the marker, and the base vocabulary cannot contain it
    "q181_trigram_pruned" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE doc_id < 100
        |ORDER BY doc_id""".stripMargin,
    "q174_interval_overlap" ->
      """WITH a AS (
        |  SELECT user_id, event_id AS a_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS s1,
        |    epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e1
        |  FROM events WHERE event_type = 'click'),
        |b AS (
        |  SELECT user_id, event_id AS b_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS s2,
        |    epoch_us(CAST(ts AS TIMESTAMP)) + 1800000000 AS e2
        |  FROM events WHERE event_type = 'purchase')
        |SELECT a.user_id, count(*) AS n_pairs,
        |  CAST(sum(b.b_id - a.a_id) AS BIGINT) AS id_gap
        |FROM a JOIN b ON a.user_id = b.user_id
        |  AND a.s1 <= b.e2 AND b.s2 <= a.e1
        |GROUP BY a.user_id
        |ORDER BY a.user_id""".stripMargin,
    "q161_rolling_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
        |  FROM events GROUP BY event_type, CAST(ts AS DATE)),
        |w AS (
        |  SELECT event_type, d, n,
        |    count(*) OVER win AS w,
        |    sum(CAST(n AS HUGEINT)) OVER win AS s,
        |    sum(CAST(n AS HUGEINT) * n) OVER win AS ss
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY d
        |                 ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, strftime(d, '%Y-%m-%d') AS day, n,
        |  w AS n_window, CAST(s AS BIGINT) AS win_sum
        |FROM w
        |WHERE w >= 4
        |  AND (CAST(w AS HUGEINT)*n - s)*(CAST(w AS HUGEINT)*n - s)
        |    > 4*(CAST(w AS HUGEINT)*ss - s*s)
        |ORDER BY event_type, day""".stripMargin,
    "q162_bfs" ->
      """WITH RECURSIVE e AS (
        |  SELECT DISTINCT o_custkey*2 AS src, l_suppkey*2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |bi AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
        |walk(node, dist) AS (
        |  SELECT CAST(2 AS BIGINT), CAST(0 AS BIGINT)
        |  UNION
        |  SELECT bi.dst, w.dist + 1 FROM walk w JOIN bi ON w.node = bi.src
        |  WHERE w.dist < 3)
        |SELECT node, min(dist) AS dist FROM walk GROUP BY node
        |ORDER BY node""".stripMargin,
    "q158_cohort_retention" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |first AS (SELECT user_id, min(d) AS d0 FROM ev GROUP BY user_id),
        |cells AS (
        |  SELECT DISTINCT ev.user_id,
        |    datediff('day', DATE '1970-01-05', d0) // 7 AS cohort_week,
        |    datediff('day', d0, d) // 7 AS week_offset
        |  FROM ev JOIN first USING (user_id))
        |SELECT cohort_week, week_offset, count(*) AS n_users
        |FROM cells
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q155_zorder" ->
      """WITH c AS (
        |  SELECT c_custkey,
        |    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM customer),
        |b AS (
        |  SELECT min(c_custkey) AS a0, max(c_custkey) AS a1,
        |         min(cents) AS b0, max(cents) AS b1
        |  FROM c),
        |g AS (
        |  SELECT c_custkey,
        |    CASE WHEN a1 = a0 THEN 0
        |      ELSE ((c_custkey - a0) * 65535) // (a1 - a0) END AS gx,
        |    CASE WHEN b1 = b0 THEN 0
        |      ELSE ((cents - b0) * 65535) // (b1 - b0) END AS gy
        |  FROM c CROSS JOIN b),
        |s1 AS (SELECT c_custkey, (gx | (gx << 8)) & 16711935 AS x1,
        |              (gy | (gy << 8)) & 16711935 AS y1 FROM g),
        |s2 AS (SELECT c_custkey, (x1 | (x1 << 4)) & 252645135 AS x2,
        |              (y1 | (y1 << 4)) & 252645135 AS y2 FROM s1),
        |s3 AS (SELECT c_custkey, (x2 | (x2 << 2)) & 858993459 AS x3,
        |              (y2 | (y2 << 2)) & 858993459 AS y3 FROM s2),
        |s4 AS (SELECT c_custkey, (x3 | (x3 << 1)) & 1431655765 AS x4,
        |              (y3 | (y3 << 1)) & 1431655765 AS y4 FROM s3)
        |SELECT c_custkey, (x4 | (y4 << 1)) AS zval
        |FROM s4 ORDER BY zval, c_custkey LIMIT 200""".stripMargin,
    "q126_quarantine" ->
      """SELECT doc_id, lang, n_chars,
        |  concat_ws(';',
        |    CASE WHEN text IS NULL THEN 'not_null:text' END,
        |    CASE WHEN lang IS NOT NULL AND lang NOT IN ('en','zh','es')
        |      THEN 'accepted_values:lang' END,
        |    CASE WHEN NOT coalesce(n_chars >= 100, FALSE)
        |      THEN 'expression:min_len' END) AS violations
        |FROM documents
        |WHERE text IS NULL
        |   OR (lang IS NOT NULL AND lang NOT IN ('en','zh','es'))
        |   OR NOT coalesce(n_chars >= 100, FALSE)
        |ORDER BY doc_id""".stripMargin,
    "q118_rolling_wau" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |spine AS (SELECT DISTINCT d AS day FROM days),
        |contrib AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(d, d + INTERVAL 6 DAY,
        |      INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM days)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  count(DISTINCT user_id) AS wau
        |FROM contrib JOIN spine USING (day)
        |GROUP BY day ORDER BY day""".stripMargin,
    "q123_mv_join_hit" ->
      """SELECT d.status, count(*) AS n_rows,
        |  CAST(floor(sum(l.l_quantity) + 0.5) AS BIGINT) AS sum_qty,
        |  CAST(floor(avg(l.l_quantity) * 10000.0 + 0.5) AS BIGINT)
        |    AS avg_qty_e4
        |FROM lineitem l
        |JOIN (VALUES ('A', 'archived'), ('N', 'open'), ('R', 'returned'))
        |  AS d(l_returnflag, status)
        |  ON l.l_returnflag = d.l_returnflag
        |GROUP BY d.status
        |ORDER BY d.status""".stripMargin,
    "q117_mv_hit" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(floor(sum(l_quantity) + 0.5) AS BIGINT) AS sum_qty,
        |  CAST(floor(avg(l_quantity) * 10000.0 + 0.5) AS BIGINT)
        |    AS avg_qty_e4
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q116_zone_range" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(floor(o_totalprice * 100.0 + 0.5)) AS BIGINT)
        |    AS total_cents
        |FROM orders
        |WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1996-03-01'
        |  AND DATE '1996-03-31'
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q114_percent_of_total" ->
      """WITH rev AS (
        |  SELECT n_name,
        |    CAST(sum(floor(l_extendedprice * 100.0 + 0.5)) AS BIGINT)
        |      AS rev_cents
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, rev_cents,
        |  CAST((rev_cents * 1000000) // sum(rev_cents) OVER () AS BIGINT)
        |    AS share_e6,
        |  CAST(row_number() OVER (ORDER BY rev_cents DESC, n_name) AS INT)
        |    AS rnk
        |FROM rev ORDER BY rnk""".stripMargin,
    "q115_year_over_year" ->
      """WITH yearly AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS y,
        |    count(*) AS n_orders,
        |    CAST(sum(floor(o_totalprice * 100.0 + 0.5)) AS BIGINT)
        |      AS rev_cents
        |  FROM orders GROUP BY 1)
        |SELECT y, n_orders, rev_cents,
        |  rev_cents - lag(rev_cents) OVER (ORDER BY y) AS delta_cents,
        |  CAST(((rev_cents - lag(rev_cents) OVER (ORDER BY y)) * 10000)
        |    // lag(rev_cents) OVER (ORDER BY y) AS BIGINT) AS growth_e4
        |FROM yearly ORDER BY y""".stripMargin,
    "q111_inter_event_times" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    epoch_us(CAST(ts AS TIMESTAMP))
        |      - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
        |          PARTITION BY user_id
        |          ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
        |      AS gap_us
        |  FROM events)
        |SELECT event_type, (length(bin(gap_us)) - 1) // 2 AS band,
        |  count(*) AS n, min(gap_us) AS min_gap_us,
        |  max(gap_us) AS max_gap_us
        |FROM seq WHERE gap_us IS NOT NULL
        |GROUP BY event_type, band
        |ORDER BY event_type, band""".stripMargin,
    "q112_cooccurrence" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS a, b.event_type AS b,
        |  count(*) AS n_users
        |FROM ut a JOIN ut b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,
    "q110_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT source,
        |    unnest(string_split(
        |      trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
        |      AS tok
        |  FROM documents),
        |t2 AS (SELECT * FROM toks WHERE tok <> ''),
        |vocab AS (
        |  SELECT tok, 1 AS __v FROM (
        |    SELECT tok, count(*) AS cnt FROM t2 GROUP BY tok
        |    ORDER BY cnt DESC, tok LIMIT 100)),
        |joined AS (
        |  SELECT t2.source, v.__v FROM t2 LEFT JOIN vocab v USING (tok))
        |SELECT source, count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN __v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  CAST((sum(CASE WHEN __v IS NULL THEN 1 ELSE 0 END) * 1000000)
        |    // count(*) AS BIGINT) AS oov_e6
        |FROM joined GROUP BY source ORDER BY source""".stripMargin,
    "q109_mad" ->
      """WITH cents AS (
        |  SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM lineitem),
        |med AS (
        |  SELECT l_returnflag,
        |    CAST(round(quantile_cont(c, 0.5) * 2) AS BIGINT) AS m2,
        |    count(*) AS n
        |  FROM cents GROUP BY 1),
        |dev AS (
        |  SELECT cents.l_returnflag, abs(2 * c - m2) AS d2
        |  FROM cents JOIN med USING (l_returnflag)),
        |mad AS (
        |  SELECT l_returnflag, quantile_cont(d2, 0.5) AS mad2
        |  FROM dev GROUP BY 1)
        |SELECT med.l_returnflag, n,
        |  CAST(floor(CAST(m2 AS DOUBLE) / 2 * 10 + 0.5) AS BIGINT)
        |    AS median_e1,
        |  CAST(floor(mad2 * 5 + 0.5) AS BIGINT) AS mad_e1
        |FROM med JOIN mad USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin,
    "q106_bloom_lookup" ->
      """SELECT doc_id, lang, source, n_chars
        |FROM documents
        |WHERE doc_id IN (1, 7, 23, 42, 999999)
        |ORDER BY doc_id""".stripMargin,
    "q107_winsorize" ->
      """WITH cents AS (
        |  SELECT l_returnflag,
        |    CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM lineitem),
        |b AS (
        |  SELECT CAST(ceil(quantile_cont(c, 0.01)) AS BIGINT) AS lo,
        |    CAST(floor(quantile_cont(c, 0.99)) AS BIGINT) AS hi
        |  FROM cents)
        |SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clamped_low,
        |  CAST(sum(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clamped_high,
        |  CAST(sum(LEAST(GREATEST(c, lo), hi)) AS BIGINT) AS sum_w_cents,
        |  min(LEAST(GREATEST(c, lo), hi)) AS min_w_cents,
        |  max(LEAST(GREATEST(c, lo), hi)) AS max_w_cents
        |FROM cents CROSS JOIN b
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q102_regression" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS sx,
        |    sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS sy,
        |    sum(CAST(floor(l_quantity + 0.5) AS BIGINT)
        |      * CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS sxy,
        |    sum(CAST(floor(l_quantity + 0.5) AS BIGINT)
        |      * CAST(floor(l_quantity + 0.5) AS BIGINT)) AS sxx
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(floor(
        |    ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 1000000.0 + 0.5)
        |    AS BIGINT) AS slope_e6,
        |  CAST(floor(
        |    ((CAST(sy AS DOUBLE)
        |      - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
        |        * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
        |    AS BIGINT) AS intercept_e6
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q103_entropy" ->
      """WITH counts AS (
        |  SELECT source, lang, count(*) AS cnt
        |  FROM documents GROUP BY source, lang),
        |dist AS (
        |  SELECT source, cnt,
        |    sum(cnt) OVER (PARTITION BY source) AS total
        |  FROM counts),
        |terms AS (
        |  SELECT source, total,
        |    CAST(floor(-(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
        |      * ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
        |      * 1000000.0 + 0.5) AS BIGINT) AS term_e6
        |  FROM dist)
        |SELECT source, CAST(max(total) AS BIGINT) AS n_docs,
        |  count(*) AS n_langs, CAST(sum(term_e6) AS BIGINT) AS entropy_e6
        |FROM terms GROUP BY source ORDER BY source""".stripMargin,
    "q104_k_anonymity" ->
      """SELECT c_mktsegment, c_nationkey,
        |  CAST(floor(c_acctbal / 2000.0) AS BIGINT) AS bal_bucket,
        |  count(*) AS class_size
        |FROM customer
        |GROUP BY c_mktsegment, c_nationkey, floor(c_acctbal / 2000.0)
        |HAVING count(*) < 5
        |ORDER BY c_mktsegment, c_nationkey, bal_bucket""".stripMargin,
    "q105_debounce" ->
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS prev_type
        |  FROM events)
        |SELECT user_id, count(*) AS n_kept,
        |  min(event_id) AS first_event, max(event_id) AS last_event
        |FROM seq
        |WHERE prev_type IS NULL OR prev_type <> event_type
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q94_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS to_type
        |  FROM events)
        |SELECT from_type, to_type,
        |  count(*) AS n_transitions,
        |  count(DISTINCT user_id) AS n_users
        |FROM seq WHERE to_type IS NOT NULL
        |GROUP BY from_type, to_type
        |ORDER BY from_type, to_type""".stripMargin,
    "q95_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
        |num AS (
        |  SELECT user_id, d,
        |    date_diff('day', DATE '1995-01-01', d)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
        |  FROM days),
        |st AS (SELECT user_id, island, count(*) AS len FROM num GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_streaks, max(len) AS max_streak,
        |  CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q96_interval_coverage" ->
      """WITH spans AS (
        |  SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS start_us,
        |    epoch_us(CAST(ts AS TIMESTAMP))
        |      + CAST(floor(abs(value) * 60000000.0 + 0.5) + 1.0 AS BIGINT)
        |      AS end_us
        |  FROM events),
        |flagged AS (
        |  SELECT *,
        |    CASE WHEN max(end_us) OVER (PARTITION BY user_id
        |        ORDER BY start_us, end_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR start_us > max(end_us) OVER (PARTITION BY user_id
        |        ORDER BY start_us, end_us, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS new_island
        |  FROM spans),
        |islanded AS (
        |  SELECT *, CAST(sum(new_island) OVER (PARTITION BY user_id
        |    ORDER BY start_us, end_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        |  FROM flagged),
        |isl AS (
        |  SELECT user_id, island, count(*) AS n_spans,
        |    min(start_us) AS s0, max(end_us) AS e1
        |  FROM islanded GROUP BY user_id, island)
        |SELECT user_id, CAST(sum(n_spans) AS BIGINT) AS n_intervals,
        |  count(*) AS n_islands, CAST(sum(e1 - s0) AS BIGINT) AS covered_us
        |FROM isl GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q97_schema_union" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS total_cents,
        |    'v1' AS src
        |  FROM orders WHERE o_orderstatus = 'F'
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, o_orderpriority, 'v2' AS src
        |  FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY o_orderkey, src""".stripMargin,
    "q98_mode_per_group" ->
      """WITH counts AS (
        |  SELECT p_type, p_brand, count(*) AS n
        |  FROM part GROUP BY p_type, p_brand),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY p_type
        |    ORDER BY n DESC, p_brand) AS rn
        |  FROM counts)
        |SELECT p_type, p_brand AS mode_brand, n AS n_parts
        |FROM ranked WHERE rn = 1 ORDER BY p_type""".stripMargin,
    "q99_equidepth_hist" ->
      """WITH cents AS (
        |  SELECT CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c
        |  FROM lineitem),
        |b AS (
        |  SELECT quantile_cont(c,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
        |  FROM cents)
        |SELECT bucket, count(*) AS n, min(c) AS min_cents, max(c) AS max_cents
        |FROM (
        |  SELECT c, CAST(1 + length(list_filter(bs,
        |    x -> x < CAST(c AS DOUBLE))) AS BIGINT) AS bucket
        |  FROM cents CROSS JOIN b)
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q100_gap_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS d,
        |    CAST(sum(floor(value * 100.0 + 0.5)) AS BIGINT) AS day_cents
        |  FROM events WHERE user_id < 50 GROUP BY 1, 2),
        |spans AS (SELECT user_id, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1),
        |spine AS (
        |  SELECT user_id,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM spans),
        |filled AS (
        |  SELECT s.user_id, s.d, daily.day_cents
        |  FROM spine s LEFT JOIN daily
        |    ON s.user_id = daily.user_id AND s.d = daily.d)
        |SELECT user_id, strftime(d, '%Y-%m-%d') AS d, day_cents,
        |  last_value(day_cents IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY d ROWS UNBOUNDED PRECEDING) AS carried,
        |  day_cents IS NOT NULL AS is_active
        |FROM filled ORDER BY user_id, d""".stripMargin,
    "q101_reservoir_sample" ->
      """WITH hashed AS (
        |  SELECT user_id, event_id, event_type,
        |    md5(CAST(user_id AS VARCHAR) || ':' || CAST(event_id AS VARCHAR))
        |      AS h
        |  FROM events),
        |ranked AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY h, event_id)
        |      AS INT) AS rank
        |  FROM hashed)
        |SELECT user_id, rank, event_id, event_type
        |FROM ranked WHERE rank <= 3
        |ORDER BY user_id, rank""".stripMargin
  )
}
