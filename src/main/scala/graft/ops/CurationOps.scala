package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines beyond
  * cleaning/dedup: repetition-based quality gates, domain mixture
  * sampling, and reproducible epoch shuffles.
  *
  * Everything is deterministic and engine-portable (md5-keyed randomness,
  * integer counts) so each operator can be gated against a SQL oracle —
  * and every plan is one or two key-partitioned shuffles, no global
  * sort, no driver loops.
  */
object CurationOps {

  /** Gopher-style repetition metrics per document (Rae et al. 2021 §A1.1,
    * "repetition removal"): for word n-grams of size `n`, emit
    *  - `total_grams`    — all n-gram occurrences (n_tokens - n + 1),
    *  - `distinct_grams` — unique n-grams,
    *  - `top_gram_count` — occurrences of the most frequent n-gram,
    *  - `dup_gram_frac`  — 1 - distinct/total (0 when total = 0),
    *  - `top_gram_frac`  — top/total.
    * Docs with high duplicate-gram fractions are boilerplate/spam; the
    * published Gopher gates drop e.g. dup 2-gram frac > 0.2.
    *
    * Shape at 100 TB: one explode of the non-distinct gram multiset, a
    * (doc, gram) count with map-side partial aggregation, then a per-doc
    * roll-up — two shuffles keyed on the document id, no self-joins. The
    * fractions are derived from exact integer counts, so the oracle
    * comparison is exact (`*_frac` stays engine-side only). */
  def repetitionMetrics(df: DataFrame, textCol: String, idCol: String,
                        n: Int): DataFrame = {
    val perGram = df
      .select(col(idCol), explode(TextOps.shinglesAll(col(textCol), n)).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
    perGram.groupBy(col(idCol))
      .agg(sum(col("c")).as("total_grams"),
        count(lit(1)).as("distinct_grams"),
        max(col("c")).as("top_gram_count"))
      .withColumn("dup_gram_frac",
        when(col("total_grams") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("distinct_grams").cast("double")
            / col("total_grams")))
      .withColumn("top_gram_frac",
        when(col("total_grams") === 0, lit(0.0))
          .otherwise(col("top_gram_count").cast("double") / col("total_grams")))
  }

  /** Uniform-in-[0,1) driven by the first 8 hex chars of
    * `md5(seed:id)` — deterministic, reproducible, and engine-portable
    * (md5 is bit-identical everywhere; the comparison happens in
    * fixed-width hex-string space so no engine-specific hex→int cast is
    * needed). Rows keep when their hex key sorts below the threshold. */
  private def md5Keep(idCol: Column, seed: String, rate: Column): Column = {
    val key = substring(md5(concat_ws(":", lit(seed), idCol.cast("string"))), 1, 8)
    // floor(rate * 2^32) in 8-digit zero-padded lowercase hex. rate >= 1
    // must short-circuit: its threshold needs 9 hex digits, which lpad
    // would TRUNCATE to a ~1/16 keep-rate instead of keep-all.
    val threshold = lpad(lower(hex(floor(rate * 4294967296.0).cast("long"))), 8, "0")
    rate >= 1.0 || key < threshold
  }

  /** Deterministic Bernoulli sample at `rate`, keyed on `md5(seed:id)` —
    * the engine-portable sampling primitive behind [[temperatureSample]],
    * exposed for approximate query processing: the kept set is a pure
    * function of (seed, id), so it is identical on every engine,
    * partitioning, and run — a sampled ESTIMATE can be hash-compared
    * against an oracle, not just bounded. Sampling is a filter in the
    * scan projection: no shuffle, no state, trivially 100 TB-safe. */
  def seededSample(df: DataFrame, idCol: String, rate: Double,
                   seed: String = "sample"): DataFrame =
    df.filter(md5Keep(col(idCol), seed, lit(rate)))

  /** Cumulative-rate split boundaries in the same 8-hex-digit key space as
    * [[seededSample]]: boundary i = `floor(cum_i · 2³²)` zero-padded hex.
    * Public so oracles/tests can embed the identical literals. */
  def splitThresholdsHex(splits: Seq[(String, Double)]): Seq[String] = {
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    cums.init.map(c => f"${math.floor(c * 4294967296.0).toLong}%08x")
  }

  /** Deterministic named-split assignment (train/val/test) keyed on
    * `md5(seed:id)` — the standard reproducible corpus split. Every row
    * lands in exactly one split, the assignment is a pure function of
    * (seed, id) — stable across runs, engines, partitionings, and corpus
    * growth (a doc's split never changes when other docs are added).
    * Pure scan-projection arithmetic: no shuffle, no state, 100 TB-safe.
    *
    * @param splits ordered (name, fraction) pairs; fractions must sum to 1.
    *               The last split absorbs the final key range exactly.
    */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)],
                seed: String = "split",
                splitCol: String = "split"): DataFrame = {
    require(splits.size >= 2, "need at least two splits")
    require(splits.forall(_._2 > 0.0), "split fractions must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val key = substring(md5(concat_ws(":", lit(seed), col(idCol).cast("string"))), 1, 8)
    val thresholds = splitThresholdsHex(splits)
    val first = when(key < lit(thresholds.head), lit(splits.head._1))
    val chained = splits.tail.init.zip(thresholds.tail).foldLeft(first) {
      case (acc, ((name, _), t)) => acc.when(key < lit(t), lit(name))
    }
    df.withColumn(splitCol, chained.otherwise(lit(splits.last._1)))
  }

  /** Exact inverse inclusion probability of [[seededSample]]'s md5
    * threshold (the Horvitz-Thompson expansion factor): the keep test is
    * `key < floor(rate·2³²)/2³²`, so the unbiased scale-up is
    * 2³²/floor(rate·2³²), not 1/rate. */
  def inverseRate(rate: Double): Double =
    4294967296.0 / math.floor(rate * 4294967296.0)

  /** Temperature-based domain mixture sampling (the multinomial
    * `p_d^alpha` re-weighting used to balance source domains when
    * assembling a training mix; alpha < 1 up-samples small domains,
    * alpha = 1 is proportional). Keeps each row of domain d with rate
    * `min(1, targetN * w_d / (sum_w * n_d))` where `w_d = n_d^alpha`, so
    * the expected kept-total is ~`targetFraction * N` with the domain
    * shares tempered.
    *
    * Shape at 100 TB: the per-domain histogram is a tiny aggregate
    * (|domains| rows) that broadcast-joins back onto the corpus — the
    * corpus itself never shuffles; sampling is a deterministic md5 filter
    * in the scan projection.
    *
    * NB for oracle parity use alpha = 0.5: the rate arithmetic is then
    * sqrt/mul/div only — IEEE-exact and bit-identical across engines —
    * whereas pow() may differ by 1 ulp between libm implementations. */
  def temperatureSample(df: DataFrame, domainCol: String, idCol: String,
                        alpha: Double, targetFraction: Double,
                        seed: String = "mix"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = if (alpha == 0.5) sqrt(col("n_d").cast("double"))
            else pow(col("n_d").cast("double"), lit(alpha))
    // totals via an unpartitioned window over the |domains|-row histogram:
    // one evaluation of the histogram subtree (an agg + crossJoin scans
    // the corpus twice — the plan gate caught exactly that), and a
    // single-partition window over a bounded-cardinality table is free
    val all = Window.partitionBy()
    val rates = df.groupBy(col(domainCol)).agg(count(lit(1)).as("n_d"))
      .withColumn("w_d", w)
      .withColumn("keep_rate", least(lit(1.0),
        lit(targetFraction) * sum(col("n_d")).over(all).cast("double")
          * col("w_d") / (sum(col("w_d")).over(all) * col("n_d").cast("double"))))
      .select(col(domainCol), col("keep_rate"))
    df.join(broadcast(rates), Seq(domainCol))
      .filter(md5Keep(col(idCol), seed, col("keep_rate")))
  }

  /** Token-budget mixture assembly: build a training mix to per-source
    * TOKEN budgets ("500B tokens: 30% code, 70% web") rather than row
    * counts — the [[temperatureSample]] twin where the target is weight
    * mass. Each source's rows keep with rate `min(1, budget_d / T_d)`
    * where `T_d = sum(weightCol)` over the source, so the expected kept
    * mass is `min(budget_d, T_d)` — under-budget sources are taken
    * whole; sources without a budget are excluded (the mix is the
    * explicit contract). Selection is the deterministic `md5(seed:id)`
    * Bernoulli filter: reproducible, engine-portable, and the kept
    * total concentrates on the budget (relative deviation
    * O(1/√docs)).
    *
    * Shape at 100 TB: per-source totals are a |sources|-row aggregate
    * broadcast back; sampling is a filter in the scan projection — the
    * corpus never shuffles. An exact prefix-sum cut would need a
    * per-source total-order sort (one straggler task per source at fact
    * scale) to improve the boundary by less than one document of mass.
    */
  def budgetMix(df: DataFrame, sourceCol: String, idCol: String,
                weightCol: String, budgets: Map[String, Long],
                seed: String = "budget"): DataFrame = {
    require(budgets.nonEmpty, "need at least one source budget")
    require(budgets.values.forall(_ > 0), "budgets must be positive")
    val rates = df.groupBy(col(sourceCol))
      .agg(sum(col(weightCol)).as("__t_d"))
      .withColumn("__budget", element_at(typedLit(budgets), col(sourceCol)))
      .where(col("__budget").isNotNull && col("__t_d") > 0)
      .withColumn("__keep_rate", least(lit(1.0),
        col("__budget").cast("double") / col("__t_d").cast("double")))
      .select(col(sourceCol), col("__keep_rate"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(md5Keep(col(idCol), seed, col("__keep_rate")))
      .drop("__keep_rate")
  }

  /** Weighted sampling WITHOUT replacement, k per stratum (Efraimidis &
    * Spirakis 2006 "A-ES"): each row draws key `ln(u)/w` from its own
    * deterministic uniform `u` and the k largest keys per stratum win —
    * exactly the distribution of sequential weighted draws without
    * replacement. The curation use: "give me 10k docs per source, picked
    * proportionally to quality/length" — [[seededSample]] can't weight
    * rows, [[temperatureSample]] weights domains not rows, and a true
    * sequential draw is inherently serial; A-ES turns it into an
    * embarrassingly-parallel per-row key + top-k.
    *
    * Determinism/portability: `u = (v + 0.5) / 2⁶⁰` where v is the first
    * 15 md5 hex digits of `seed:id` — v and the division are IEEE-exact
    * in both engines, the +0.5 bounds u away from ln(0), and distinct
    * ids give distinct v (id tiebreak covers the 2⁻⁶⁰ residual). ln()
    * is the one transcendental; a cross-engine 1-ulp wobble could flip
    * an order only between keys within ~1e-16 relative — vanishing for
    * continuous keys (and validated by the q139 hash gate).
    *
    * Shape at 100 TB: key is scan-projection arithmetic; the per-stratum
    * `row_number() <= k` is exactly the pattern [[graft.plans.TopKRewrite]]
    * compiles to a bounded per-key heap — no full sort, no stratum
    * straggler. */
  def weightedSample(df: DataFrame, strataCol: String, idCol: String,
                     weightCol: String, k: Int,
                     seed: String = "wsample"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    val v = conv(substring(md5(concat_ws(":", lit(seed),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    val u = (v.cast("double") + lit(0.5)) / lit(1152921504606846976.0) // 2^60
    val key = log(u) / col(weightCol).cast("double")
    df.withColumn("__aes_key", key)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(strataCol))
          // id tiebreak shares the key's direction so every orderSpec leg
          // is DESC — the uniformity TopKRewrite needs to heap-compile
          // this (ties are 2⁻⁶⁰ anyway; the id leg just pins determinism)
          .orderBy(col("__aes_key").desc, col(idCol).desc)))
      .where(col("__rn") <= k)
      .drop("__aes_key", "__rn")
  }

  /** Contiguous, deterministic 0..n-1 ids in `orderCol` order WITHOUT a
    * global single-task sort — `row_number() OVER (ORDER BY ...)` is the
    * classic scale trap (one reducer sorts the corpus). Here: range
    * partition by the order key (sampled boundaries), sort within
    * partitions, then the two-phase `zipWithIndex` — one counting job
    * whose per-partition sizes become broadcast offsets, one map job that
    * enumerates locally (the second job reuses the first's shuffle files;
    * nothing is recomputed or persisted). `orderCol` must be unique —
    * with ties the order, and therefore the ids, would be
    * partition-placement-dependent. */
  def assignStableIds(df: DataFrame, orderCol: String,
                      idName: String = "stable_id",
                      partitions: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(partitions, col(orderCol))
      .sortWithinPartitions(col(orderCol))
    val withId = ranged.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(withId,
      ranged.schema.add(idName, org.apache.spark.sql.types.LongType,
        nullable = false))
  }

  /** Quality-filter funnel with per-stage drop attribution (the CCNet /
    * RefinedWeb report shape): each row is attributed to the FIRST stage
    * whose predicate it fails — or `kept` — and the result is one row per
    * stage with its drop count. Stages are evaluated in the given order
    * inside a single `CASE` projection, so the whole funnel is ONE corpus
    * scan and a |stages|-row aggregate; there is no per-stage pass and no
    * shuffle of the corpus itself. Stages that drop nothing still appear
    * (count 0) so the report schema is run-to-run stable.
    *
    * Null semantics are SQL's: a predicate evaluating to NULL does not
    * attribute the row to that stage (it cascades to the next, possibly
    * to `kept`) — write stages over nullable columns with an explicit
    * `isNotNull` arm if nulls should be drops. */
  def filterFunnel(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    val attributed = stages.foldRight(lit("kept")) { case ((name, pred), rest) =>
      when(!pred, lit(name)).otherwise(rest)
    }
    val counts = df.select(attributed.as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("n_rows"))
    val all = df.sparkSession.createDataFrame(
      (stages.map(_._1) :+ "kept").map(Tuple1(_))).toDF("stage")
    // counts is a |stages|+1-row aggregate — broadcast it (the right/build
    // side of the left join) rather than letting size estimation guess
    all.join(broadcast(counts), Seq("stage"), "left")
      .select(col("stage"), coalesce(col("n_rows"), lit(0L)).as("n_rows"))
  }

  /** Reproducible epoch shuffle: a deterministic pseudo-random total
    * order keyed by `md5(epoch:id)`, laid out as `numShards` balanced
    * hash shards each sorted by the shuffle key. Same epoch → identical
    * layout on every run (resumable training); next epoch → an
    * independent permutation. No global sort: shard assignment is a
    * hash pmod, ordering is sortWithinPartitions. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   numShards: Int): DataFrame = {
    val withKey = df.withColumn("shuffle_key",
      md5(concat_ws(":", lit(epoch.toString), col(idCol).cast("string"))))
    withKey
      .withColumn("shard",
        pmod(xxhash64(col("shuffle_key")), lit(numShards)).cast("int"))
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shuffle_key"))
  }
}
