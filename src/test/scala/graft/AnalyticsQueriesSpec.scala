package graft

import org.apache.spark.sql.functions._

import graft.queries.AnalyticsQueries

/** Semantic invariants for the q94–q101 analytics batch, beyond the
  * driver's DuckDB hash gate: each query's defining algebraic property
  * is asserted on sf0.001 so a future refactor that keeps the plan
  * running but breaks the semantics fails here first.
  */
class AnalyticsQueriesSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("q94: per-user transitions sum to (events - users)") {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val total = events.count()
    val users = events.select($"user_id").distinct().count()
    val transitions = AnalyticsQueries.q94Transitions(spark, dir)
      .agg(sum($"n_transitions")).head().getLong(0)
    // each user's n-event chain contributes exactly n-1 bigrams
    assert(transitions == total - users)
  }

  test("q95: streak lengths partition the active days") {
    val df = AnalyticsQueries.q95Streaks(spark, dir)
    assert(df.where($"max_streak" < 1 || $"max_streak" > $"n_active_days")
      .count() == 0)
    // sum over users of active days = number of distinct (user, day) pairs
    // (Tables.load converts the nanos-long ts; a raw parquet read would not)
    val distinctDays = graft.sources.Tables.load(spark, dir, "events")
      .select($"user_id", to_date($"ts")).distinct().count()
    assert(df.agg(sum($"n_active_days")).head().getLong(0) == distinctDays)
  }

  test("q96: merged islands never exceed their intervals; coverage positive") {
    val df = AnalyticsQueries.q96IntervalCoverage(spark, dir)
    assert(df.where($"n_islands" > $"n_intervals" || $"covered_us" <= 0)
      .count() == 0)
  }

  test("q97: schema union keeps every order exactly once, null-filled") {
    val df = AnalyticsQueries.q97SchemaUnion(spark, dir)
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val expected = orders
      .where($"o_orderstatus".isin("F", "O")).count()
    assert(df.count() == expected)
    // v2 rows carry no total_cents; v1 rows carry no priority
    assert(df.where($"src" === "v2" && $"total_cents".isNotNull).count() == 0)
    assert(df.where($"src" === "v1" && $"o_orderpriority".isNotNull)
      .count() == 0)
  }

  test("q98: mode count is the max count within each group") {
    val modes = AnalyticsQueries.q98ModePerGroup(spark, dir)
    val maxes = spark.read.parquet(s"$dir/part.parquet")
      .groupBy($"p_type", $"p_brand").agg(count(lit(1)).as("n"))
      .groupBy($"p_type").agg(max($"n").as("max_n"))
    val bad = modes.join(maxes, "p_type")
      .where($"n_parts" =!= $"max_n").count()
    assert(bad == 0)
  }

  test("q99: decile counts cover all rows and are balanced within 10%") {
    val df = AnalyticsQueries.q99EquidepthHist(spark, dir).collect()
    val total = df.map(_.getAs[Long]("n")).sum
    val li = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(total == li)
    assert(df.length == 10)
    // equi-depth: every bucket within 10% of the ideal tenth (duplicate
    // boundary values can skew counts slightly; sf0.001 cents are ~unique)
    val ideal = li / 10.0
    assert(df.forall(r => math.abs(r.getAs[Long]("n") - ideal) < ideal * 0.1))
    // buckets tile the value range in order
    val sorted = df.sortBy(_.getAs[Long]("bucket"))
    sorted.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_cents") <= b.getAs[Long]("min_cents"))
    }
  }

  test("q100: spine has no day gaps and carry-forward is never null after " +
    "first activity") {
    val df = AnalyticsQueries.q100GapFill(spark, dir)
    // first row of every user is active by construction (spine starts at
    // min active day), so carried is non-null everywhere
    assert(df.where($"carried".isNull).count() == 0)
    // per user: spine length == datediff(max, min) + 1 (no gaps)
    val spineLen = df.groupBy($"user_id").agg(count(lit(1)).as("n"),
      min($"d").as("d0"), max($"d").as("d1"))
    assert(spineLen.where($"n" =!=
      datediff($"d1".cast("date"), $"d0".cast("date")) + 1).count() == 0)
  }

  test("q102: moments cover every row; line passes through the centroid") {
    val df = AnalyticsQueries.q102Regression(spark, dir)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    assert(df.agg(sum($"n")).head().getLong(0) == li.count())
    // OLS invariant: intercept + slope·x̄ = ȳ for every group
    val centroids = li
      .select($"l_returnflag", floor($"l_quantity" + 0.5).as("x"),
        floor($"l_extendedprice" * 100.0 + 0.5).as("y"))
      .groupBy($"l_returnflag").agg(avg($"x").as("mx"), avg($"y").as("my"))
    df.join(centroids, "l_returnflag").collect().foreach { r =>
      val yHat = (r.getAs[Long]("intercept_e6") +
        r.getAs[Long]("slope_e6") * r.getAs[Double]("mx")) / 1e6
      val my = r.getAs[Double]("my")
      assert(math.abs(yHat - my) <= math.abs(my) * 1e-4 + 0.01,
        s"${r.getAs[String]("l_returnflag")}: $yHat vs $my")
    }
  }

  test("q103: entropy bounded by ln(n_langs), zero only for single-lang") {
    val rows = AnalyticsQueries.q103Entropy(spark, dir).collect()
    rows.foreach { r =>
      val e6 = r.getAs[Long]("entropy_e6")
      val langs = r.getAs[Long]("n_langs")
      val bound = math.ceil(math.log(langs.toDouble) * 1e6).toLong + langs
      assert(e6 >= 0 && e6 <= bound, s"entropy $e6 outside [0, $bound]")
      if (langs == 1) assert(e6 == 0)
    }
  }

  test("q104: every reported class is a genuine <k group") {
    val df = AnalyticsQueries.q104KAnonymity(spark, dir)
    assert(df.where($"class_size" >= 5 || $"class_size" < 1).count() == 0)
  }

  test("q105: debounce keeps at least one and at most all events per user") {
    val df = AnalyticsQueries.q105Debounce(spark, dir)
    val perUser = graft.sources.Tables.load(spark, dir, "events")
      .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
    assert(df.join(perUser, "user_id")
      .where($"n_kept" < 1 || $"n_kept" > $"n_events").count() == 0)
  }

  test("q106: every present probe returns exactly one doc; absent returns " +
    "none") {
    val rows = AnalyticsQueries.q106BloomLookup(spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq.sorted == Seq(1L, 7L, 23L, 42L))
  }

  test("q107: clamped bounds hold and clamp counts stay near 1% tails") {
    val rows = AnalyticsQueries.q107Winsorize(spark, dir).collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    val low = rows.map(_.getAs[Long]("n_clamped_low")).sum
    val high = rows.map(_.getAs[Long]("n_clamped_high")).sum
    // global 1% tails: each side clamps ≤ ~1% of all rows (+slack)
    assert(low <= n / 50 && high <= n / 50, s"low=$low high=$high n=$n")
    rows.foreach { r =>
      assert(r.getAs[Long]("min_w_cents") <= r.getAs[Long]("max_w_cents"))
    }
  }

  test("q109: MAD is non-negative and bounded by half the group range") {
    val rows = AnalyticsQueries.q109Mad(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mad = r.getAs[Long]("mad_e1")
      val med = r.getAs[Long]("median_e1")
      assert(mad >= 0 && med > 0)
      // MAD can never exceed the median distance to the farthest point;
      // with positive prices that is < median + max/2 — loose sanity only
      assert(mad < med * 100, s"mad $mad implausibly large vs median $med")
    }
  }

  test("q110: oov rates are true integer-div rates within [0, 1e6]") {
    val rows = AnalyticsQueries.q110VocabCoverage(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, oov, e6) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
        r.getAs[Long]("oov_e6"))
      assert(oov >= 0 && oov <= n)
      assert(e6 == oov * 1000000L / n)
    }
  }

  test("q111: bands tile [4^k, 4^(k+1)) and gaps cover (events - users)") {
    val rows = AnalyticsQueries.q111InterEventTimes(spark, dir).collect()
    rows.foreach { r =>
      val band = r.getAs[Long]("band")
      val lo = r.getAs[Long]("min_gap_us")
      val hi = r.getAs[Long]("max_gap_us")
      val bandLo = if (band == 0) 0L else math.pow(4, band.toDouble).toLong
      val bandHi = math.pow(4, band.toDouble + 1).toLong
      assert(lo >= bandLo && hi < bandHi && lo <= hi,
        s"band $band: [$lo,$hi] outside [$bandLo,$bandHi)")
    }
    val events = graft.sources.Tables.load(spark, dir, "events")
    val expected = events.count() -
      events.select($"user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
  }

  test("q112: pair support never exceeds either type's user count") {
    val ut = graft.sources.Tables.load(spark, dir, "events")
      .select($"user_id", $"event_type").distinct()
      .groupBy($"event_type").agg(countDistinct($"user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    AnalyticsQueries.q112Cooccurrence(spark, dir).collect().foreach { r =>
      val (a, b, n) = (r.getString(0), r.getString(1),
        r.getAs[Long]("n_users"))
      assert(a < b && n >= 1 && n <= math.min(ut(a), ut(b)))
    }
  }

  test("q114: shares are true integer-div fractions summing below 1e6") {
    val rows = AnalyticsQueries.q114PercentOfTotal(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("rev_cents")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("share_e6") ==
        r.getAs[Long]("rev_cents") * 1000000L / total)
    }
    // floor rounding: share sum within |rows| of exactly 1e6
    val shareSum = rows.map(_.getAs[Long]("share_e6")).sum
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length)
    assert(rows.map(_.getAs[Int]("rnk")).sorted.toSeq == (1 to rows.length))
  }

  test("q115: deltas telescope back to the yearly series") {
    val rows = AnalyticsQueries.q115YearOverYear(spark, dir).collect()
      .sortBy(_.getAs[Long]("y"))
    assert(rows.head.isNullAt(rows.head.fieldIndex("delta_cents")))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getAs[Long]("delta_cents") ==
        b.getAs[Long]("rev_cents") - a.getAs[Long]("rev_cents"))
    }
  }

  test("q118: WAU dominates DAU and never exceeds the 7-day union") {
    val events = graft.sources.Tables.load(spark, dir, "events")
    val dau = events.select($"user_id", to_date($"ts").as("d")).distinct()
      .groupBy($"d").agg(countDistinct($"user_id").as("dau"))
      .withColumn("day", date_format($"d", "yyyy-MM-dd"))
    val rows = AnalyticsQueries.q118RollingWau(spark, dir)
      .join(dau, "day").collect()
    val total = events.select($"user_id").distinct().count()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (wau, d) = (r.getAs[Long]("wau"), r.getAs[Long]("dau"))
      assert(wau >= d && wau <= total, s"${r.getAs[String]("day")}: $wau")
    }
  }

  test("q101: exactly min(3, |events|) rows per user, stable across runs") {
    val a = AnalyticsQueries.q101ReservoirSample(spark, dir)
    val perUser = a.groupBy($"user_id").agg(count(lit(1)).as("n"))
    assert(perUser.where($"n" > 3).count() == 0)
    val b = AnalyticsQueries.q101ReservoirSample(spark, dir)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
