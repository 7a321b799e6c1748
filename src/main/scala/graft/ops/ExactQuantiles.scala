package graft.ops

import graft.ops.Lineage.LineageSyntax
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact interpolated quantiles (percentile_cont semantics) of an
  * integer-valued column via distributed selection — the scale-safe
  * replacement for Catalyst's `Percentile` aggregate.
  *
  * `percentile(c, ps)` builds a value→count OpenHashMap per partition and
  * merges ALL of them on a single final reducer: with mostly-unique
  * values the merge is O(distinct) on one thread (measured 4–6 s over
  * 583k distinct cents at sf0.1 — and it only grows with data). This
  * operator never funnels the distribution through one point:
  *
  *  1. `groupBy(value)` → (value, count) summary (one partial-agg'd
  *     shuffle, the only full-data pass);
  *  2. range-repartition + local sort of the SUMMARY (distinct values,
  *     not rows) so partition i holds a contiguous value range;
  *  3. per-partition count totals → driver (P longs), prefix-summed to
  *     global offsets;
  *  4. one summary scan emits just the values whose cumulative-count
  *     span covers a needed rank (≤ 2·|probs| rows reach the driver);
  *  5. driver interpolates `(⌈h⌉−h)·lower + (h−⌊h⌋)·higher` at
  *     `h = (n−1)·p` — Catalyst `Percentile`'s exact weighted form
  *     (NOT the algebraically-equal `lo + (hi−lo)·frac`, which differs
  *     in the last ulp), so results are bit-identical to the builtin.
  *
  * The two RDD passes are the sanctioned use: genuine per-partition
  * cumulative state that no declarative operator expresses without a
  * global sort.
  */
object ExactQuantiles {

  /** Exact quantiles of `valueCol` (cast to long) at `probs`.
    * Returns one interpolated double per prob. Nulls in `valueCol` are
    * ignored, matching Catalyst `Percentile` (null-tolerant agg input). */
  def quantiles(df: DataFrame, valueCol: String, probs: Seq[Double],
                partitions: Int = 64): Array[Double] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    val spark = df.sparkSession
    import spark.implicits._
    val freq = df.select(col(valueCol).cast("long").as("v"))
      .where($"v".isNotNull)
      .groupBy($"v").agg(count(lit(1)).as("f"))
      .repartitionByRange(partitions, $"v")
      .sortWithinPartitions($"v")
      .as[(Long, Long)]
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val partTotals = freq.rdd
        .mapPartitions(it => Iterator.single(it.map(_._2).sum), true)
        .collect()
      val n = partTotals.sum
      if (n == 0) return probs.map(_ => Double.NaN).toArray
      val hs = probs.map(p => (n - 1) * p)
      val needed = hs.flatMap(h =>
        Seq(math.floor(h).toLong, math.ceil(h).toLong)).distinct.sorted
      val offsets = partTotals.scanLeft(0L)(_ + _)
      val bNeeded = spark.sparkContext.broadcast(needed.toArray)
      val found: Map[Long, Long] = freq.rdd.mapPartitionsWithIndex {
        (pid, it) =>
          var cum = offsets(pid)
          val want = bNeeded.value
          it.flatMap { case (v, f) =>
            val lo = cum
            cum += f
            want.iterator.filter(pos => pos >= lo && pos < lo + f)
              .map(pos => (pos, v))
          }
      }.collect().toMap
      hs.map { h =>
        val lo = math.floor(h)
        val hi = math.ceil(h)
        val lv = found(lo.toLong).toDouble
        val hv = found(hi.toLong).toDouble
        if (lo == hi) lv else (hi - h) * lv + (h - lo) * hv
      }.toArray
    } finally { freq.unpersist(); () }
  }

  /** Per-group exact quantiles — the grouped form of [[quantiles]], for
    * the FEW-groups × huge-values regime where Catalyst's per-group
    * `Percentile` maps are still distinct-sized and each group's merge
    * lands on one reducer. The value summary is range-partitioned on
    * (group, value) so a huge group spans partitions; the driver sees
    * per-(partition, group) subtotal longs and the rank-straddling
    * values — O(P·|groups|) scalars, never the distribution. Group keys
    * are compared as strings (cast internally); interpolation is the
    * same bit-exact Catalyst formula. Null values are ignored
    * (`Percentile` semantics); a null group KEY is a legitimate group.
    *
    * Driver state is O(partitions·|groups|), so the group count is
    * GUARDED at `maxGroups`: a high-cardinality group column here would
    * silently OOM the driver. Callers that don't know their group
    * cardinality should use [[quantilesByGroupAuto]] — the recommended
    * entry point — which counts groups first and routes the many-groups
    * regime to the driverless hashed path. */
  def quantilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
                       probs: Seq[Double], partitions: Int = 64,
                       maxGroups: Int = 4096)
      : Map[String, Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    rangeFromSummary(
      df.select(col(groupCol).cast("string").as("g"),
          col(valueCol).cast("long").as("v"))
        .where($"v".isNotNull)
        .groupBy($"g", $"v").agg(count(lit(1)).as("f")),
      probs, partitions, maxGroups)
  }

  /** The range-partitioned selection over a prebuilt `(g, v, f)`
    * summary — shared by [[quantilesByGroup]] and the auto path. */
  private def rangeFromSummary(summary: DataFrame, probs: Seq[Double],
                               partitions: Int,
                               maxGroups: Int = Int.MaxValue)
      : Map[String, Array[Double]] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    val spark = summary.sparkSession
    import spark.implicits._
    val freq = summary
      .repartitionByRange(partitions, $"g", $"v")
      .sortWithinPartitions($"g", $"v")
      .as[(String, Long, Long)]
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (maxGroups != Int.MaxValue) {
        // cheap over the persisted summary; fires BEFORE the O(P·groups)
        // subtotal collect below can OOM the driver
        val nGroups = freq.select($"g").distinct().count()
        require(nGroups <= maxGroups,
          s"quantilesByGroup holds O(partitions·groups) driver state: " +
            s"$nGroups groups exceeds maxGroups=$maxGroups. Use " +
            s"quantilesByGroupAuto (routes many-groups to the driverless " +
            s"hashed path) or raise maxGroups deliberately.")
      }
      val subtotals: Array[((Int, String), Long)] = freq.rdd
        .mapPartitionsWithIndex { (pid, it) =>
          val acc = scala.collection.mutable.LinkedHashMap[String, Long]()
          it.foreach { case (g, _, f) =>
            acc.update(g, acc.getOrElse(g, 0L) + f)
          }
          acc.iterator.map { case (g, t) => ((pid, g), t) }
        }.collect()
      val nByGroup = subtotals.groupBy(_._1._2)
        .map { case (g, ts) => g -> ts.map(_._2).sum }
      // rows of group g before partition pid
      val offsets: Map[(Int, String), Long] = subtotals
        .groupBy(_._1._2).flatMap { case (g, ts) =>
          val sorted = ts.sortBy(_._1._1)
          sorted.zip(sorted.scanLeft(0L)(_ + _._2))
            .map { case (((pid, _), _), off) => (pid, g) -> off }
        }
      val hsByGroup = nByGroup.map { case (g, n) =>
        g -> probs.map(p => (n - 1) * p).toArray
      }
      val neededByGroup: Map[String, Array[Long]] = hsByGroup.map {
        case (g, hs) => g -> hs.flatMap(h =>
          Seq(math.floor(h).toLong, math.ceil(h).toLong)).distinct.sorted
      }
      val bOffsets = spark.sparkContext.broadcast(offsets)
      val bNeeded = spark.sparkContext.broadcast(neededByGroup)
      val found: Map[(String, Long), Long] = freq.rdd
        .mapPartitionsWithIndex { (pid, it) =>
          val offs = bOffsets.value
          val need = bNeeded.value
          // `started` (not a null sentinel) marks the first row: a
          // legitimate null group key (null groupCol casts to null
          // string) must still load its partition offset.
          var started = false
          var curG: String = null
          var cum = 0L
          it.flatMap { case (g, v, f) =>
            if (!started || g != curG) {
              started = true; curG = g
              cum = offs.getOrElse((pid, g), 0L)
            }
            val lo = cum
            cum += f
            need.getOrElse(g, Array.empty[Long]).iterator
              .filter(pos => pos >= lo && pos < lo + f)
              .map(pos => ((g, pos), v))
          }
        }.collect().toMap
      hsByGroup.map { case (g, hs) =>
        g -> hs.map { h =>
          val lo = math.floor(h)
          val hi = math.ceil(h)
          val lv = found((g, lo.toLong)).toDouble
          val hv = found((g, hi.toLong)).toDouble
          if (lo == hi) lv else (hi - h) * lv + (h - lo) * hv
        }
      }
    } finally { freq.unpersist(); () }
  }

  /** Per-group exact quantiles via ITERATIVE HISTOGRAM NARROWING — the
    * fastest few-groups path, and the one with the smallest shuffle at
    * scale. Each round is a single whole-stage-codegen aggregate pass:
    *
    *  1. broadcast the per-(group, rank) active value span `[lo, hi]`
    *     (a handful of rows) and equi-join it to the data on group;
    *  2. histogram the in-span values into `buckets` equal-width bins —
    *     the partial agg map-side-combines to ≤ |spans|·buckets rows, so
    *     the shuffle carries KILOBYTES regardless of table size (vs the
    *     full (group,value) summary shuffle of the range path);
    *  3. the driver walks each span's bucket counts to find the bin
    *     containing its rank and narrows the span `buckets`-fold.
    *
    * A span of width ≤ `buckets` resolves exactly (one value per bin),
    * so rounds ≤ ⌈64 / log₂ buckets⌉ = 5 full passes worst-case over the
    * entire long domain; real data resolves in 2-3. Driver state is
    * O(|groups|·|probs|·buckets) longs — never the distribution. Spans
    * whose width overflows long split at 0 into two selectors; bucket
    * arithmetic stays in exact long math. Interpolation is the identical
    * bit-exact Catalyst `Percentile` formula; null values are ignored
    * (`Percentile` semantics); a null group KEY is a legitimate group
    * (null-safe join). Prefer this over [[quantilesByGroup]] when extra
    * scans are cheaper than shuffling the distinct-value summary — i.e.
    * columnar sources with column pruning, which is the 100-TB regime. */
  def quantilesByGroupHistogram(df: DataFrame, groupCol: String,
                                valueCol: String, probs: Seq[Double],
                                buckets: Int = 8192)
      : Map[String, Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .where($"v".isNotNull)
    // pass 0: group extents — O(|groups|) rows to the driver
    val extents = base.groupBy($"g")
      .agg(count(lit(1)).as("n"), min($"v").as("mn"), max($"v").as("mx"))
      .select($"g", $"n", $"mn", $"mx")
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    histogramSelect(base, extents, probs, buckets)
  }

  /** [[quantilesByGroupHistogram]] with CALLER-SUPPLIED extents
    * `group -> (n, hullLo, hullHi)` — for pipelines that already paid an
    * aggregate pass carrying count/min/max (fold them into that agg and
    * skip pass 0 here), or whose hull is known analytically (e.g. a
    * derived |x − m| column is bounded by the source column's extents).
    * `n` must be the exact non-null count; the hull need only COVER the
    * group's values — looseness costs narrowing rounds, not correctness. */
  def quantilesByGroupHistogramHull(df: DataFrame, groupCol: String,
                                    valueCol: String, probs: Seq[Double],
                                    extents: Map[String, (Long, Long, Long)],
                                    buckets: Int = 8192)
      : Map[String, Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .where($"v".isNotNull)
    histogramSelect(base, extents, probs, buckets)
  }

  /** One selector per (group, needed rank): its span plus the count of
    * values strictly below the span (global 0-based rank bookkeeping). */
  private final case class Sel(g: String, rank: Long, lo: Long, hi: Long,
                               below: Long)

  /** Quantiles from a caller-computed FIXED-WIDTH coarse histogram —
    * the zero-extra-pass donation: the caller aggregates
    * `(g, v div binWidth) → count` in a pass it can run CONCURRENTLY
    * with its other aggregates (no extents needed, unlike
    * [[quantilesByGroupHistogramHull]] whose hull comes from a prior
    * pass), and the selection here starts from each rank's COVERING BIN
    * instead of the full value hull. With `binWidth ≤ buckets` that is
    * ONE narrowing round over a binWidth-wide span — q51's shape: 3
    * concurrent scans (sketches, exact distinct, coarse histogram) and
    * a single selection round, nothing serialized behind the sketch
    * pass.
    *
    * `bins`: every non-empty `(g, bin, count)` with `bin = v div
    * binWidth`, from EXACTLY the rows of `df` (a drifted histogram
    * fails loudly in the walk). Values must be non-negative (`div`
    * truncates toward zero, which mis-bins negatives — shift the column
    * if needed; enforced). Null handling, group-key semantics, and the
    * interpolation formula match [[quantilesByGroupHistogram]]. */
  def quantilesByGroupFromCoarseHistogram(df: DataFrame, groupCol: String,
                                          valueCol: String, probs: Seq[Double],
                                          bins: Seq[(String, Long, Long)],
                                          binWidth: Long, buckets: Int = 8192)
      : Map[String, Array[Double]] = {
    require(binWidth >= 1, s"binWidth must be >= 1 (got $binWidth)")
    require(bins.forall(_._2 >= 0),
      "coarse bins must come from non-negative values (div truncation " +
        "mis-bins negatives — shift the value column)")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .where($"v".isNotNull)
    val byGroup = bins.groupBy(_._1)
    val nByGroup: Map[String, Long] =
      byGroup.map { case (g, bs) => g -> bs.map(_._3).sum }
    val active: Seq[Sel] = byGroup.toSeq.flatMap { case (g, bs) =>
      val sorted = bs.sortBy(_._2)
      val cums = sorted.scanLeft(0L)(_ + _._3)
      val n = nByGroup(g)
      probs.map(p => (n - 1) * p)
        .flatMap(h => Seq(math.floor(h).toLong, math.ceil(h).toLong))
        .distinct.flatMap { rank =>
          sorted.indices.collectFirst {
            case i if rank >= cums(i) && rank < cums(i) + sorted(i)._3 =>
              val b = sorted(i)._2
              Sel(g, rank, b * binWidth, b * binWidth + (binWidth - 1), cums(i))
          }
        }
    }
    runSelection(base, probs, buckets, nByGroup, active)
  }

  private def histogramSelect(base: DataFrame,
                              extents: Map[String, (Long, Long, Long)],
                              probs: Seq[Double], buckets: Int)
      : Map[String, Array[Double]] = {
    val hsByGroup: Map[String, Array[Double]] = extents.map {
      case (g, (n, _, _)) => g -> probs.map(p => (n - 1) * p).toArray
    }
    val active: Seq[Sel] = extents.toSeq.flatMap { case (g, (_, mn, mx)) =>
      hsByGroup(g).flatMap(h =>
        Seq(math.floor(h).toLong, math.ceil(h).toLong)).distinct
        .flatMap { rank =>
          // an overflowing span (mx - mn ≥ 2^63) splits at 0; count rows
          // below 0 lazily by treating the halves as separate selectors —
          // the first round's walk assigns the rank to whichever half
          // covers it once negative-half counts arrive
          try { Math.subtractExact(mx, mn); Seq(Sel(g, rank, mn, mx, 0L)) }
          catch { case _: ArithmeticException =>
            Seq(Sel(g, rank, mn, -1L, 0L), Sel(g, rank, 0L, mx, Long.MinValue))
          }
        }
    }
    runSelection(base, probs, buckets,
      extents.map { case (g, (n, _, _)) => g -> n }, active)
  }

  private def runSelection(base: DataFrame, probs: Seq[Double], buckets: Int,
                           nByGroup: Map[String, Long], initial: Seq[Sel])
      : Map[String, Array[Double]] = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    require(buckets >= 2)
    val spark = base.sparkSession
    import spark.implicits._
    val hsByGroup: Map[String, Array[Double]] = nByGroup.map {
      case (g, n) => g -> probs.map(p => (n - 1) * p).toArray
    }
    var active: Seq[Sel] = initial
    val resolved = scala.collection.mutable.Map[(String, Long), Long]()
    var round = 0
    while (active.nonEmpty) {
      round += 1
      require(round <= 8, s"histogram selection failed to converge: $active")
      val widths: Map[Int, Long] = active.indices.map { i =>
        val s = active(i)
        val span = s.hi - s.lo + 1 // safe: overflowing spans were split
        i -> math.max(1L, (span + buckets - 1) / buckets)
      }.toMap
      val selRows = active.indices.map { i =>
        val s = active(i); (i, s.g, s.lo, s.hi, widths(i))
      }
      val selDf = broadcast(
        selRows.toDF("sel", "sg", "lo", "hi", "w"))
      // literal hull of all active spans: from round 2 on this predicate
      // reaches the parquet scan (min/max row-group skipping), unlike the
      // per-selector bounds that only exist post-join
      val hullLo = active.map(_.lo).min
      val hullHi = active.map(_.hi).max
      // join multiplies a row only by the (few) overlapping selectors of
      // its group; bucket index in exact long division (operands ≥ 0)
      val counts = base
        .where($"v" >= lit(hullLo) && $"v" <= lit(hullHi))
        .join(selDf, $"g" <=> $"sg")
        .where($"v" >= $"lo" && $"v" <= $"hi")
        .groupBy($"sel", expr("(v - lo) div w").as("b"))
        .agg(count(lit(1)).as("c"))
        .as[(Int, Long, Long)]
        .collect()
      val bySel = counts.groupBy(_._1)
      // split-span halves of one rank share (g, rank): merge the negative
      // half's total into the positive half's `below` before walking
      val halfTotals: Map[(String, Long), Long] = active.indices
        .filter(i => active(i).hi == -1L)
        .map { i =>
          val s = active(i)
          (s.g, s.rank) ->
            bySel.getOrElse(i, Array.empty).map(_._3).sum
        }.toMap
      val next = scala.collection.mutable.ArrayBuffer[Sel]()
      active.indices.foreach { i =>
        val s0 = active(i)
        val s = if (s0.below == Long.MinValue)
          s0.copy(below = halfTotals.getOrElse((s0.g, s0.rank), 0L))
        else s0
        val w = widths(i)
        val bins = bySel.getOrElse(i, Array.empty)
          .map { case (_, b, c) => (b, c) }.sortBy(_._1)
        var cum = s.below
        var hit = false
        bins.foreach { case (b, c) =>
          if (!hit && s.rank >= cum && s.rank < cum + c) {
            hit = true
            val lo2 = s.lo + b * w
            val hi2 = math.min(s.hi, lo2 + (w - 1))
            if (w == 1L) resolved((s.g, s.rank)) = lo2
            else next += Sel(s.g, s.rank, lo2, hi2, cum)
          }
          if (!hit) cum += c
        }
        // a half-span that doesn't contain the rank just drops out
      }
      active = next.toSeq
    }
    hsByGroup.map { case (g, hs) =>
      g -> hs.map { h =>
        val lo = math.floor(h)
        val hi = math.ceil(h)
        if (nByGroup(g) == 0) Double.NaN
        else {
          val lv = resolved((g, lo.toLong)).toDouble
          val hv = resolved((g, hi.toLong)).toDouble
          if (lo == hi) lv else (hi - h) * lv + (h - lo) * hv
        }
      }
    }
  }

  /** Per-group exact quantiles for the MANY-groups regime, as a
    * DataFrame `(g string, qs array<double>)`. The (group, value)
    * frequency summary hash-partitions on GROUP, a within-partition sort
    * makes each group's summary contiguous, and one streaming pass per
    * partition computes the interpolated quantiles locally — no global
    * coordination, no driver state, output rows scale with |groups|.
    * The held state per task is ONE group's distinct-value summary plus
    * that partition's result rows. Interpolation is the identical
    * bit-exact Catalyst `Percentile` formula. Complements
    * [[quantilesByGroup]], whose per-(partition,group) driver scalars
    * are O(P·|groups|) — the wrong shape past a few hundred groups;
    * here a single skewed-huge group is the (documented) straggler
    * instead. [[quantilesByGroupAuto]] picks by measured group count. */
  def quantilesByGroupHashed(df: DataFrame, groupCol: String,
                             valueCol: String, probs: Seq[Double],
                             partitions: Int = 64): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    val spark = df.sparkSession
    import spark.implicits._
    val summary = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .where($"v".isNotNull)
      .groupBy($"g", $"v").agg(count(lit(1)).as("f"))
    hashedFromSummary(summary, probs, partitions)
  }

  private def hashedFromSummary(summary: DataFrame, probs: Seq[Double],
                                partitions: Int): DataFrame = {
    val spark = summary.sparkSession
    import spark.implicits._
    val ps = probs.toArray
    summary
      .repartition(partitions, $"g")
      .sortWithinPartitions($"g", $"v")
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
        val out = scala.collection.mutable.ArrayBuffer[(String, Array[Double])]()
        var curG: String = null
        var started = false
        def emit(g: String): Unit = {
          var n = 0L
          buf.foreach { case (_, f) => n += f }
          val hs = ps.map(p => (n - 1) * p)
          val needed = hs.flatMap(h =>
            Seq(math.floor(h).toLong, math.ceil(h).toLong)).distinct.sorted
          val found = scala.collection.mutable.LongMap[Long]()
          var cum = 0L
          buf.foreach { case (v, f) =>
            var i = 0
            while (i < needed.length) {
              val pos = needed(i)
              if (pos >= cum && pos < cum + f) found(pos) = v
              i += 1
            }
            cum += f
          }
          out += ((g, hs.map { h =>
            val lo = math.floor(h)
            val hi = math.ceil(h)
            val lv = found(lo.toLong).toDouble
            val hv = found(hi.toLong).toDouble
            if (lo == hi) lv else (hi - h) * lv + (h - lo) * hv
          }))
        }
        it.foreach { case (g, v, f) =>
          if (!started) { started = true; curG = g }
          else if (g != curG) { emit(curG); buf.clear(); curG = g }
          buf += ((v, f))
        }
        if (started) emit(curG)
        out.iterator
      }
      .toDF("g", "qs")
  }

  /** Auto-selecting grouped quantiles: ONE full-data pass builds the
    * (group, value) frequency summary; the measured group count then
    * routes the summary to the range-partitioned selection path (few
    * groups — a huge group may span partitions) or the hash-partitioned
    * streaming path (many groups — no driver state). Output in both
    * regimes: `(g string, qs array<double>)`, bit-identical to Catalyst
    * `Percentile`. */
  def quantilesByGroupAuto(df: DataFrame, groupCol: String,
                           valueCol: String, probs: Seq[Double],
                           partitions: Int = 64,
                           fewGroupsMax: Int = 64): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))
    val spark = df.sparkSession
    import spark.implicits._
    val summary = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .where($"v".isNotNull)
      .groupBy($"g", $"v").agg(count(lit(1)).as("f"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nGroups = summary.select($"g").distinct().count()
      if (nGroups <= fewGroupsMax) {
        rangeFromSummary(summary, probs, partitions).toSeq.toDF("g", "qs")
      } else {
        // eagerly materialize (result is |groups| rows) so the summary
        // cache can be released before returning the lazy frame
        val res = hashedFromSummary(summary, probs, partitions)
          .cutLineage(eager = true)
        res
      }
    } finally { summary.unpersist(); () }
  }
}
