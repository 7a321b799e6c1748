package graft.ops

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
    * (`Percentile` semantics); a null group KEY is a legitimate group. */
  def quantilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
                       probs: Seq[Double], partitions: Int = 64)
      : Map[String, Array[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    rangeFromSummary(
      df.select(col(groupCol).cast("string").as("g"),
          col(valueCol).cast("long").as("v"))
        .where($"v".isNotNull)
        .groupBy($"g", $"v").agg(count(lit(1)).as("f")),
      probs, partitions)
  }

  /** The range-partitioned selection over a prebuilt `(g, v, f)`
    * summary — shared by [[quantilesByGroup]] and the auto path. */
  private def rangeFromSummary(summary: DataFrame, probs: Seq[Double],
                               partitions: Int)
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
          .localCheckpoint(true)
        res
      }
    } finally { summary.unpersist(); () }
  }
}
