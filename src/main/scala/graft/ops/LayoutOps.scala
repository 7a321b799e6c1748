package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering for
  * min/max data skipping — the Delta `OPTIMIZE ZORDER BY` / Iceberg
  * sort-order analog, built from plain Spark primitives.
  *
  * Why this matters at 100 TB: parquet scans prune files and row groups
  * by footer min/max statistics. A table sorted by ONE column skips
  * perfectly on that column and not at all on any other; interleaving
  * the bits of d columns into one sort key gives every interleaved
  * column locality ~2^(b/d) effective prefix bits, so selective
  * predicates on ANY of them cut the files a scan touches by orders of
  * magnitude. The cluster pass itself is one range exchange + in-task
  * sort — the same cost as any global sort, paid once at write time.
  *
  * Everything here is integer bit arithmetic on codegen'd built-ins
  * (no UDFs), deterministic and engine-portable — the z-values are
  * oracle-checkable bit-for-bit (q155).
  */
object LayoutOps {

  /** Morton-interleave two pre-scaled 16-bit grid coordinates
    * (`0 <= v < 65536`) into one 32-bit z-value: bit j of `x` lands at
    * bit 2j, bit j of `y` at 2j+1. Uses the standard magic-number bit
    * spread — 5 shift/mask steps per operand instead of 16 per-bit
    * extractions, all inside whole-stage codegen. */
  def zValue2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Spread the low 16 bits of `c` to even bit positions (0,2,...,30). */
  private def spread16(c: Column): Column = {
    val m0 = c.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton-interleave `d` (2-4) pre-scaled `bits`-bit coordinates into
    * one z-value (bit j of column i lands at bit j·d + i). Per-bit
    * shift/mask terms — O(d·bits) codegen'd long ops per row; use
    * [[zValue2]] for the common 2-D case. `d·bits` must stay <= 63. */
  def zValueN(cols: Seq[Column], bits: Int): Column = {
    require(cols.size >= 2 && cols.size <= 4, "zValueN supports 2-4 columns")
    require(bits >= 1 && cols.size * bits <= 63,
      s"d*bits must be <= 63, got ${cols.size}*$bits")
    val d = cols.size
    (0 until bits).flatMap { j =>
      cols.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * d + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Linearly scale a LONG column with known inclusive bounds onto the
    * `[0, 2^bits)` grid: `(v - min) * (2^bits - 1) div (max - min)`.
    * Exact integer arithmetic (portable across engines); `(max - min) *
    * (2^bits - 1)` must stay inside signed-64, which holds for any
    * real-world key range up to ~2^47 at the default 16 bits. A
    * degenerate column (min == max) maps to grid cell 0. */
  def scaleToGrid(v: Column, minV: Column, maxV: Column,
                  bits: Int = 16): Column = {
    val cells = (1L << bits) - 1
    when(maxV === minV, lit(0L))
      .otherwise(exactDiv((v - minV) * cells, maxV - minV))
  }

  /** Exact integer floor-div for non-negative operands WITHOUT the SQL
    * `div` operator (not exposed on Column): subtracting `pmod` first
    * makes the double division exact for any quotient < 2^53 — here the
    * quotient is a grid cell < 2^16. */
  private def exactDiv(num: Column, den: Column): Column =
    ((num - pmod(num, den)) / den).cast("long")

  /** Z-order-cluster `df` by 2-4 LONG columns and write parquet: scales
    * each onto a grid using its actual min/max (one scalar aggregation —
    * the driver gets 2·d longs, never data), computes the interleaved
    * z-value, range-partitions on it into `numFiles` output tasks and
    * sorts within each — so every written file covers one compact
    * z-range and its footer min/max are tight on EVERY listed column.
    * Grid bits split the 63-bit z-value budget evenly across columns
    * (16 bits each for 2-D — the [[zValue2]] fast path — 21 for 3-D,
    * 15 for 4-D).
    *
    * Scale shape: one pass for bounds (partial-agg'd), one range
    * exchange (sampled boundaries, AQE-compatible), one in-task sort,
    * one write. No driver collect of data, no global single-task sort. */
  def writeZOrdered(df: DataFrame, cols: Seq[String],
                    path: String, numFiles: Int): Unit = {
    require(cols.size >= 2 && cols.size <= 4,
      s"z-order supports 2-4 columns, got ${cols.size}")
    val bits = if (cols.size == 2) 16 else 63 / cols.size // 16 / 21 / 15
    val aggs = cols.flatMap(c => Seq(min(col(c)), max(col(c))))
    val b = df.agg(aggs.head, aggs.tail: _*).head()
    val gridded = cols.zipWithIndex.map { case (c, i) =>
      scaleToGrid(col(c), lit(b.getLong(2 * i)), lit(b.getLong(2 * i + 1)), bits)
    }
    val z =
      if (cols.size == 2) zValue2(gridded(0), gridded(1))
      else zValueN(gridded, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** 2-column convenience overload (the original q155 surface). */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    path: String, numFiles: Int): Unit =
    writeZOrdered(df, Seq(colA, colB), path, numFiles)

  /** Linear-clustered control twin of [[writeZOrdered]]: same exchange
    * and sort, ordered by `colA` alone. Perfect skipping on `colA`,
    * none on `colB` — the baseline the layout spec compares against. */
  def writeLinearOrdered(df: DataFrame, colA: String,
                         path: String, numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(colA))
      .sortWithinPartitions(col(colA))
      .write.mode("overwrite").parquet(path)

  /** Data-skipping effectiveness of a written parquet directory for the
    * box predicate `lo <= c <= hi` per column: the number of FILES whose
    * footer [min,max] range overlaps the box — exactly the files a
    * stats-pruning scan must read. Returns (overlapping, total).
    *
    * Reads only per-file column min/max (a file-parallel aggregation
    * over each file's stats-backed scan), never full data — a dev/audit
    * helper, sized to file counts, not rows. */
  def filesOverlappingBox(spark: org.apache.spark.sql.SparkSession,
                          path: String,
                          box: Map[String, (Long, Long)]): (Int, Int) = {
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.toString).sorted
    val boxCols = box.toSeq
    val aggs = boxCols.flatMap { case (c, _) =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")) }
    val overlapping = files.count { f =>
      val stats = spark.read.parquet(f).agg(aggs.head, aggs.tail: _*).head()
      boxCols.zipWithIndex.forall { case ((_, (lo, hi)), i) =>
        val (mn, mx) = (stats.getLong(2 * i), stats.getLong(2 * i + 1))
        mx >= lo && mn <= hi
      }
    }
    (overlapping, files.length)
  }
}
