package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column file skipping.
  *
  * A lexicographic `clusterBy(a, b)` gives perfect min/max file skipping
  * on `a` but none on `b` (every file spans b's whole domain). Z-ordering
  * interleaves the bits of per-column rank buckets, so each output file
  * covers a small HYPER-RECTANGLE of the (a, b, ...) space — selective
  * predicates on ANY clustered column skip most files from parquet footer
  * stats alone. This is the OPTIMIZE ZORDER BY of the big lakehouse
  * engines, built from two public primitives: quantile sketches for
  * boundaries and integer bit-interleaving for the sort key.
  *
  * Scale shape: boundary computation is one `approxQuantile` sketch pass
  * per column (driver receives 2^bits - 1 doubles per column, nothing
  * else); the z-value is a pure scan projection; the layout write is the
  * same range-partition + in-partition sort as single-key clustering.
  */
object ZOrder {

  /** Rank-bucket boundaries for one column: the (2^bits - 1) approximate
    * quantile cut points that split it into 2^bits equal-mass buckets.
    * Rank buckets (not raw values) keep skewed columns balanced. */
  def boundsFor(df: DataFrame, colName: String, bits: Int): Seq[Double] = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val k = 1 << bits
    val probs = (1 until k).map(_.toDouble / k).toArray
    df.stat.approxQuantile(colName, probs, 0.01).toSeq
  }

  /** Equal-mass bucket index of `c` in [0, 2^bits): the count of
    * boundaries ≤ value (codegen'd array filter — no join, no UDF).
    * Nulls land in bucket 0. */
  private def bucket(c: Column, bounds: Seq[Double]): Column =
    size(filter(array(bounds.map(lit): _*), b => b <= c.cast("double")))

  /** The Morton code: bit i of column j's bucket goes to output bit
    * `i·n + j`. Bits are disjoint, so the OR is a sum; everything stays
    * in one 64-bit long (requires `bits · n ≤ 63`). */
  def zvalue(colsWithBounds: Seq[(Column, Seq[Double])], bits: Int): Column = {
    val n = colsWithBounds.size
    require(n >= 1, "need at least one column")
    require(bits.toLong * n <= 63L, s"bits($bits) x cols($n) exceeds a long")
    colsWithBounds.forall { case (_, b) => require(b.size == (1 << bits) - 1,
      s"expected ${(1 << bits) - 1} boundaries, got ${b.size}"); true }
    val terms = for {
      ((c, bounds), j) <- colsWithBounds.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(bucket(c, bounds).cast("long"), i).bitwiseAND(lit(1L)),
      i * n + j)
    terms.reduce(_ + _)
  }
}
