package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a typed Spark `Aggregator`: fixed-size frequency
  * summaries with one-sided error (Cormode & Muthukrishnan, "An improved
  * data stream summary: the count-min sketch and its applications",
  * J. Algorithms 2005 — public algorithm).
  *
  * A `depth × width` matrix of counters; each item increments one counter
  * per row, chosen by that row's hash. A point query returns the MIN of
  * its counters — never an underestimate, and over by more than
  * `ε·N` (ε = e/width) with probability at most `δ = e^-depth`. Unlike
  * [[SpaceSaving]] (which keeps only the top-k items), a CMS answers
  * frequency queries for ANY item after the fact, which is what a
  * corpus-wide token/domain/URL frequency service needs.
  *
  * Hashing: row i uses `murmur3(item, seed=i)` — deterministic across
  * JVMs, partitionings, and runs (no Random, no object identity).
  *
  * Scale: the buffer is a fixed `depth·width` long matrix; partials
  * combine map-side by element-wise addition (CMS is a linear sketch), so
  * the shuffle carries one matrix per task regardless of corpus size.
  */
object CountMin {

  final case class CmsBuffer(depth: Int, width: Int, counters: Array[Long]) {
    def add(item: String, count: Long): Unit = {
      var i = 0
      while (i < depth) {
        counters(i * width + bucket(item, i, width)) += count
        i += 1
      }
    }
  }

  /** Row-i bucket of an item: non-negative murmur3 mod width. */
  def bucket(item: String, row: Int, width: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(item, row)
    ((h % width) + width) % width
  }

  /** Point-query the finished sketch matrix. */
  def estimate(counters: Array[Long], depth: Int, width: Int,
               item: String): Long = {
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counters(i * width + bucket(item, i, width))
      if (c < best) best = c
      i += 1
    }
    best
  }

  def aggregator(depth: Int, width: Int): Aggregator[String, CmsBuffer, Array[Long]] =
    new Aggregator[String, CmsBuffer, Array[Long]] {
      def zero: CmsBuffer = CmsBuffer(depth, width, new Array[Long](depth * width))
      def reduce(b: CmsBuffer, item: String): CmsBuffer = { b.add(item, 1L); b }
      def merge(a: CmsBuffer, b: CmsBuffer): CmsBuffer = {
        var i = 0
        while (i < a.counters.length) { a.counters(i) += b.counters(i); i += 1 }
        a
      }
      def finish(b: CmsBuffer): Array[Long] = b.counters
      def bufferEncoder: Encoder[CmsBuffer] = Encoders.kryo[CmsBuffer]
      def outputEncoder: Encoder[Array[Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    }

  /** The sketch as a `TypedColumn` for `Dataset[String].select`. */
  def sketch(depth: Int, width: Int): TypedColumn[String, Array[Long]] =
    aggregator(depth, width).toColumn

  /** [[estimate]] over Catalyst's `ArrayData` — the shared kernel for
    * [[CountMinEstimate]]'s interpreted and generated paths. */
  def estimateAd(counters: ArrayData, depth: Int, width: Int,
                 item: UTF8String): Long = {
    val s = item.toString
    var best = Long.MaxValue
    var i = 0
    while (i < depth) {
      val c = counters.getLong(i * width + bucket(s, i, width))
      if (c < best) best = c
      i += 1
    }
    best
  }
}

/** Point-query a finished Count-Min matrix as a native codegen'd
  * expression: `cms_estimate(counters, item)` with plan-time
  * (depth, width). The matrix column arrives via a 1-row broadcast join
  * (the sketch is `depth·width` longs — driver/broadcast-scale by
  * design), so every probe row is scored executor-side: the enumerable
  * dimension is never collected to the driver. NULL on null inputs or a
  * matrix smaller than `depth·width`. */
case class CountMinEstimate(left: Expression, right: Expression,
                            depth: Int, width: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, string), got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cms_estimate"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val counters = l.asInstanceOf[ArrayData]
    if (counters.numElements() < depth * width) null
    else java.lang.Long.valueOf(CountMin.estimateAd(
      counters, depth, width, r.asInstanceOf[UTF8String]))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (counters, item) => {
      val mod = "graft.functions.CountMin$.MODULE$"
      s"""
         |if ($counters.numElements() < ${depth * width}) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $mod.estimateAd($counters, $depth, $width, $item);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CountMinEstimate =
    copy(left = newLeft, right = newRight)
}

object CountMinEstimate {
  /** Column API via the expression bridge (depth/width are plan-time
    * constants, same pattern as [[PqAdcScore]]). */
  def apply(counters: Column, item: Column, depth: Int, width: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      CountMinEstimate(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(counters),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(item),
        depth, width))
}
