package org.apache.spark.sql.catalyst.expressions.aggregate

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Tie-aware per-group top-k collection — the aggregate behind
  * [[graft.plans.TopKRewrite]]'s `rank()/dense_rank() <= k` rewrite, the
  * way [[CollectTopK]] is the aggregate behind its `row_number()` form.
  *
  * The element is a struct whose FIRST `orderFieldCount` fields are the
  * window's order keys (remaining fields are payload). The buffer keeps
  * exactly the rows the rank predicate will keep:
  *
  *  - `dense = false` (rank): a row survives iff fewer than `num` rows
  *    order strictly before it — i.e. its tie group STARTS before index
  *    `num` in sorted order. Boundary ties are all kept, matching
  *    `rank() <= k`'s more-than-k-rows-on-ties semantics.
  *  - `dense = true` (dense_rank): rows of the first `num` distinct
  *    order-key groups survive.
  *
  * Pruning is amortized: inserts append, and when the buffer doubles past
  * its last pruned size it re-sorts and cuts at the tie-aware boundary —
  * O(log) comparisons per row overall. Buffer size is Θ(per-group result
  * size) (k rows + boundary ties; all ties of k distinct keys for dense),
  * which is exactly what the post-filter window would materialize anyway —
  * the rewrite trades the full-partition SORT for result-sized state, the
  * same bargain as CollectTopK.
  *
  * `eval` emits `array<struct<__rank: int, ...element fields>>` sorted by
  * (order keys, payload) — rank values are computed here, tie groups
  * share a rank, and emission order is deterministic because the rewrite
  * guards that every field is orderable.
  */
case class CollectTopRank(
    child: Expression,
    num: Int,
    orderFieldCount: Int,
    dense: Boolean,
    reverse: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends Collect[CollectTopRank.RankBuffer] with UnaryLike[Expression] {

  require(num > 0, "num must be positive")

  private lazy val structType = child.dataType.asInstanceOf[StructType]
  require(orderFieldCount > 0)

  private def boundSortOrders(n: Int): Seq[SortOrder] =
    structType.fields.take(n).zipWithIndex.map { case (f, i) =>
      val dir = if (reverse && i < orderFieldCount) Descending
        else if (i < orderFieldCount) Ascending
        else Ascending
      SortOrder(BoundReference(i, f.dataType, f.nullable), dir)
    }.toSeq

  /** Compares ONLY the order-key prefix — defines tie groups. */
  @transient private lazy val orderOrd =
    new InterpretedOrdering(boundSortOrders(orderFieldCount))
  /** Total order (order keys then payload) — deterministic emission. */
  @transient private lazy val fullOrd =
    new InterpretedOrdering(boundSortOrders(structType.fields.length))

  override def createAggregationBuffer(): CollectTopRank.RankBuffer =
    new CollectTopRank.RankBuffer(math.max(num + 16, 64))

  override protected def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override protected lazy val bufferElementType: DataType = child.dataType

  override def update(buffer: CollectTopRank.RankBuffer,
                      input: InternalRow): CollectTopRank.RankBuffer = {
    val b = super.update(buffer, input)
    maybePrune(b); b
  }

  override def merge(buffer: CollectTopRank.RankBuffer,
                     other: CollectTopRank.RankBuffer): CollectTopRank.RankBuffer = {
    val b = super.merge(buffer, other)
    maybePrune(b); b
  }

  private def sorted(buf: CollectTopRank.RankBuffer): Array[AnyRef] = {
    val arr = new Array[AnyRef](buf.length)
    var i = 0
    buf.foreach { e => arr(i) = e.asInstanceOf[AnyRef]; i += 1 }
    java.util.Arrays.sort(arr, new java.util.Comparator[AnyRef] {
      override def compare(a: AnyRef, b: AnyRef): Int =
        fullOrd.compare(a.asInstanceOf[InternalRow], b.asInstanceOf[InternalRow])
    })
    arr
  }

  /** Index of the first element the rank predicate rejects. */
  private def cutIndex(arr: Array[AnyRef]): Int = {
    var i = 0
    var groupStart = 0
    var distinct = 0
    while (i < arr.length) {
      if (i == 0 || orderOrd.compare(arr(i - 1).asInstanceOf[InternalRow],
          arr(i).asInstanceOf[InternalRow]) != 0) {
        groupStart = i; distinct += 1
      }
      val keeps = if (dense) distinct <= num else groupStart < num
      if (!keeps) return i
      i += 1
    }
    arr.length
  }

  private def maybePrune(buf: CollectTopRank.RankBuffer): Unit = {
    if (buf.length < buf.pruneAt) return
    val arr = sorted(buf)
    val cut = cutIndex(arr)
    buf.clear()
    var i = 0
    while (i < cut) { buf += arr(i); i += 1 }
    buf.pruneAt = math.max(cut * 2, cut + math.max(num, 16))
  }

  override def eval(buffer: CollectTopRank.RankBuffer): Any = {
    val arr = sorted(buffer)
    val cut = cutIndex(arr)
    val out = new Array[Any](cut)
    var i = 0
    var groupStart = 0
    var distinct = 0
    val nf = structType.fields.length
    while (i < cut) {
      val row = arr(i).asInstanceOf[InternalRow]
      if (i == 0 || orderOrd.compare(arr(i - 1).asInstanceOf[InternalRow],
          row) != 0) {
        groupStart = i; distinct += 1
      }
      val rank = if (dense) distinct else groupStart + 1
      val vals = new Array[Any](nf + 1)
      vals(0) = rank
      var j = 0
      while (j < nf) {
        vals(j + 1) = row.get(j, structType.fields(j).dataType)
        j += 1
      }
      out(i) = InternalRow.fromSeq(vals.toIndexedSeq)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def dataType: DataType = ArrayType(
    StructType(StructField("__rank", IntegerType, nullable = false) +:
      structType.fields),
    containsNull = false)

  override def nullable: Boolean = false

  override def prettyName: String = "collect_top_rank"

  override protected def withNewChildInternal(newChild: Expression): CollectTopRank =
    copy(child = newChild)

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectTopRank =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CollectTopRank =
    copy(inputAggBufferOffset = newOffset)
}

object CollectTopRank {
  /** Growable buffer + the amortized-prune watermark. */
  final class RankBuffer(var pruneAt: Int)
    extends mutable.ArrayBuffer[Any]
}
