package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving top-k heavy-hitters sketch as a typed Spark `Aggregator` —
  * the "novel sketch" tier of the operator inventory.
  *
  * Counts the most frequent items in ONE pass with a fixed `capacity`-item
  * buffer per partial aggregate: when a new item arrives at a full buffer
  * it replaces the current minimum, inheriting its count as overestimation
  * error (Metwally et al., "Efficient computation of frequent and top-k
  * elements in data streams", ICDT 2005 — public algorithm). Guarantees:
  * count overestimation ≤ N/capacity; any item with true frequency >
  * N/capacity is in the buffer. With capacity >= distinct items the result
  * is EXACT (zero error).
  *
  * Scale: partial buffers combine map-side (Aggregator = partial-agg'd by
  * Catalyst), so the shuffle carries `capacity` (item,count,err) triples
  * per task — corpus-wide token statistics without shuffling tokens.
  */
object SpaceSaving {

  /** item -> (count, error) with eviction bookkeeping. */
  final case class SSBuffer(capacity: Int,
                            counts: mutable.Map[String, (Long, Long)])

  final case class HeavyHitter(item: String, count: Long, error: Long)

  private def offer(buf: SSBuffer, item: String, add: Long, err: Long): Unit = {
    buf.counts.get(item) match {
      case Some((c, e)) => buf.counts(item) = (c + add, e + err)
      case None if buf.counts.size < buf.capacity =>
        buf.counts(item) = (add, err)
      case None =>
        val (minItem, (minC, _)) = buf.counts.minBy { case (i, (c, _)) => (c, i) }
        buf.counts.remove(minItem)
        buf.counts(item) = (minC + add, minC + err)
    }
  }

  def aggregator(capacity: Int): Aggregator[String, SSBuffer, Seq[HeavyHitter]] =
    new Aggregator[String, SSBuffer, Seq[HeavyHitter]] {
      def zero: SSBuffer = SSBuffer(capacity, mutable.Map.empty)
      def reduce(b: SSBuffer, item: String): SSBuffer = { offer(b, item, 1L, 0L); b }
      def merge(a: SSBuffer, b: SSBuffer): SSBuffer = {
        // standard sketch merge: fold b's entries (counts + errors), then
        // the buffer's own eviction rule keeps it at capacity
        b.counts.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.foreach {
          case (item, (c, e)) => offer(a, item, c, e)
        }
        a
      }
      def finish(b: SSBuffer): Seq[HeavyHitter] =
        b.counts.toSeq.map { case (i, (c, e)) => HeavyHitter(i, c, e) }
          .sortBy(h => (-h.count, h.item))
      def bufferEncoder: Encoder[SSBuffer] = Encoders.kryo[SSBuffer]
      def outputEncoder: Encoder[Seq[HeavyHitter]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HeavyHitter]]()
    }

  /** Column form for `df.select(...)` / `ds.agg(...)`. */
  def topK(capacity: Int): TypedColumn[String, Seq[HeavyHitter]] =
    aggregator(capacity).toColumn

  /** Merge-form aggregator: folds STORED (item,count,error) summaries
    * instead of raw items — the read/compact side of heavy-hitter IVM
    * ([[graft.ops.HeavyHitterAgg]]). Entries are re-offered largest-first
    * through the same eviction rule, so merging preserves the SpaceSaving
    * guarantees (mergeable summaries — Agarwal et al., PODS 2012), and
    * with capacity ≥ total distinct items the merge is lossless/exact. */
  def mergeAggregator(capacity: Int): Aggregator[Seq[HeavyHitter], SSBuffer, Seq[HeavyHitter]] =
    new Aggregator[Seq[HeavyHitter], SSBuffer, Seq[HeavyHitter]] {
      def zero: SSBuffer = SSBuffer(capacity, mutable.Map.empty)
      def reduce(b: SSBuffer, hs: Seq[HeavyHitter]): SSBuffer = {
        hs.sortBy(h => (-h.count, h.item)).foreach(h =>
          offer(b, h.item, h.count, h.error))
        b
      }
      def merge(a: SSBuffer, b: SSBuffer): SSBuffer = {
        b.counts.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.foreach {
          case (item, (c, e)) => offer(a, item, c, e)
        }
        a
      }
      def finish(b: SSBuffer): Seq[HeavyHitter] =
        b.counts.toSeq.map { case (i, (c, e)) => HeavyHitter(i, c, e) }
          .sortBy(h => (-h.count, h.item))
      def bufferEncoder: Encoder[SSBuffer] = Encoders.kryo[SSBuffer]
      def outputEncoder: Encoder[Seq[HeavyHitter]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HeavyHitter]]()
    }
}
