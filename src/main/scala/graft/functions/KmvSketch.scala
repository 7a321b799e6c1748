package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values, "bottom-k theta") distinct sketch as a typed
  * Spark `Aggregator` — the set-EXPRESSION member of the mergeable-sketch
  * family (HLL in [[graft.ops.SketchAgg]] unions but cannot intersect;
  * KMV supports union AND intersection/Jaccard, the cross-source overlap
  * question: "how many users appear in both corpora").
  *
  * The sketch is the k smallest DISTINCT 64-bit hashes of the input
  * (unsigned order), Bar-Yossef et al.'s distinct-elements sampler
  * (RANDOM 2002) / the Theta-sketch base case (Dasgupta et al.,
  * "Theta-sketch framework", 2016 — public algorithms). Estimators:
  *
  *  - NDV: exact |sketch| while |sketch| < k (every distinct hash is
  *    present); else (k-1)/u(h_k) where u maps the kth smallest hash to
  *    (0,1] — relative error ~1/√(k-2).
  *  - Set ops: cut both sketches at θ = min(θ_A, θ_B); below θ each
  *    sketch holds EVERY distinct hash of its set, so ∩/∪ of the cut
  *    sets are uniform samples of the true ∩/∪ at rate θ. Exact regime
  *    (both sets < k): θ = 1 and the counts are exact integers — which
  *    is what lets a driver gate hash-match a DuckDB COUNT(DISTINCT)
  *    oracle, the same below-capacity posture as q93/q108/q122/q125.
  *
  * Scale: partials combine map-side (Aggregator = partial-agg'd), and the
  * shuffle carries ≤k longs per (task, group) regardless of input size —
  * the buffer is Kryo-serialized through [[KmvBuffer.write]], which prunes
  * first and writes only the live entries, never the backing array. In
  * memory the buffer holds up to 4k entries between prunes so per-row
  * insert cost is amortized O(1). Input is the PRE-HASHED column
  * (`xxhash64(value)`) so hashing runs inside whole-stage codegen, not
  * per-row in the aggregator.
  */
object KmvSketch {

  /** Append-and-prune buffer of JVM-primitive fields only. Inserts append
    * blindly (duplicates allowed); when the buffer reaches 4k entries it
    * prunes: unsigned sort, dedup, keep the k smallest distinct —
    * amortized O(log k) per row. The true k smallest distinct hashes ever
    * inserted can never be pruned (fewer than k distinct values present
    * are smaller than any of them), so finish's sort-dedup-take-k is
    * exactly the bottom-k of the input.
    *
    * Serialization implements [[com.esotericsoftware.kryo.KryoSerializable]]
    * directly: [[write]] prunes and emits only the ≤k live entries, so a
    * shuffled partial costs ≤k longs on the wire — Kryo's default field
    * serializer would ship the whole 4k-capacity backing array, garbage
    * slots included (~1 MB per group at k=32768). */
  final class KmvBuffer(var k: Int) extends Serializable
      with com.esotericsoftware.kryo.KryoSerializable {
    def this() = this(1) // Kryo instantiation; fields set by read()
    var n: Int = 0
    var arr: Array[Long] = new Array[Long](math.max(4 * k, 8))
    def insert(h: Long): Unit = {
      if (n == arr.length) prune()
      arr(n) = h; n += 1
    }
    def write(kryo: com.esotericsoftware.kryo.Kryo,
              out: com.esotericsoftware.kryo.io.Output): Unit = {
      prune()
      out.writeInt(k); out.writeInt(n)
      var i = 0
      while (i < n) { out.writeLong(arr(i)); i += 1 }
    }
    def read(kryo: com.esotericsoftware.kryo.Kryo,
             in: com.esotericsoftware.kryo.io.Input): Unit = {
      k = in.readInt(); n = in.readInt()
      arr = new Array[Long](math.max(math.max(4 * k, 8), n))
      var i = 0
      while (i < n) { arr(i) = in.readLong(); i += 1 }
    }
    /** Sort-dedup-truncate in place; after this n ≤ k. */
    def prune(): Unit = {
      val sorted = java.util.Arrays.copyOf(arr, n)
        .map(_ ^ Long.MinValue) // flip sign bit: signed order == unsigned
      java.util.Arrays.sort(sorted)
      var w = 0
      var i = 0
      while (i < sorted.length && w < k) {
        if (w == 0 || sorted(i) != arr(w - 1)) { arr(w) = sorted(i); w += 1 }
        i += 1
      }
      var j = 0
      while (j < w) { arr(j) = arr(j) ^ Long.MinValue; j += 1 } // unflip
      n = w
    }
    /** Final unsigned-sorted distinct bottom-k. */
    def result(): Array[Long] = { prune(); java.util.Arrays.copyOf(arr, n) }
  }

  private def newBuffer(k: Int) = {
    require(k >= 1, s"KMV sketch capacity k must be >= 1 (got $k)")
    new KmvBuffer(k)
  }

  /** Bottom-k sketch of a pre-hashed column: unsigned-sorted array of the
    * k smallest distinct hashes. Null hashes (null inputs) are skipped,
    * matching `count(DISTINCT x)` null semantics. */
  def aggregator(k: Int): Aggregator[java.lang.Long, KmvBuffer, Array[Long]] =
    new Aggregator[java.lang.Long, KmvBuffer, Array[Long]] {
      def zero: KmvBuffer = newBuffer(k)
      def reduce(b: KmvBuffer, h: java.lang.Long): KmvBuffer = {
        if (h != null) b.insert(h.longValue()); b
      }
      def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
        var i = 0
        while (i < b.n) { a.insert(b.arr(i)); i += 1 }
        a
      }
      def finish(b: KmvBuffer): Array[Long] = b.result()
      def bufferEncoder: Encoder[KmvBuffer] = Encoders.kryo[KmvBuffer]
      def outputEncoder: Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
    }

  /** `TypedColumn` form for `Dataset[Long]` / agg over a hashed column. */
  def sketch(k: Int): TypedColumn[java.lang.Long, Array[Long]] =
    aggregator(k).toColumn

  /** Re-fold stored sketches (the IVM/compaction direction — mirrors
    * [[SpaceSaving.mergeAggregator]]): union of bottom-k arrays is the
    * bottom-k of the union, so maintenance is associative and replay
    * order never changes the result. */
  def mergeAggregator(k: Int): Aggregator[Array[Long], KmvBuffer, Array[Long]] =
    new Aggregator[Array[Long], KmvBuffer, Array[Long]] {
      def zero: KmvBuffer = newBuffer(k)
      def reduce(b: KmvBuffer, sk: Array[Long]): KmvBuffer = {
        if (sk != null) sk.foreach(b.insert); b
      }
      def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
        var i = 0
        while (i < b.n) { a.insert(b.arr(i)); i += 1 }
        a
      }
      def finish(b: KmvBuffer): Array[Long] = b.result()
      def bufferEncoder: Encoder[KmvBuffer] = Encoders.kryo[KmvBuffer]
      def outputEncoder: Encoder[Array[Long]] =
        ExpressionEncoder[Array[Long]]()
    }

  /** Unsigned hash → (0, 1]: the fraction of the 64-bit space at or
    * below h. Monotone in unsigned order; u(2^64-1) = 1. */
  private def u(h: Long): Double =
    ((h ^ Long.MinValue).toDouble - Long.MinValue.toDouble + 1.0) / math.pow(2.0, 64)

  /** NDV estimate: exact below capacity, (k-1)/u(h_k) at capacity.
    * k >= 2 because the saturated estimator is (k-1)/u — at k = 1 it
    * degenerates to 0 (and k = 0 would index sk(-1)). */
  def estimateDistinct(sk: Array[Long], k: Int): Double = {
    require(k >= 2, s"estimateDistinct needs k >= 2 for (k-1)/u(h_k) (got $k)")
    if (sk.length < k) sk.length.toDouble
    else (k - 1).toDouble / u(sk(k - 1))
  }

  /** Pure sketch union (bottom-k of the merged hash sets). */
  def union(a: Array[Long], b: Array[Long], k: Int): Array[Long] =
    (a ++ b).distinct
      .sortWith((x, y) => java.lang.Long.compareUnsigned(x, y) < 0)
      .take(k)

  /** θ-cut set operations. Both sketches are complete below
    * θ = min of their saturation thresholds, so the cut intersection /
    * union are exact samples at rate θ; estimates divide by θ. Returns
    * (intersectEstimate, unionEstimate, jaccard). In the exact regime
    * (neither sketch at capacity) θ = 1, every entry is kept, and the
    * counts are exact.
    *
    * The saturated cut is STRICT (u(h) < θ), the theta-sketch convention:
    * the kth minimum DEFINES θ and is not itself a retained sample.
    * An inclusive cut would count k hashes below a threshold that only
    * k-1 samples justify — a systematic k/(k-1) overestimate that also
    * disagrees with [[estimateDistinct]]'s unbiased (k-1)/u(h_k). */
  def setEstimates(a: Array[Long], b: Array[Long], k: Int)
      : (Double, Double, Double) = {
    require(k >= 2, s"setEstimates needs k >= 2 (got $k)")
    val thetaA = if (a.length < k) 1.0 else u(a(k - 1))
    val thetaB = if (b.length < k) 1.0 else u(b(k - 1))
    val theta = math.min(thetaA, thetaB)
    val keep = (h: Long) => if (theta == 1.0) true else u(h) < theta
    val cutA = a.filter(keep)
    val cutB = b.filter(keep)
    val bs = cutB.toSet
    val nInter = cutA.count(bs.contains)
    val nUnion = cutA.length + cutB.length - nInter
    val j = if (nUnion == 0) 0.0 else nInter.toDouble / nUnion
    (nInter / theta, nUnion / theta, j)
  }

  /** Exact-regime set counts as longs (require both sketches below
    * capacity — the gateable integer form). */
  def exactSetCounts(a: Array[Long], b: Array[Long], k: Int): (Long, Long) = {
    require(a.length < k && b.length < k,
      s"exactSetCounts needs both sketches below capacity k=$k " +
        s"(got ${a.length}, ${b.length})")
    val bs = b.toSet
    val nInter = a.count(bs.contains).toLong
    (nInter, a.length + b.length - nInter)
  }
}
